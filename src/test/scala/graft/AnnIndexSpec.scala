package graft

import org.apache.spark.sql.functions._

import graft.extensions.{AnnIndex, SimilarityQueries}

/** The persisted ANN index: index-served queries must be IDENTICAL to
  * the recompute path, appends must extend the index exactly (frozen
  * quantizer), and an uncommitted mutation must disable it — never
  * serve it stale.
  */
class AnnIndexSpec extends SparkSpec {

  private def raw = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def collectAnn(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, sfDir).collect().toSeq.map(_.toSeq)

  private def withIndex[T](dir: String)(body: => T): T = {
    spark.conf.set(AnnIndex.ConfKey, dir)
    try body finally spark.conf.unset(AnnIndex.ConfKey)
  }

  test("index-served sim_ann and sim_ivf are identical to the recompute path") {
    val dir = tmpDir("graft-ann-idx")
    val recomputedAnn = collectAnn("sim_ann")
    val recomputedIvf = collectAnn("sim_ivf")
    val recomputedLsh = collectAnn("dedup_embed_lsh")
    AnnIndex.build(spark, raw, dir)
    assert(AnnIndex.usable(spark, dir))
    withIndex(dir) {
      assert(AnnIndex.resolve(spark) === Some(dir))
      assert(collectAnn("sim_ann") === recomputedAnn)
      assert(collectAnn("sim_ivf") === recomputedIvf)
      assert(collectAnn("dedup_embed_lsh") === recomputedLsh)
    }
  }

  test("append extends the index exactly: SRP codes corpus-invariant, cells frozen-quantizer") {
    val dir = tmpDir("graft-ann-append")
    val dirFull = tmpDir("graft-ann-full")
    // build on a subset, then append the rest (queries included)
    AnnIndex.build(spark, raw.filter(col("vec_id") >= 50), dir)
    AnnIndex.append(spark, raw.filter(col("vec_id") < 50), dir)
    val appended = AnnIndex.readCodes(spark, dir)
    assert(appended.count() === raw.count(), "one codes row per corpus vector")
    assert(appended.select("vec_id").distinct().count() === raw.count(), "no duplicate rows")
    // SRP codes don't depend on the quantizer: they must equal a
    // full-corpus build's codes bit-for-bit
    AnnIndex.build(spark, raw, dirFull)
    val codeDiff = appended.select("vec_id", "code")
      .exceptAll(AnnIndex.readCodes(spark, dirFull).select("vec_id", "code"))
    assert(codeDiff.isEmpty, "appended SRP codes must match a from-scratch build")
    // cells ARE quantizer-dependent: appended rows must carry exactly the
    // assignment against the index's FROZEN centroids (never re-derived)
    val expected = AnnIndex.assign(spark, raw, dir)
    val cellDiff = appended.select("vec_id", "cell").exceptAll(expected)
    assert(cellDiff.isEmpty, "cells must be assigned against the frozen build-time centroids")
  }

  test("uncommitted mutation disables the index; queries fall back; build recertifies") {
    val dir = tmpDir("graft-ann-crash")
    AnnIndex.build(spark, raw, dir)
    val served = withIndex(dir)(collectAnn("sim_ann"))
    // simulate a crash between content write and certification
    graft.sources.TsdbStorage.markStatsOutOfSync(spark, dir)
    assert(!AnnIndex.usable(spark, dir))
    withIndex(dir) {
      assert(AnnIndex.resolve(spark) === None, "an uncertified index must never be served")
      assert(collectAnn("sim_ann") === served, "fallback recompute serves the same answer")
    }
    intercept[IllegalArgumentException](AnnIndex.append(spark, raw.limit(1), dir))
    AnnIndex.build(spark, raw, dir) // repair = rebuild
    assert(AnnIndex.usable(spark, dir))
  }

  test("streamed appends maintain the index exactly (AnnIndexStream)") {
    val dir = tmpDir("graft-ann-stream")
    AnnIndex.build(spark, raw.filter(col("vec_id") >= 50), dir)
    // stream the remaining vectors in two micro-batches (file source,
    // same technique as StreamingDedupSpec)
    val src = tmpDir("graft-ann-stream-src")
    def write(cond: org.apache.spark.sql.Column): Unit =
      raw.filter(cond).coalesce(1).write.mode("append").parquet(src)
    write(col("vec_id") < 25)
    val query = graft.streaming.AnnIndexStream.start(
      spark.readStream.schema(raw.schema).parquet(src),
      dir, tmpDir("graft-ann-stream-ckpt"))
    try {
      query.processAllAvailable()
      write(col("vec_id") >= 25 && col("vec_id") < 50)
      query.processAllAvailable()
    } finally query.stop()
    assert(AnnIndex.usable(spark, dir))
    val streamed = AnnIndex.readCodes(spark, dir)
    assert(streamed.count() === raw.count())
    // identical to what the batch append path would have produced:
    // frozen-quantizer cells + corpus-invariant SRP codes
    val expectedCells = AnnIndex.assign(spark, raw, dir)
    assert(streamed.select("vec_id", "cell").exceptAll(expectedCells).isEmpty)
    val dirFull = tmpDir("graft-ann-stream-full")
    AnnIndex.build(spark, raw, dirFull)
    assert(streamed.select("vec_id", "code")
      .exceptAll(AnnIndex.readCodes(spark, dirFull).select("vec_id", "code")).isEmpty)
  }

  test("wide-scheme index: meta persists, appends code with the index's own scheme") {
    val dir = tmpDir("graft-ann-wide")
    val dirFull = tmpDir("graft-ann-wide-full")
    AnnIndex.build(spark, raw.filter(col("vec_id") >= 50), dir, planes = 32, bandBits = 8)
    assert(AnnIndex.readMeta(spark, dir) === ((32, 8)))
    AnnIndex.append(spark, raw.filter(col("vec_id") < 50), dir)
    AnnIndex.build(spark, raw, dirFull, planes = 32, bandBits = 8)
    // append must code with the PERSISTED 32-plane scheme — a 16-plane
    // append would zero the high code bits and diverge from a full build
    assert(AnnIndex.readCodes(spark, dir).select("vec_id", "code")
      .exceptAll(AnnIndex.readCodes(spark, dirFull).select("vec_id", "code")).isEmpty)
    // a served query buckets by the index's own meta (sanity: runs, ranks bounded)
    withIndex(dir) {
      val rows = collectAnn("sim_ann")
      assert(rows.forall(r => r(1).asInstanceOf[Long] <= 10L))
    }
  }

  test("fsck: a corrupt index file uncertifies; rebuild repairs") {
    val dir = tmpDir("graft-ann-fsck")
    AnnIndex.build(spark, raw, dir)
    assert(AnnIndex.fsck(spark, dir) === Seq.empty)
    java.nio.file.Files.write(
      new java.io.File(s"$dir/codes/part-corrupt.parquet").toPath, "not parquet".getBytes)
    val bad = AnnIndex.fsck(spark, dir)
    assert(bad.exists(_.contains("part-corrupt")))
    withIndex(dir)(assert(AnnIndex.resolve(spark) === None,
      "a corrupt index must never be served"))
    assert(AnnIndex.fsck(spark, dir, repair = true).nonEmpty)
    assert(!new java.io.File(s"$dir/codes/part-corrupt.parquet").exists)
    AnnIndex.build(spark, raw, dir)
    assert(AnnIndex.usable(spark, dir) && AnnIndex.fsck(spark, dir) === Seq.empty)
  }

  test("compact coalesces the codes files without changing contents") {
    val dir = tmpDir("graft-ann-compact")
    AnnIndex.build(spark, raw.filter(col("vec_id") >= 50), dir)
    AnnIndex.append(spark, raw.filter(col("vec_id") < 50), dir)
    val before = AnnIndex.readCodes(spark, dir).collect().map(_.toSeq).toSet
    AnnIndex.compact(spark, dir)
    assert(AnnIndex.usable(spark, dir))
    val after = AnnIndex.readCodes(spark, dir)
    assert(after.collect().map(_.toSeq).toSet === before)
    assert(after.inputFiles.length === 1, "compact coalesces to a single file")
    // index-served results survive the append+compact lifecycle
    val recomputed = collectAnn("sim_ann")
    withIndex(dir)(assert(collectAnn("sim_ann") === recomputed))
  }
}
