package graft.extensions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Text-signature scale smoke — the X2 analog of VectorScaleSmoke:
  * synthesize N documents (default 200k — 40× the sf0.1 documents
  * table) with planted near-duplicates, and measure the TextIndex
  * economics at a corpus size where the signature derivation is real
  * work: build cost (paid once at ingest), then `dedup_minhash` and
  * `dedup_ngram` recompute vs index-served THROUGH THE PRODUCTION
  * REGISTRY, asserting bit-identical results both ways.
  *
  * Corpus: unique integer-hash tokens everywhere except every 50th
  * doc, which near-duplicates its predecessor (last 10 of 120 tokens
  * replaced → 3-gram Jaccard ≈ 0.8, above the 0.5 gate; the shared
  * shingles have df=2, far under the rare-blocking cap, so every
  * planted pair is a blocking candidate). Unique docs share no
  * shingle, so candidate work scales with PLANTED duplication, not
  * with doc pairs — the property the smoke exists to demonstrate.
  *
  * Usage: runMain graft.extensions.TextScaleSmoke [docs]
  */
object TextScaleSmoke {
  private val TOKENS = 120
  private val TAIL = 10 // replaced suffix in the near-dup copy

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 200000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tscale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // every 50th doc (id % 50 == 1) copies doc id-1's first 110 tokens
    // and replaces the tail — token content derives from the BASE doc id
    // so the copy is reproducible from the id alone
    val base = expr("CASE WHEN id % 50 = 1 THEN id - 1 ELSE id END")
    val toks = expr(
      s"""transform(sequence(0, ${TOKENS - 1}), i ->
         |  CASE WHEN doc_id % 50 = 1 AND i >= ${TOKENS - TAIL}
         |       THEN concat('x', pmod(doc_id * 2654435761 + i * 40503, 1000000000000))
         |       ELSE concat('t', pmod(base_id * 2654435761 + i * 40503, 1000000000000)) END)
         |""".stripMargin)
    val dir = java.nio.file.Files.createTempDirectory("graft-text-smoke").toString
    time(f"materialize $nDocs%,d docs × $TOKENS tokens (parquet)") {
      spark.range(nDocs)
        .select(col("id").as("doc_id"), base.as("base_id"))
        .select(col("doc_id"), concat_ws(" ", toks).as("text"),
          lit("en").as("lang"), lit("src0").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.parquet(s"$dir/documents.parquet")
    }
    val planted = (nDocs - 2) / 50 + 1 // ids 1, 51, 101, … < nDocs

    def run(name: String): Array[org.apache.spark.sql.Row] = {
      val r = graft.SparkEntry.queries(name)(spark, dir).collect()
      spark.sharedState.cacheManager.clearCache() // queries persist internally
      r
    }

    val mhRecompute = time("dedup_minhash recompute")(run("dedup_minhash"))
    val ngRecompute = time("dedup_ngram recompute")(run("dedup_ngram"))
    assert(ngRecompute.length == planted,
      s"ngram must find exactly the planted pairs (J≈0.8 > 0.5): $planted vs ${ngRecompute.length}")
    // banding at J≈0.8 catches ~99 % of pairs (1-(1-J²)^4); exact-Jaccard
    // verification keeps found ⊆ planted
    assert(mhRecompute.length <= planted && mhRecompute.length > planted * 9 / 10,
      s"minhash candidates ≈ planted: ${mhRecompute.length} of $planted")

    val idxDir = java.nio.file.Files.createTempDirectory("graft-text-smoke-idx").toString
    time(s"TextIndex.build over $nDocs docs (the once-at-ingest cost)") {
      TextIndex.build(spark, spark.read.parquet(s"$dir/documents.parquet"), idxDir)
    }
    spark.conf.set(TextIndex.ConfKey, idxDir)
    try {
      val mhServed = time("dedup_minhash index-served (first resolve pays the content gate)") {
        run("dedup_minhash")
      }
      val ngServed = time("dedup_ngram index-served (memoized gate, stored shn)") {
        run("dedup_ngram")
      }
      assert(mhServed.map(_.toSeq).toSeq == mhRecompute.map(_.toSeq).toSeq,
        "index-served minhash must be bit-identical to recompute")
      assert(ngServed.map(_.toSeq).toSeq == ngRecompute.map(_.toSeq).toSeq,
        "index-served ngram must be bit-identical to recompute")
      println(s"[tscale] PASS: $planted planted pairs; ngram found ${ngRecompute.length}, " +
        s"minhash ${mhRecompute.length}; served ≡ recompute both ways")
    } finally spark.conf.unset(TextIndex.ConfKey)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
    spark.stop()
  }
}
