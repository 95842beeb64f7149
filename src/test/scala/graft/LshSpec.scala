package graft

import org.apache.spark.sql.functions._

import graft.extensions.{DedupQueries, SimilarityQueries}

/** Recall/containment specs for the approximate pipelines: approximation
  * must never fabricate results, and must find the planted duplicates.
  */
class LshSpec extends SparkSpec {

  test("minhash LSH finds every pair the exact shingle-jaccard threshold defines (recall = 1 on planted dups)") {
    // exact high-jaccard ground truth via the (already-verified) ngram path:
    // rare-shingle blocking at this corpus size is exhaustive for j >= 0.8
    val lsh = DedupQueries.minhash.build(spark, sfDir)
      .select("doc_a", "doc_b").cache()
    val exact = DedupQueries.ngramJaccard.build(spark, sfDir)
      .filter(col("jaccard") >= 0.8).select("doc_a", "doc_b").cache()
    val missed = exact.exceptAll(lsh)
    assert(missed.isEmpty, s"LSH missed ${missed.count()} high-jaccard pairs")
    assert(exact.count() > 0, "fixture must contain planted near-dups")
    lsh.unpersist(); exact.unpersist()
  }

  test("ANN results are a subset of the brute-force universe with identical scores") {
    val ann = SimilarityQueries.ann.build(spark, sfDir)
      .select("query_id", "neighbor_id", "cos_sim")
    val brute = SimilarityQueries.topk.build(spark, sfDir) // top-10 exact
      .select(col("query_id"), col("neighbor_id"), col("cos_sim").as("exact_sim"))
    // scores for any (query, neighbor) ANN returns must match the exact path
    val joined = ann.join(brute, Seq("query_id", "neighbor_id"), "inner")
    assert(joined.filter(col("cos_sim") =!= col("exact_sim")).count() === 0L)
    assert(ann.count() > 0)
  }

  test("simhash near-dup pairs overlap the minhash pairs on planted duplicates") {
    val sim = DedupQueries.simhash.build(spark, sfDir).select("doc_a", "doc_b")
    val mh = DedupQueries.minhash.build(spark, sfDir).select("doc_a", "doc_b")
    val overlap = sim.intersect(mh).count()
    assert(overlap > 0, "the two near-dup detectors must agree on planted dups")
  }

  test("bloom-pruned incremental dedup verdicts equal the unfiltered exact join") {
    val got = DedupQueries.bloomDedup.build(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    // the reference: the same batch derivation (the shared helper), NO
    // bloom prune — the whole corpus meets the batch in a plain join
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val batch = DedupQueries.bloomBatch(corpus)
      .select(col("batch_id"), sha2(col("text"), 256).as("h"))
    val hits = corpus.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .groupBy("h").agg(min("doc_id").as("dup_of"))
    val want = batch.join(hits, Seq("h"), "left")
      .select(col("batch_id"),
        when(col("dup_of").isNull, lit("new")).otherwise(lit("dup")).as("verdict"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
      .orderBy("batch_id").collect().map(_.toSeq).toSeq
    assert(got === want, "bloom false positives must never change a verdict")
    // both branches exercised
    val verdicts = got.map(_(1)).toSet
    assert(verdicts === Set("dup", "new"))
  }

  test("bloom prune admits every batch hash and rejects most of the corpus") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val batchH = corpus.filter(col("doc_id") % 20 === 7).select("h")
    val bloom = DedupQueries.bloomArray(batchH)
    // no false negatives: every hash that went in tests positive
    assert(batchH.filter(!DedupQueries.bloomMightContain(bloom, col("h"))).isEmpty,
      "a bloom filter must contain everything inserted into it")
    // the prune is real: survivors ≈ batch-sized, far below the corpus
    val total = corpus.count()
    val survivors = corpus.filter(DedupQueries.bloomMightContain(bloom, col("h"))).count()
    val batchN = batchH.count()
    assert(survivors < total / 2,
      s"prune must reject most of the corpus: $survivors of $total survived")
    assert(survivors >= batchN, "survivors include at least the true members")
  }

  test("docvec dedup: exact duplicates always pair, disjoint-vocab docs never do; predicate ≡ cosine ≥ 0.95") {
    val d = tmpDir("graft-docvec")
    val rows = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en", "s", 1L),
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s", 1L), // exact dup of 0
      (2L, "alpha beta gamma delta epsilon eta", "en", "s", 1L),  // near dup of 0 (5/6 shared)
      (3L, "one two three four five six", "en", "s", 1L))         // disjoint vocab
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val pairs = DedupQueries.docvecDedup.build(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "an exact duplicate has cosine 1 — must always pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "a disjoint-vocabulary doc shares no hashed dimension mass — must never pair")
    // the integer predicate is exactly cos >= 0.95 on the real vectors
    val vecs = SparkEntry.queries("doc_embed")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(",").toSeq.map(_.toLong)).toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      dot / math.sqrt(a.map(x => x * x).sum.toDouble * b.map(x => x * x).sum.toDouble)
    }
    for (i <- 0L to 3L; j <- (i + 1) to 3L) {
      val c = cos(vecs(i), vecs(j))
      assert(pairs.contains((i, j)) === (c >= 0.95 - 1e-12),
        s"pair ($i,$j) cos=$c vs integer predicate")
    }
  }

  test("exact dedup keeps exactly one representative per content hash") {
    val res = DedupQueries.exact.build(spark, sfDir)
    assert(res.filter(col("dup_cnt") =!= 2).count() === 0L,
      "doubled corpus → every hash has exactly 2 members")
    assert(res.filter(col("keep_doc_id") >= 1000000L).count() === 0L,
      "keeper must always be the original, not the shifted copy")
  }

  test("source_overlap attributes planted near-dup pairs to the right (source, source) cells") {
    val d = tmpDir("graft-srcoverlap")
    val base = (1 to 100).map(i => s"w$i").mkString(" ")
    val nearDup = ((1 to 98).map(i => s"w$i") ++ Seq("zz1", "zz2")).mkString(" ")
    val other = (1 to 100).map(i => s"v$i").mkString(" ")
    val rows = Seq(
      (0L, base, "en", "feedA", 100L),      // feedA original
      (1L, nearDup, "en", "feedB", 100L),   // feedB near-copy of 0 (cross-feed)
      (2L, other, "en", "feedA", 100L),     // feedA original
      (3L, other, "en", "feedA", 100L),     // feedA verbatim re-crawl (diagonal)
      (4L, (1 to 100).map(i => s"u$i").mkString(" "), "en", "feedC", 100L)) // clean
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("source_overlap")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === Set(("feedA", "feedB"), ("feedA", "feedA")),
      s"exactly the planted cells, got ${got.keySet}")
    assert(got(("feedA", "feedA")) === ((1L, 1000000L)), "verbatim re-crawl: one pair at J = 1")
    val (nCross, sumJ) = got(("feedA", "feedB"))
    assert(nCross === 1L && sumJ >= 800000L && sumJ < 1000000L,
      s"cross-feed near-dup: one pair at 0.8 ≤ J < 1 (got $sumJ)")
  }
}
