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

  test("exact dedup keeps exactly one representative per content hash") {
    val res = DedupQueries.exact.build(spark, sfDir)
    assert(res.filter(col("dup_cnt") =!= 2).count() === 0L,
      "doubled corpus → every hash has exactly 2 members")
    assert(res.filter(col("keep_doc_id") >= 1000000L).count() === 0L,
      "keeper must always be the original, not the shifted copy")
  }
}
