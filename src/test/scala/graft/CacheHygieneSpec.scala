package graft

/** The registry's persist() contract (see QueryDef scaladoc): builds
  * that persist intermediates are session-scoped memos, deduped by
  * canonicalized plan. A long-lived session executing the same builds
  * repeatedly must NOT accumulate cached blocks — the second run reuses
  * the first run's entries — and clearCache() releases everything.
  */
class CacheHygieneSpec extends SparkSpec {

  test("re-running persisting queries adds no cache entries; clearCache drains all") {
    // every query whose build persist()s an intermediate
    val names = Seq("dedup_minhash", "dedup_simhash", "dedup_ngram",
      "dedup_embed_lsh", "sim_ann", "text_tfidf",
      "jaccard_recall", "lm_score", "lm_calibration", "lm_crossval", "series_lttb",
      "dedup_docvec", "text_winnow", "winnow_matches", "bm25_topk", "hybrid_rrf",
      "dedup_edit", "knn_graph", "knn_recall")
    spark.sharedState.cacheManager.clearCache()
    def runAll(): Int = {
      names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
      spark.sparkContext.getPersistentRDDs.size
    }
    val first = runAll()
    assert(first > 0, "the chosen queries do persist intermediates")
    val second = runAll()
    assert(second === first,
      s"second pass must reuse cache entries, not grow them ($first -> $second)")
    spark.sharedState.cacheManager.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty, "clearCache releases every registry memo")
  }
}
