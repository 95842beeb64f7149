package graft

import org.apache.spark.sql.functions._

import graft.extensions.RetrievalQueries

/** BM25 + hybrid-RRF retrieval semantics: posting-match-only candidates,
  * tf monotonicity, self-retrieval on the vector leg, fusion arithmetic.
  */
class RetrievalSpec extends SparkSpec {

  /** Controlled corpus: doc 0 is the query ("apple banana"); 3 shares
    * both terms at higher tf, 4 shares one term, 5 shares none. */
  private lazy val tinyDir: String = {
    import spark.implicits._
    val dir = tmpDir("graft-retrieval")
    val rows = Seq(
      (0L, "apple banana"),
      (1L, "filler one two"),
      (2L, "other words here"),
      (3L, "apple apple apple banana"),
      (4L, "apple cherry cherry cherry"),
      (5L, "durian durian"))
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bm25_topk: only posting matches are candidates; more matched terms rank higher") {
    val res = RetrievalQueries.bm25Topk.build(spark, tinyDir)
      .filter(col("query_id") === 0L).collect()
    val ids = res.map(_.getAs[Long]("doc_id")).toSeq
    assert(!ids.contains(5L), "a document sharing no query term must not appear")
    assert(ids.contains(0L) && ids.contains(3L) && ids.contains(4L))
    def rankOf(id: Long) = res.find(_.getAs[Long]("doc_id") == id).get.getAs[Long]("rank")
    assert(rankOf(3L) < rankOf(4L),
      "both-term doc must outrank the single-term doc")
    // scores non-increasing in rank
    val byRank = res.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("bm25_micro"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("bm25_topk on sf0.001: full top-K per query, ranks contiguous, self-doc retrieved") {
    val res = RetrievalQueries.bm25Topk.build(spark, sfDir).collect()
    val byQ = res.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.foreach { case (q, rows) =>
      assert(rows.length === 10, s"query $q should fill the top-10")
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to 10L),
        s"query $q ranks must be contiguous")
      assert(rows.exists(_.getAs[Long]("doc_id") == q),
        s"query $q must retrieve its own document (it contains every query term)")
    }
  }

  test("hybrid_rrf: fusion arithmetic, self-doc tops the vector leg, ranks contiguous") {
    val res = RetrievalQueries.hybridRrf.build(spark, sfDir).collect()
    val byQ = res.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    val one = math.floor(1000000.0 / 61 + 0.5).toLong
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to 10L))
      // every fused row came from at least one leg, and the points match
      rows.foreach { r =>
        val b = Option(r.getAs[java.lang.Long]("bm25_rank")).map(_.toLong)
        val v = Option(r.getAs[java.lang.Long]("vec_rank")).map(_.toLong)
        assert(b.nonEmpty || v.nonEmpty)
        def pts(x: Option[Long]) =
          x.map(r0 => math.floor(1000000.0 / (60 + r0) + 0.5).toLong).getOrElse(0L)
        assert(r.getAs[Long]("rrf_micro") === pts(b) + pts(v))
      }
      // the query doc itself is rank 1 on the cosine leg (cos = 1.0)
      val self = rows.find(_.getAs[Long]("doc_id") == q)
      assert(self.nonEmpty, s"query $q should fuse its own document into the top-10")
      assert(self.get.getAs[java.lang.Long]("vec_rank") != null &&
        self.get.getAs[java.lang.Long]("vec_rank").toLong <= 2L,
        s"query $q self-doc should top the vector leg")
      // a doc on BOTH legs at best ranks beats either single-leg maximum
      val best = rows.minBy(_.getAs[Long]("rank"))
      assert(best.getAs[Long]("rrf_micro") <= 2 * one)
    }
  }
}
