package graft

import org.apache.spark.sql.functions._

import graft.extensions.SimilarityQueries

/** kNN-graph semantics: in-cell candidates only, rank contract, and
  * agreement with a brute-force in-cell top-K recomputation. */
class KnnGraphSpec extends SparkSpec {

  test("knn_graph: ranks contiguous per vector, cosines non-increasing, no self edges") {
    val res = SimilarityQueries.knnGraph.build(spark, sfDir).cache()
    assert(res.filter(col("vec_id") === col("nbr_id")).count() === 0L)
    val byVec = res.collect().groupBy(_.getAs[Long]("vec_id"))
    assert(byVec.nonEmpty)
    byVec.foreach { case (v, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks === (1L to ranks.length), s"vec $v ranks must be 1..n with no gaps")
      val cs = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("cs_micro"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"vec $v cosines must be non-increasing")
    }
    res.unpersist()
  }

  test("knn_graph: edges match a brute-force in-cell top-K for sampled vectors") {
    val res = SimilarityQueries.knnGraph.build(spark, sfDir).cache()
    // reconstruct cells from the graph itself is not possible (edges only
    // carry ids), so recompute the exact in-cell list with the same
    // public pieces the query uses
    val e = graft.extensions.SimilarityQueries.prep(
      spark, spark.read.parquet(s"$sfDir/embeddings.parquet"))
    val cent = SimilarityQueries.kmeansCentroids(
      spark, spark.read.parquet(s"$sfDir/embeddings.parquet").drop("label"))
    val av = SimilarityQueries.assignCells(e, cent).join(e, "vec_id").cache()
    val brute = av.as("l").join(av.as("r"),
        col("l.cell") === col("r.cell") && col("l.vec_id") =!= col("r.vec_id"))
      .select(col("l.vec_id").as("vec_id"), col("r.vec_id").as("nbr_id"),
        round(call_function("graft_dot", col("l.v"), col("r.v")) /
          (col("l.norm") * col("r.norm")), 6).as("cs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cs").desc, col("nbr_id"))
    val expected = brute.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("vec_id"), col("rank"), col("nbr_id"))
    val mine = res.select("vec_id", "rank", "nbr_id")
    assert(mine.exceptAll(expected).count() === 0L &&
      expected.exceptAll(mine).count() === 0L)
    av.unpersist(); res.unpersist()
  }

  test("sim_filtered: equals an independent brute force over the query's label slice") {
    val got = SimilarityQueries.filteredTopk.build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getAs[Number](3).longValue, r.getLong(4))).toMap
    // independent recompute: collected vectors, plain Scala math
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getSeq[Float](2).map(_.toDouble)))
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val n = (v: Seq[Double]) => math.sqrt(v.map(x => x * x).sum)
      BigDecimal(dot / (n(a) * n(b))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = rows.filter(_._1 < 10).flatMap { case (qid, qlab, qv) =>
      rows.filter(c => c._2 == qlab && c._1 != qid)
        .map(c => (c._1, c._2, cos(qv, c._3)))
        .sortBy { case (id, _, cs) => (-cs, id) }
        .take(10).zipWithIndex
        .map { case ((id, lab, cs), i) =>
          (qid, i + 1L) -> (id, lab, math.floor(cs * 1e6 + 0.5).toLong) }
    }.toMap
    assert(got.keySet === want.keySet, "same (query, rank) coverage")
    // every neighbor carries the query's label; ranking matches brute force
    want.foreach { case (k, v) => assert(got(k) === v, s"(query,rank) $k") }
  }
}
