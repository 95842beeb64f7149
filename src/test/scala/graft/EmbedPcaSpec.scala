package graft

import org.apache.spark.sql.functions._

import graft.extensions.SimilarityQueries

/** embed_pca semantics: the power iteration must recover a planted
  * dominant direction, report a near-total variance share for it, and
  * return a unit-norm loading vector. */
class EmbedPcaSpec extends SparkSpec {

  test("embed_pca recovers a planted dominant axis with a near-1 variance share") {
    val dir = tmpDir("graft-pca")
    // 200 vectors: dim 5 carries a large symmetric signal, every other
    // dim a small deterministic jitter — the top component is e5
    spark.range(200)
      .selectExpr("id AS vec_id",
        """transform(sequence(0, 63), j ->
          |  CAST(CASE WHEN j = 5 THEN (CAST(id AS DOUBLE) - 99.5) / 200.0
          |       ELSE CAST(pmod(id * 31 + j * 7, 13) AS DOUBLE) / 1000.0 - 0.006 END AS FLOAT)
          |) AS embedding""".stripMargin,
        "CAST(id % 4 AS INT) AS label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val res = SimilarityQueries.embedPca.build(spark, dir).collect()
    assert(res.length === 64)
    val loads = res.map(r => r.getAs[Long]("dim") -> r.getAs[Long]("loading_micro")).toMap
    val shares = res.map(_.getAs[Long]("eig_share_ppm")).distinct
    assert(shares.length === 1, "the share is a corpus scalar, identical on every row")
    // dominant axis: |loading| ≈ 1e6 on dim 5, small elsewhere
    assert(math.abs(math.abs(loads(5L)) - 1000000L) < 5000L,
      s"dim 5 must carry the component (got ${loads(5L)})")
    loads.filter(_._1 != 5L).foreach { case (d0, l) =>
      assert(math.abs(l) < 100000L, s"dim $d0 loading $l should be minor")
    }
    // unit norm (micro): Σ (loading/1e6)² ≈ 1
    val norm2 = loads.values.map(v => (v / 1e6) * (v / 1e6)).sum
    assert(math.abs(norm2 - 1.0) < 1e-3, s"unit-norm loading, got norm² $norm2")
    assert(shares.head > 900000L, s"planted axis dominates the variance (got ${shares.head} ppm)")

    // whitening against the same memoized component: the projection
    // carries the dim-5 signal, the residual is only the jitter
    val wh = SimilarityQueries.embedWhiten.build(spark, dir).collect()
    assert(wh.length === 200)
    val projAbs = wh.map(r => math.abs(r.getAs[Long]("proj_micro"))).sorted
    val resid = wh.map(_.getAs[Long]("resid_micro")).sorted
    assert(projAbs(projAbs.length / 2) > 4 * resid(resid.length / 2),
      s"median |proj| ${projAbs(projAbs.length / 2)} must dominate median residual ${resid(resid.length / 2)}")
    assert(resid.last < 100000L, s"residuals are jitter-sized (max ${resid.last})")
  }
}
