package graft

import org.apache.spark.sql.functions._

import graft.extensions.PqQueries

/** Invariants of the product-quantization family that the DuckDB hash
  * gate cannot see: argmin optimality, Lloyd monotonicity, duplicate
  * co-location, memoization, and code packing.
  */
class PqSpec extends SparkSpec {

  private def rawEmb = spark.read.parquet(s"$sfDir/embeddings.parquet").drop("label")
  private def prepped = graft.extensions.SimilarityQueries.prep(spark, rawEmb)

  test("assignCodes picks the true per-(vector, subspace) argmin over the codebook") {
    val cb = PqQueries.pqCodebooks(spark, rawEmb)
    val sv = PqQueries.subvectors(prepped)
    val all = sv.join(broadcast(cb), "sub")
      .withColumn("d2m", expr(
        "CAST(floor(((graft_dot(sv, sv) - 2 * graft_dot(sv, cv)) + graft_dot(cv, cv)) * 1000000 + 0.5D) AS BIGINT)"))
      .groupBy("vec_id", "sub").agg(min("d2m").as("best"))
    val chosen = PqQueries.assignCodes(sv, cb)
      .join(sv, Seq("vec_id", "sub")).join(broadcast(cb), Seq("sub", "code"))
      .withColumn("d2m", expr(
        "CAST(floor(((graft_dot(sv, sv) - 2 * graft_dot(sv, cv)) + graft_dot(cv, cv)) * 1000000 + 0.5D) AS BIGINT)"))
      .select("vec_id", "sub", "d2m")
    val bad = chosen.join(all, Seq("vec_id", "sub")).filter(col("d2m") =!= col("best"))
    assert(bad.count() === 0L, "an assigned code must attain the minimal micro-distance")
  }

  test("one-pass code expression ≡ broadcast-join + max_by form, codes AND packed") {
    val cb = PqQueries.pqCodebooks(spark, rawEmb)
    val sv = PqQueries.subvectors(prepped)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m(PqQueries.assignCodes(sv, cb)) === m(PqQueries.assignCodesJoin(sv, cb)),
      "expression codes must be bit-identical to the join form (same micro argmin + tiebreak)")
    val packedExpr = PqQueries.packedCodes(prepped, cb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packedJoin = PqQueries.assignCodesJoin(sv, cb)
      .groupBy("vec_id").agg(expr("sum(code * CAST(pow(16, sub) AS BIGINT))").as("pq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packedExpr === packedJoin, "one-pass packing equals the exploded sum")
  }

  test("trained codebooks strictly reduce total distortion vs the seed codebook (Lloyd monotonicity)") {
    val sv = PqQueries.subvectors(prepped).cache()
    // the seed codebook, rebuilt by the training rule: md5(vec_id)-ranked head
    val seeds = prepped.select(col("vec_id"))
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h", "vec_id").limit(PqQueries.KSUB)
      .withColumn("code", (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("h", "vec_id")) - 1).cast("long"))
      .select("vec_id", "code")
    val cb0 = seeds.join(sv, "vec_id").select(col("sub"), col("code"), col("sv").as("cv"))
    def distortion(cb: org.apache.spark.sql.DataFrame): Long =
      sv.join(broadcast(cb), "sub")
        .withColumn("d2m", expr(
          "CAST(floor(((graft_dot(sv, sv) - 2 * graft_dot(sv, cv)) + graft_dot(cv, cv)) * 1000000 + 0.5D) AS BIGINT)"))
        .groupBy("vec_id", "sub").agg(min("d2m").as("best"))
        .agg(sum("best")).head().getLong(0)
    val before = distortion(cb0)
    val after = distortion(PqQueries.pqCodebooks(spark, rawEmb))
    assert(after < before,
      s"training must reduce total quantization distortion (seed=$before, trained=$after)")
    sv.unpersist()
  }

  test("an exact duplicate vector gets identical codes in every subspace") {
    val dup = rawEmb.filter(col("vec_id") === 3L)
      .withColumn("vec_id", lit(900001L))
    val corpus = rawEmb.unionByName(dup)
    // codebooks from the ORIGINAL corpus: the duplicate is a query-side
    // arrival (the admission shape), codes must still collide
    val cb = PqQueries.pqCodebooks(spark, rawEmb)
    val codes = PqQueries.assignCodes(
      PqQueries.subvectors(graft.extensions.SimilarityQueries.prep(spark, corpus)), cb)
    val a = codes.filter(col("vec_id") === 3L)
      .select(col("sub"), col("code").as("ca"))
    val b = codes.filter(col("vec_id") === 900001L)
      .select(col("sub"), col("code").as("cb"))
    val joined = a.join(b, "sub")
    assert(joined.count() === PqQueries.M.toLong)
    assert(joined.filter(col("ca") =!= col("cb")).count() === 0L,
      "identical input vectors must encode to identical PQ codes")
  }

  test("training is memoized per (session, corpus fingerprint)") {
    val before = PqQueries.pqTrainCount.get()
    PqQueries.pqCodebooks(spark, rawEmb).count()
    PqQueries.pqCodebooks(spark, rawEmb).count()
    val trained = PqQueries.pqTrainCount.get() - before
    assert(trained <= 1L, s"same corpus in one session must train at most once (trained $trained times)")
  }

  test("sim_ivfpq scores match sim_pq's ADC on shared pairs and respect the cell-prune contract") {
    val ivfpq = PqQueries.ivfPq.build(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"), col("adc_micro"))
    // full-corpus ADC ranking: same LUT, no pruning — scores must agree
    val full = PqQueries.simPq.build(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"), col("adc_micro").as("full_micro"))
    val shared = ivfpq.join(full, Seq("query_id", "neighbor_id"))
    assert(shared.filter(col("adc_micro") =!= col("full_micro")).count() === 0L,
      "pruning must never change a candidate's ADC score")
    // every returned neighbor sits in one of the query's probed cells
    val e = prepped
    val cent = graft.extensions.SimilarityQueries.kmeansCentroids(spark, rawEmb)
    val cells = graft.extensions.SimilarityQueries.assignCells(e, cent)
    val probes = graft.extensions.SimilarityQueries.cellSims(
        e.filter(col("vec_id") < 10), cent)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("csim").desc, col("clabel"))))
      .filter(col("rk") <= graft.extensions.SimilarityQueries.N_PROBE)
      .select(col("vec_id").as("query_id"), col("clabel").as("cell"))
    val outside = ivfpq
      .join(cells.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .join(probes, Seq("query_id", "cell"), "left_semi")
    assert(outside.count() === ivfpq.count(),
      "every IVF-PQ result must come from a probed cell")
    assert(ivfpq.count() > 0)
  }

  test("pq_codes packing round-trips to the per-subspace assignments") {
    val packed = PqQueries.codes.build(spark, sfDir)
    val cb = PqQueries.pqCodebooks(spark, rawEmb)
    val codes = PqQueries.assignCodes(PqQueries.subvectors(prepped), cb)
    val unpacked = packed
      .withColumn("sub", explode(expr(s"sequence(0L, ${PqQueries.M - 1}L)")))
      .withColumn("code", expr("(pq_code div CAST(pow(16, sub) AS BIGINT)) % 16"))
      .select("vec_id", "sub", "code")
    val diff = unpacked.join(codes.withColumnRenamed("code", "expect"), Seq("vec_id", "sub"))
      .filter(col("code") =!= col("expect"))
    assert(diff.count() === 0L, "unpacking the packed code must recover every subspace code")
  }
}
