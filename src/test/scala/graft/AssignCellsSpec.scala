package graft

import org.apache.spark.sql.functions._

import graft.extensions.SimilarityQueries

/** The one-pass nearest-centroid expression (NearestCellExpr) vs the
  * round-9 join form (cellSims + max_by): the expression must be
  * BIT-IDENTICAL — same rounded-to-6dp cosine argmax, same lowest-label
  * tiebreak — because every persisted index cell and every oracle-gated
  * ivf query rides it. The join form stays in the codebase exactly so
  * this equivalence is checkable forever.
  */
class AssignCellsSpec extends SparkSpec {

  import spark.implicits._

  private def centFrame(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("clabel", "cv")
      .withColumn("cnorm", sqrt(call_function("graft_dot", col("cv"), col("cv"))))

  private def vecFrame(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "v")
      .withColumn("norm", sqrt(call_function("graft_dot", col("v"), col("v"))))

  private def both(vecs: org.apache.spark.sql.DataFrame,
                   cent: org.apache.spark.sql.DataFrame): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    def run(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    (run(SimilarityQueries.assignCells(vecs, cent)),
      run(SimilarityQueries.assignCellsJoin(vecs, cent)))
  }

  test("expression ≡ join form on seeded random vectors and centroids") {
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val cent = centFrame((0L until 25L).map(c => c -> Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val vecs = vecFrame((0L until 500L).map(v => v -> Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val (fast, join) = both(vecs, cent)
    assert(fast === join)
  }

  test("rounded-level ties break to the LOWEST label, exactly as max_by(struct(csim, -clabel))") {
    graft.functions.VectorFunctions.register(spark)
    // centroids 3 and 7 are the same direction scaled differently →
    // identical cosine to every vector (exact tie at any rounding);
    // centroid 1 is a third direction
    val dir = Seq(1.0, 2.0, 3.0, 4.0)
    val cent = centFrame(Seq(7L -> dir, 3L -> dir.map(_ * 2.5), 1L -> Seq(4.0, -3.0, 2.0, -1.0)))
    val vecs = vecFrame(Seq(0L -> dir, 1L -> Seq(1.1, 2.0, 3.0, 4.0), 2L -> Seq(4.0, -3.0, 2.0, -1.1)))
    val (fast, join) = both(vecs, cent)
    assert(fast === join)
    assert(fast.toMap.apply(0L) === 3L, "the exact tie lands on the lower label")
  }

  test("near-tie region: sims within the rounding quantum of the max agree with the join form") {
    graft.functions.VectorFunctions.register(spark)
    // two near-parallel centroids whose cosines to v differ by ~1e-7 —
    // inside the BigDecimal re-check window, where a naive raw-argmax
    // would disagree with the rounded argmax
    val cent = centFrame(Seq(
      5L -> Seq(1.0, 1.0e-7, 0.0),
      2L -> Seq(1.0, -1.0e-7, 0.0),
      9L -> Seq(0.0, 1.0, 0.0)))
    val vecs = vecFrame((0L until 50L).map(i =>
      i -> Seq(1.0, (i - 25).toDouble * 1e-8, 0.1)))
    val (fast, join) = both(vecs, cent)
    assert(fast === join)
  }

  test("signed-zero knife edge: cosines rounding to ±0.0 TIE under max_by — the expression must tie identically") {
    graft.functions.VectorFunctions.register(spark)
    // centroid 9's cosine to v0 rounds to +0.0, centroid 2's to −0.0,
    // centroid 5 is clearly negative. MEASURED max_by semantics: ±0.0
    // compare EQUAL (primitive IEEE equality, not Double.compare's
    // total order — a total-order implementation of the expression
    // diverged here), so the tie goes to the LOWER label 2. This pins
    // the subtlest corner of the bit-identity contract.
    val cent = centFrame(Seq(
      9L -> Seq(1.0e-9, 1.0, 0.0),
      2L -> Seq(-1.0e-9, 1.0, 0.0),
      5L -> Seq(-1.0, 0.1, 0.0)))
    val vecs = vecFrame(Seq(0L -> Seq(1.0, 0.0, 0.0)))
    val (fast, join) = both(vecs, cent)
    assert(fast === join)
    assert(fast === Seq((0L, 2L)), "±0.0 tie resolves to the lower label in BOTH forms")
  }

  test("expression ≡ join form on the sf0.001 embeddings against the kmeans quantizer") {
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet").drop("label")
    val e = SimilarityQueries.prep(spark, raw)
    val cent = SimilarityQueries.kmeansCentroids(spark, raw)
    val (fast, join) = both(e, cent)
    assert(fast === join)
    assert(fast.nonEmpty)
  }
}
