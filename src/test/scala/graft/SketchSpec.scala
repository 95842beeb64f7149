package graft

import org.apache.spark.sql.functions._

import graft.operators.CoreQueries
import graft.sources.EventsSource

/** Sketch estimates are engine-specific, so their VALUES have no DuckDB
  * oracle; the cross-engine contract is the error BOUND. Round 12 moved
  * that bound into the sketch_stats plan itself (per-series hll_ok /
  * median_ok columns the oracle predicts true — a driver-visible hash
  * gate). This spec keeps the independent check: the raw production
  * estimates ([[CoreQueries.sketchEstimates]], the constant-memory
  * shape) against exact values computed HERE, plus the gated query's
  * verdict columns.
  */
class SketchSpec extends SparkSpec {

  test("HLL distinct and approximate median stay within bounds of the exact values") {
    val approx = CoreQueries.sketchEstimates(spark, sfDir)
    val exact = EventsSource.meas(spark, sfDir)
      .groupBy("id")
      .agg(countDistinct("value").as("exact_distinct"),
        expr("percentile(value, 0.4D)").as("exact_p40"),
        expr("percentile(value, 0.6D)").as("exact_p60"))
    val joined = approx.join(exact, "id").cache()
    assert(joined.count() > 0)
    // HLL++ at rsd=0.02: allow 10% (small per-series cardinalities)
    val badDistinct = joined.filter(
      abs(col("approx_distinct_values") - col("exact_distinct")) >
        greatest(col("exact_distinct") * 0.1, lit(2.0)))
    assert(badDistinct.count() === 0L, "HLL estimate out of bounds")
    // percentile_approx guarantees RANK error, not value error — assert
    // the estimate lands inside the exact p40..p60 band (generous for
    // its 0.1% rank bound, robust to tiny per-series samples)
    val badMedian = joined.filter(
      col("approx_median") < col("exact_p40") || col("approx_median") > col("exact_p60"))
    assert(badMedian.count() === 0L, "approximate median outside the p40..p60 rank band")
    joined.unpersist()
  }

  test("the gated sketch_stats emits all-true bound verdicts (the oracle's prediction)") {
    val gated = CoreQueries.sketchStats.build(spark, sfDir).cache()
    assert(gated.count() > 0)
    assert(gated.filter(col("hll_ok") =!= 1L || col("median_ok") =!= 1L).count() === 0L,
      "every per-series estimate honors its bound")
    assert(gated.columns.sorted === Array("cnt", "hll_ok", "id", "median_ok"),
      "gate shape: no engine-specific estimate values in the hashed output")
    gated.unpersist()
  }
}
