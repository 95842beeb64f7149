package graft

import org.apache.spark.sql.functions._

import graft.operators.CoreQueries
import graft.sources.EventsSource

/** The sketch query has no DuckDB oracle (estimates are
  * engine-specific), so its gate lives here: error bounds against the
  * exact answers.
  */
class SketchSpec extends SparkSpec {

  test("HLL distinct and approximate median stay within bounds of the exact values") {
    val approx = CoreQueries.sketchStats.build(spark, sfDir)
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
}
