package graft

import org.apache.spark.sql.functions._

import graft.sources.EventsSource

class EventsSourceSpec extends SparkSpec {

  test("measInInterval (scan-pruned) returns exactly meas.filter(between)") {
    val from = "2024-01-10 00:00:00"; val to = "2024-01-20 00:00:00"
    val pruned = EventsSource.measInInterval(spark, sfDir, from, to)
    val plain = EventsSource.meas(spark, sfDir)
      .filter(col("time").between(lit(from).cast("timestamp"), lit(to).cast("timestamp")))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    // and the pushdown is actually in the plan — either encoding:
    // ns-as-long is a half-open window (>= lower, < upper·exclusive),
    // µs/NTZ an inclusive one (>= from, <= to)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(ts,") &&
      (scan.contains("LessThan(ts,") || scan.contains("LessThanOrEqual(ts,")),
      "raw-ts bounds must appear in PushedFilters")
  }

  test("series-id encoding is invertible and flag is one-hot") {
    val m = EventsSource.meas(spark, sfDir)
    val bad = m.filter(!(col("flag").isin(1L, 2L, 4L, 8L, 16L)) || col("id") % 8 > 4)
    assert(bad.count() === 0L)
    val scheme = EventsSource.scheme(spark, sfDir)
    assert(scheme.count() === scheme.select("series_id").distinct().count(),
      "series ids must be unique in the catalog")
  }
}
