package graft

import java.sql.Timestamp

import graft.extensions.TemporalQueries

/** Edge semantics of the as-of join and grid forward-fill cores
  * (extensions/TemporalQueries): at-or-before inclusivity, seq
  * tie-breaking, and null synthesis before the first reference row. */
class TemporalSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  import spark.implicits._

  test("asofCore: at-or-before is inclusive, ties resolve to greatest seq, no-ref probes get nulls") {
    val probes = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L, 1.0), // before any ref → nulls
      (1L, ts("2024-01-01 10:00:00"), 101L, 2.0), // exactly AT a ref ts → inclusive
      (1L, ts("2024-01-01 11:00:00"), 102L, 3.0), // after two equal-ts refs → max-seq ref
      (2L, ts("2024-01-01 12:00:00"), 103L, 4.0), // other key: isolated partition
    ).toDF("k", "t", "seq", "v")
    val refs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, 10.0),
      (1L, ts("2024-01-01 10:30:00"), 11L, 11.0), // equal-ts pair, lower seq
      (1L, ts("2024-01-01 10:30:00"), 12L, 12.0), // equal-ts pair, higher seq — must win
      (2L, ts("2024-01-01 13:00:00"), 13L, 13.0), // after key 2's probe → unmatched
    ).toDF("k", "t", "seq", "v")

    val out = TemporalQueries.asofCore(probes, refs)
      .collect().map(r => r.getLong(2) -> Option(r.get(5)).map(_.asInstanceOf[Double])).toMap
    assert(out(100L) === None, "probe before any reference must synthesize null")
    assert(out(101L) === Some(10.0), "reference at exactly the probe ts must match (at-or-before)")
    assert(out(102L) === Some(12.0), "equal-ts references must resolve to the greatest seq")
    assert(out(103L) === None, "a reference after the probe must not match")
  }

  test("fillCore: forward fill carries last value, equal-ts observation included, leading grid nulls") {
    val obs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 5.0),
      (1L, ts("2024-01-01 12:00:00"), 2L, 7.0),
    ).toDF("k", "t", "seq", "v")
    val grid = Seq(
      (1L, ts("2024-01-01 09:00:00")), // before first obs → null
      (1L, ts("2024-01-01 10:00:00")), // equal-ts obs → filled 5.0
      (1L, ts("2024-01-01 11:00:00")), // between obs → carries 5.0
      (1L, ts("2024-01-01 13:00:00")), // after last obs → carries 7.0
    ).toDF("k", "t")

    val out = TemporalQueries.fillCore(obs, grid)
      .collect().map(r => r.getTimestamp(1) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out(ts("2024-01-01 09:00:00")) === None)
    assert(out(ts("2024-01-01 10:00:00")) === Some(5.0))
    assert(out(ts("2024-01-01 11:00:00")) === Some(5.0))
    assert(out(ts("2024-01-01 13:00:00")) === Some(7.0))
  }

  test("fillCore: fill timestamp tracks the observation that supplied the value") {
    val obs = Seq((1L, ts("2024-01-01 10:00:00"), 1L, 5.0)).toDF("k", "t", "seq", "v")
    val grid = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("k", "t")
    val row = TemporalQueries.fillCore(obs, grid).collect().head
    assert(row.getTimestamp(3) === ts("2024-01-01 10:00:00"),
      "ft must be the supplying observation's timestamp (staleness-age source)")
  }
}
