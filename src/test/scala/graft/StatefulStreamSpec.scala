package graft

import java.sql.Timestamp

import graft.core.{Flags, Meas}
import graft.streaming.StatefulStreams

class StatefulStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def write(dir: String, ms: Seq[Meas]): Unit =
    spark.createDataset(ms).toDF().write.mode("append").parquet(dir)

  test("stateful current-value stream tracks freshest measurement and running count across batches") {
    val dir = tmpDir("graft-state-src")
    val ckpt = tmpDir("graft-state-ckpt")

    write(dir, Seq(
      Meas(1L, ts("2024-03-01 10:00:00"), 1.0, Flags.CLICK, 1),
      Meas(1L, ts("2024-03-01 11:00:00"), 2.0, Flags.CLICK, 2),
      Meas(2L, ts("2024-03-01 10:00:00"), 5.0, Flags.ERROR, 3)))
    val q = StatefulStreams.start(spark, dir, "state_cv", ckpt)
    q.processAllAvailable()

    def latest(): Map[Long, (Double, Long)] =
      spark.sql("SELECT id, value, count FROM state_cv").collect()
        .groupBy(_.getLong(0))
        // memory sink in update mode appends rows per batch; last wins
        .map { case (id, rows) => id -> (rows.last.getDouble(1), rows.last.getLong(2)) }

    val l1 = latest()
    assert(l1(1L) === ((2.0, 2L)), "freshest value + count for series 1")
    assert(l1(2L) === ((5.0, 1L)))

    // second batch: one fresher, one STALE (older time) for series 1 —
    // stale must bump the count but not displace the current value
    write(dir, Seq(
      Meas(2L, ts("2024-03-01 12:00:00"), 6.0, Flags.ERROR, 4),
      Meas(1L, ts("2024-03-01 09:00:00"), 0.5, Flags.CLICK, 5)))
    q.processAllAvailable()
    q.stop()

    val l2 = latest()
    assert(l2(2L) === ((6.0, 2L)), "fresher measurement replaces state")
    assert(l2(1L) === ((2.0, 3L)), "stale measurement counted but not surfaced")
  }
}
