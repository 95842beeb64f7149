package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.core.{Flags, Meas}
import graft.streaming.Subscribe

class DownsampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming hourly downsample matches the batch bucketing") {
    val dir = tmpDir("graft-ds-src")
    val ckpt = tmpDir("graft-ds-ckpt")
    val ms = Seq(
      Meas(1L, ts("2024-03-01 10:05:00"), 1.0, Flags.CLICK, 1),
      Meas(1L, ts("2024-03-01 10:55:00"), 3.0, Flags.CLICK, 2),
      Meas(1L, ts("2024-03-01 11:05:00"), 5.0, Flags.CLICK, 3),
      Meas(2L, ts("2024-03-01 10:30:00"), 7.0, Flags.ERROR, 4))
    // one file per logical batch: multi-file appends can split across
    // triggers when the source listing races the commit renames
    spark.createDataset(ms).toDF().coalesce(1).write.mode("append").parquet(dir)

    val q = Subscribe.downsampleStream(spark, dir).writeStream
      .format("memory").queryName("ds_stream")
      .outputMode(OutputMode.Complete()) // test sink: all windows every batch
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()

    val got = spark.sql("SELECT id, bucket, cnt, avg_value FROM ds_stream")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    q.stop()

    val expected = spark.createDataset(ms).toDF()
      .groupBy(col("id"), date_trunc("hour", col("time")).as("bucket"))
      .agg(count(lit(1)).as("cnt"), avg("value").as("avg_value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected)
    assert(got.size === 3, "two hourly buckets for series 1, one for series 2")
  }

  test("streaming OHLC bars match the batch series_bars semantics, incl. equal-ts seq order") {
    val dir = tmpDir("graft-bars-src")
    val ckpt = tmpDir("graft-bars-ckpt")
    val ms = Seq(
      Meas(1L, ts("2024-03-01 10:05:00"), 4.0, Flags.CLICK, 1), // open
      Meas(1L, ts("2024-03-01 10:20:00"), 9.0, Flags.CLICK, 2), // high
      Meas(1L, ts("2024-03-01 10:40:00"), 2.0, Flags.CLICK, 3), // low
      Meas(1L, ts("2024-03-01 10:55:00"), 6.0, Flags.CLICK, 4), // equal-ts pair:
      Meas(1L, ts("2024-03-01 10:55:00"), 7.0, Flags.CLICK, 5), //  higher seq = close
      Meas(1L, ts("2024-03-01 11:10:00"), 8.0, Flags.CLICK, 6)) // next bucket
    // one file per logical batch: multi-file appends can split across
    // triggers when the source listing races the commit renames
    spark.createDataset(ms).toDF().coalesce(1).write.mode("append").parquet(dir)

    val q = Subscribe.barsStream(spark, dir).writeStream
      .format("memory").queryName("bars_stream")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    val bars = spark.sql(
      "SELECT bucket, open, close, high, low, cnt FROM bars_stream WHERE id = 1 ORDER BY bucket")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    q.stop()

    assert(bars === Seq(
      (ts("2024-03-01 10:00:00"), 4.0, 7.0, 9.0, 2.0, 5L),
      (ts("2024-03-01 11:00:00"), 8.0, 8.0, 8.0, 8.0, 1L)),
      "open = first by (time, seq); close = the HIGHER-seq row of the equal-ts pair")
  }
}
