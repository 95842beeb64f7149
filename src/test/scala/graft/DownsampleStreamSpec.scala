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
    spark.createDataset(ms).toDF().write.mode("append").parquet(dir)

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
}
