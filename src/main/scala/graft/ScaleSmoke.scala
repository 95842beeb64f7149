package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{GraftEngine, QueryInterval, QueryTimePoint}

/** Scale-headroom smoke: synthesize an N-row Meas store (default 20M —
  * 200× the sf0.1 events table) in the clustered layout and drive the
  * core engine operators against it. Not a driver gate; evidence that
  * the operator plans and the storage layout hold when the data is no
  * longer toy-sized. Usage: runMain graft.ScaleSmoke [rows] [seriesCount]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 20000000L
    val series = if (args.length > 1) args(1).toLong else 10000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-scale").toString
    val engine = new GraftEngine(spark, dir, buckets = cpus.toInt * 2)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // deterministic synthetic Meas: `series` ids over 30 days of data
    val meas = spark.range(rows).select(
      pmod(col("id"), lit(series)).as("id"),
      timestamp_micros(lit(1704067200000000L) + (col("id") % 2592000L) * 1000000L).as("time"),
      (pmod(col("id") * 2654435761L, lit(100000L)) / 100.0).as("value"),
      expr("CAST(shiftleft(1, CAST(id % 5 AS INT)) AS BIGINT)").as("flag"),
      col("id").as("seq"))

    time(f"ingest $rows%,d rows")(engine.append(meas))

    val ti = time("readInterval (1 day, 3 series)")(
      engine.readInterval(QueryInterval(Seq(17L, 42L, 99L), 0L,
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-06 00:00:00"))).count())
    val tp = time("readTimePoint (all series)")(
      engine.readTimePoint(QueryTimePoint(Seq.empty, 0L,
        java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))).count())
    val cv = time("currentValue (all series)")(
      engine.currentValue(Seq.empty, 0L).count())
    val st = time("stat via chunk-stat index (1 series, full range)")(
      engine.stat(17L,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00")).count())
    val ss = time("stat via full scan (same query, fallback path)")(
      engine.statScan(17L,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00")).count())
    val mm = time("minMaxTime from index")(engine.minMaxTime(17L).isDefined)
    val er = time("eraseOld (drop 10 days)")(
      engine.eraseOld(java.sql.Timestamp.valueOf("2024-01-11 00:00:00")).size)

    println(s"[scale] results: interval=$ti timepoint=$tp current=$cv stat=$st statScan=$ss minmax=$mm dropped_partitions=$er")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
