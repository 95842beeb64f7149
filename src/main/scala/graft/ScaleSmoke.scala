package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{GraftEngine, QueryInterval, QueryTimePoint, ShardedEngine}

/** Scale-headroom smoke: synthesize an N-row Meas store (default 20M —
  * 200× the sf0.1 events table) spread over `days` day partitions and
  * drive the core engine operators against it. Not a driver gate;
  * evidence that the operator plans and the storage layout hold when
  * the data is no longer toy-sized — and, run at days=30 vs days=365
  * with the same row count, that the DAY-PRUNED read paths (readGrid,
  * indexed stat, index-pruned per-id erase) stay FLAT as the store
  * ages instead of scaling with its history.
  * Usage: runMain graft.ScaleSmoke [rows] [seriesCount] [days]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 20000000L
    val series = if (args.length > 1) args(1).toLong else 10000L
    val days = if (args.length > 2) args(2).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-scale").toString
    // bucket count trades file count for per-file size: at 365 day
    // partitions the default would mint days×buckets tiny files, so the
    // year run caps buckets — in production per-day volume is what sets
    // the bucket count, not history length
    val buckets = if (days > 60) 16 else cpus.toInt * 2
    val engine = new GraftEngine(spark, dir, buckets = buckets)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // deterministic synthetic Meas: `series` ids spread over `days` days
    val baseUs = 1704067200000000L // 2024-01-01 00:00:00 UTC
    val spanSeconds = days * 86400L
    // stride 37 is coprime with any day-span (whose factors are 2/3/5/73),
    // so (37·i) mod span covers the WHOLE span even when rows < span —
    // a plain i mod span would leave the tail days empty on a year store
    def mkMeas(n: Long) = spark.range(n).select(
      pmod(col("id"), lit(series)).as("id"),
      timestamp_micros(lit(baseUs) + ((col("id") * 37L) % spanSeconds) * 1000000L).as("time"),
      (pmod(col("id") * 2654435761L, lit(100000L)) / 100.0).as("value"),
      expr("CAST(shiftleft(1, CAST(id % 5 AS INT)) AS BIGINT)").as("flag"),
      col("id").as("seq"))

    time(f"ingest $rows%,d rows across $days day partitions")(engine.append(mkMeas(rows)))

    // one SHORT-LIVED series: hourly points on 7 days in the middle of
    // the span — the per-id retention case the stats index prunes for
    val shortId = series + 1L
    val shortStartDay = days / 2
    engine.append(spark.range(7L * 24).select(
      lit(shortId).as("id"),
      timestamp_micros(lit(baseUs) + (col("id") * 3600L + lit(shortStartDay * 86400L)) * 1000000L).as("time"),
      lit(1.0).as("value"), lit(1L).as("flag"), col("id").as("seq")))

    def dayTs(d: Long) = new java.sql.Timestamp(baseUs / 1000L + d * 86400000L)

    val ti = time("readInterval (1 day, 3 series)")(
      engine.readInterval(QueryInterval(Seq(17L, 42L, 99L), 0L,
        dayTs(days - 2L), dayTs(days - 1L))).count())
    val tp = time("readTimePoint (all series)")(
      engine.readTimePoint(QueryTimePoint(Seq.empty, 0L, dayTs(days / 2L))).count())
    val cv = time("currentValue (all series)")(
      engine.currentValue(Seq.empty, 0L).count())

    // readGrid: 1-day dashboard window, hourly step, 2 h staleness —
    // day-pruned to a constant-width window however old the store is
    import spark.implicits._
    val gridIds = (0L until 1000L).toDF("series_id")
    val rg = time("readGrid (1k series, 1-day window, 1h step, 2h staleness)")(
      engine.readGrid(dayTs(days - 2L), dayTs(days - 1L), 3600L, 7200L,
        gridIds = Some(gridIds)).count())

    // stat over a 300-day interval (clamped to the span): index-covered
    // days answer from ~1 row each, ≤2 boundary days scan
    val statSpan = math.min(300L, days.toLong)
    val st = time(s"stat via chunk-stat index (1 series, $statSpan-day interval)")(
      engine.stat(17L, dayTs(days.toLong - statSpan), dayTs(days.toLong)).count())
    val ss = time(s"stat via full scan (same query, fallback path)")(
      engine.statScan(17L, dayTs(days.toLong - statSpan), dayTs(days.toLong)).count())
    val mm = time("minMaxTime from index")(engine.minMaxTime(17L).isDefined)

    // interval read of the short-lived series over the WHOLE span: the
    // index restricts the scan to its 7 resident days
    val tiSparse = time("readInterval (full-span window, 7-day-lived series, index-pruned)")(
      engine.readInterval(QueryInterval(Seq(shortId), 0L, dayTs(0L), dayTs(days.toLong))).count())

    // per-id retention of the short-lived series: the stats index must
    // restrict the rewrite to its ~7 resident days, not the whole span
    val erShort = time("per-id eraseOld (7-day-lived series, index-pruned)")(
      engine.eraseOld(dayTs(days.toLong), Seq(shortId)).size)

    // sharded fan-out over a 10% slice: routed append + cross-shard grid
    val shardRows = math.max(rows / 10L, 1L)
    val sharded = new ShardedEngine(spark, Seq(s"$dir/s0", s"$dir/s1"), buckets = 8)
    time(f"sharded ingest ($shardRows%,d rows, 2 shards)")(
      sharded.append(mkMeas(shardRows)))
    val sg = time("sharded readGrid fan-out (same 1-day window, ids routed to owners)")(
      sharded.shards.zipWithIndex.map { case (sh, i) =>
        sh.readGrid(dayTs(days - 2L), dayTs(days - 1L), 3600L, 7200L,
          gridIds = Some(gridIds.filter(pmod(col("series_id"), lit(2L)) === i.toLong)))
      }.reduce(_ unionByName _).count())
    val sstat = time("sharded stat routed to owning shard")(
      sharded.stat(17L, dayTs(0L), dayTs(days.toLong)).count())

    // sharded maintenance fan-out: per-shard ops are independent, so the
    // concurrent fan-out should cost ~the slowest shard. compact() is the
    // comparison op (always rewrites — maintain() is idempotent, so a
    // second timed run would have no work). Serial first: any page-cache
    // warm-up favors the parallel run it's being compared against least.
    val maintEng = new ShardedEngine(spark, (0 until 4).map(i => s"$dir/m$i"), buckets = 8)
    time(f"sharded-maintenance ingest ($shardRows%,d rows, 4 shards)")(
      maintEng.append(mkMeas(shardRows)))
    spark.conf.set("spark.graft.shard.maintenanceParallelism", "1")
    val tSerial = { val t0 = System.nanoTime(); maintEng.compact(); (System.nanoTime() - t0) / 1e9 }
    spark.conf.set("spark.graft.shard.maintenanceParallelism", "8")
    val tPar = { val t0 = System.nanoTime(); maintEng.compact(); (System.nanoTime() - t0) / 1e9 }
    spark.conf.unset("spark.graft.shard.maintenanceParallelism")
    println(f"[scale] sharded compact 4 shards: serial $tSerial%.2f s, concurrent $tPar%.2f s " +
      f"(${tSerial / tPar}%.2fx — wall-clock ~ slowest shard, not sum)")

    // ---- throughput vs the reference's claimed "millions of values/sec"
    // (BASELINE.md rows 4-5, (L)-caveat): measure all three regimes.
    // MEMORY-level append = the reference's MEMORY strategy analog;
    // durable append = COMPRESSED/WAL analog (clustered write + stats
    // index); scan = interval read of the whole store.
    val hotRows = math.min(rows / 4L, 5000000L)
    val hotEngine = new GraftEngine(spark, s"$dir/hot", buckets = buckets,
      hotCapacity = Long.MaxValue)
    val tHot = { val t0 = System.nanoTime(); hotEngine.append(mkMeas(hotRows)); (System.nanoTime() - t0) / 1e9 }
    println(f"[scale] MEMORY-level append throughput: ${hotRows / tHot / 1e6}%.1f M rows/s ($hotRows%,d rows in $tHot%.2f s)")
    locally { val t0 = System.nanoTime(); val n = engine.merged.count(); val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scale] merge-on-read full scan throughput: ${n / dt / 1e6}%.1f M rows/s ($n%,d rows in $dt%.2f s)") }

    val er = time("eraseOld (drop 1/3 of the day partitions)")(
      engine.eraseOld(dayTs(days / 3L)).size)

    println(s"[scale] results: interval=$ti interval_sparse=$tiSparse timepoint=$tp current=$cv grid=$rg " +
      s"stat=$st statScan=$ss minmax=$mm erase_short_days=$erShort sharded_grid=$sg " +
      s"sharded_stat=$sstat dropped_partitions=$er")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
