package graft.sources

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, StructField, StructType}

/** Physical storage layout for the Meas store — the Spark-native
  * re-expression of the reference's page/WAL machinery (SURVEY.md §4.2).
  *
  * Layout contract:
  *  - files partitioned by `day(time)` → retention (eraseOld) is a
  *    partition DROP, never a rewrite [U: engines/engine.cpp — eraseOld];
  *  - within a partition, rows are hash-bucketed by series id and sorted
  *    by (id, time) → parquet row-group min/max stats give per-series
  *    chunk pruning, the analog of the reference's page footer index
  *    [U: storage/pages/page_manager.cpp — ChunkLink index];
  *  - value compression: parquet dictionary/ZSTD stands in for the
  *    reference's Gorilla codecs [U: compression/delta.cpp, xor.cpp] —
  *    same role, format-native;
  *  - an optional per-(day, id) statistic index (the chunk-footer
  *    `Statistic` analog [U: storage/chunk.h — Statistic]) is maintained
  *    incrementally at append time and serves stat()/minMaxTime()
  *    without touching data files.
  *
  * At 1000 executors none of this changes: the bucket count is the only
  * knob (≥ cluster cores; co-partitions series for merge-free reads).
  */
object TsdbStorage {

  private def withDaySchema: StructType =
    StructType(graft.core.Meas.schema.fields :+ StructField("day", DateType))

  /** O1 append: write a Meas batch in the clustered layout. ZSTD +
    * a bloom filter on `flag` stand in for the reference's Gorilla
    * codecs + per-chunk flag blooms [U: compression/, storage/chunk.h
    * — flag_bloom] — same pruning role, format-native.
    *
    * When `statsPath` is given, the per-(day, id) statistic index is
    * refreshed for the batch's touched days in the same call — the
    * analog of the reference writing the chunk-footer Statistic as part
    * of the chunk flush, so the index never lags the data. */
  def append(meas: DataFrame, path: String, buckets: Int = 32,
             statsPath: Option[String] = None): Unit = {
    val spark = meas.sparkSession
    // day partitions present BEFORE this write — distinguishes brand-new
    // days (stats derive from the batch alone, no store read-back) from
    // already-populated days (stats must re-merge against stored rows)
    val preExisting: Set[String] = {
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(root)) Set.empty
      else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("day=")).toSet
    }
    // data and index cannot commit atomically — so the sync MARKER is
    // dropped before the data write and restored only after the index
    // update: a crash in between leaves the index flagged unusable and
    // readers fall back to the (always-correct) scan path instead of
    // silently serving a stale index.
    //
    // Re-certification rule: this append may re-mark the index ONLY if
    // the index was usable when the append started (refreshing the
    // touched days preserves completeness) or the store held no data at
    // all (the index it builds covers everything). An index staled by a
    // PREVIOUS crash, or absent over pre-existing data, stays
    // uncertified — repair is an explicit full rebuild (engine
    // compact()/reindex()), never an incidental later append.
    val canCertify = statsPath.forall(sp =>
      statsUsable(spark, sp) || preExisting.isEmpty)
    statsPath.foreach(markStatsOutOfSync(spark, _))
    // the clustered frame is persisted (only when a stats pass will
    // consume it) so stats re-read the shuffle output from cache
    // instead of re-shuffling the batch
    val clustered = meas
      .withColumn("day", to_date(col("time")))
      .repartition(buckets, pmod(hash(col("id")), lit(buckets)))
      .sortWithinPartitions("id", "time")
    if (statsPath.isDefined) clustered.persist()
    clustered
      .write.mode("append")
      .partitionBy("day")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#flag", "true")
      .parquet(path)
    statsPath.foreach { sp =>
      // touched-day list is bounded by the batch's day span — a tiny
      // driver-side collect even for a billion-row batch
      val touched = clustered.select(col("day")).distinct()
        .collect().map(_.getDate(0)).toSeq
      val (oldDays, newDays) = touched.partition(d => preExisting.contains(s"day=$d"))
      // common ingest case (append-only daily batches): every touched day
      // is new → stats stream out of the ALREADY-clustered batch with
      // zero additional shuffle (ids are bucket-disjoint and (id, time)
      // sorted, so duplicate keys are adjacent) — the Spark analog of
      // the reference computing chunk-footer stats during the flush
      if (newDays.nonEmpty)
        writeStatsRows(
          clusteredMergedStats(clustered.filter(col("day").isin(newDays: _*))), sp)
      if (oldDays.nonEmpty) refreshStats(spark, path, sp, oldDays)
      if (canCertify) markStatsInSync(spark, sp)
      clustered.unpersist()
    }
  }

  // ---- stats-index sync protocol -------------------------------------
  // `_SYNCED` inside the stats dir is the single-writer commit marker:
  // absent ⇒ a mutation (append / eraseOld / compact) died between the
  // data commit and the index update, and the index must not be served.

  private val SyncMarker = "_SYNCED"

  def markStatsOutOfSync(spark: SparkSession, statsPath: String): Unit = {
    val p = new Path(statsPath, SyncMarker)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, false)
  }

  def markStatsInSync(spark: SparkSession, statsPath: String): Unit = {
    val root = new Path(statsPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // never conjure an empty-but-"synced" index: marking requires actual
    // index content to exist (a maintenance op on a store without an
    // index must leave it index-less)
    if (!fs.exists(root)) return
    fs.create(new Path(root, SyncMarker), true).close()
  }

  /** True iff the stats index exists AND its last mutation committed —
    * the serve-from-index precondition. */
  def statsUsable(spark: SparkSession, statsPath: String): Boolean = {
    val p = new Path(statsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.exists(new Path(p, SyncMarker))
  }

  /** Per-(day, id) MERGED stats from a frame that is bucket-partitioned
    * by id and sorted by (id, time) within partitions: one streaming
    * pass — duplicate (id, time) runs are adjacent (freshest `seq`
    * wins), every id lives in exactly one partition, so per-partition
    * partials are already global. Genuine per-partition imperative
    * logic; no shuffle. */
  private def clusteredMergedStats(clustered: DataFrame): DataFrame = {
    val spark = clustered.sparkSession
    import spark.implicits._
    clustered
      .select(col("id"), col("time"), col("value"), col("seq"), col("day"))
      .as[(Long, java.sql.Timestamp, Double, Long, java.sql.Date)]
      .mapPartitions { it =>
        final class Acc(var cnt: Long, var minT: java.sql.Timestamp, var maxT: java.sql.Timestamp,
                        var minV: Double, var maxV: Double, var sumV: Double)
        val acc = scala.collection.mutable.HashMap[(java.sql.Date, Long), Acc]()
        var runId = 0L; var runTime: java.sql.Timestamp = null
        var runDay: java.sql.Date = null; var runSeq = 0L; var runValue = 0.0
        def foldRun(): Unit = if (runTime != null) {
          val a = acc.getOrElseUpdate((runDay, runId),
            new Acc(0L, runTime, runTime, runValue, runValue, 0.0))
          a.cnt += 1
          if (runTime.compareTo(a.minT) < 0) a.minT = runTime
          if (runTime.compareTo(a.maxT) > 0) a.maxT = runTime
          if (runValue < a.minV) a.minV = runValue
          if (runValue > a.maxV) a.maxV = runValue
          a.sumV += runValue
        }
        it.foreach { case (id, time, value, seq, day) =>
          if (runTime != null && id == runId && time.equals(runTime)) {
            if (seq > runSeq) { runSeq = seq; runValue = value } // freshest wins
          } else {
            foldRun()
            runId = id; runTime = time; runDay = day; runSeq = seq; runValue = value
          }
        }
        foldRun()
        acc.iterator.map { case ((day, id), a) =>
          (day, id, a.cnt, a.minT, a.maxT, a.minV, a.maxV, a.sumV)
        }
      }
      .toDF("day", "id", "cnt", "min_time", "max_time", "min_value", "max_value", "sum_value")
  }

  // ---- per-(day, id) statistic index ---------------------------------

  /** Mergeable partial-stat columns: readers re-aggregate with
    * sum/min/max, so per-day rows combine into any interval. */
  private val statAggs = Seq(
    count(lit(1)).as("cnt"),
    min("time").as("min_time"), max("time").as("max_time"),
    min("value").as("min_value"), max("value").as("max_value"),
    sum("value").as("sum_value"))

  /** Recompute the index rows for `touchedDays` from the data store
    * (merge-on-read applied first, so the index always reflects the
    * RESOLVED store — duplicate (id, time) rewrites don't double-count)
    * and dynamically overwrite exactly those day partitions. Reading
    * back the touched days costs one pruned partition scan per append —
    * the same work the reference's dropper does re-packing the hot
    * chunk, and the price of an index that is exact at all times. */
  def refreshStats(spark: SparkSession, dataPath: String, statsPath: String,
                   touchedDays: Seq[java.sql.Date]): Unit = {
    if (touchedDays.isEmpty) return
    // drop the touched index partitions first: dynamic overwrite only
    // rewrites partitions PRESENT in the output, so a touched day whose
    // data vanished entirely (per-id retention emptied it) would keep
    // its stale index rows. Callers bracket with the sync marker, so
    // the transient gap is never served.
    val root = new Path(statsPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      touchedDays.foreach(d => fs.delete(new Path(root, s"day=$d"), true))
    writeStats(mergeFreshest(readDays(spark, dataPath, touchedDays)), statsPath)
  }

  /** Aggregate an already-deduped Meas frame into per-(day, id) index
    * rows and write them. */
  private def writeStats(merged: DataFrame, statsPath: String): Unit =
    writeStatsRows(
      merged
        .withColumn("day", to_date(col("time")))
        .groupBy("day", "id")
        .agg(statAggs.head, statAggs.tail: _*),
      statsPath)

  /** Write per-(day, id) index rows, dynamically overwriting exactly the
    * day partitions present in the frame. */
  private def writeStatsRows(statsRows: DataFrame, statsPath: String): Unit =
    statsRows
      .coalesce(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(statsPath)

  private def statsSchema: StructType = StructType(Seq(
    StructField("id", org.apache.spark.sql.types.LongType),
    StructField("cnt", org.apache.spark.sql.types.LongType),
    StructField("min_time", org.apache.spark.sql.types.TimestampType),
    StructField("max_time", org.apache.spark.sql.types.TimestampType),
    StructField("min_value", org.apache.spark.sql.types.DoubleType),
    StructField("max_value", org.apache.spark.sql.types.DoubleType),
    StructField("sum_value", org.apache.spark.sql.types.DoubleType),
    StructField("day", DateType)))

  /** Read the stats index. Keeps the `day` column for partition pruning
    * and full-day interval math. */
  def readStats(spark: SparkSession, statsPath: String): DataFrame =
    spark.read.schema(statsSchema).parquet(statsPath)

  /** Read only the given day partitions of the data store. */
  def readDays(spark: SparkSession, path: String, days: Seq[java.sql.Date]): DataFrame =
    spark.read.schema(withDaySchema).parquet(path)
      .filter(col("day").isin(days: _*))
      .drop("day")

  // ---- reads ---------------------------------------------------------

  /** Read the store back as a canonical Meas DataFrame. The schema is
    * supplied explicitly so an empty store (e.g. after retention dropped
    * every partition) reads as an empty DataFrame instead of failing
    * schema inference. */
  def read(spark: SparkSession, path: String): DataFrame =
    readRange(spark, path, None, None)

  /** Read only the day partitions intersecting the inclusive interval —
    * the partition-pruning analog of the reference's page index lookup
    * [U: storage/pages/page_manager.cpp — chunksByIterval]. The `day`
    * predicate is derived from the time bounds (session TZ is pinned
    * UTC, matching the writer's `to_date(time)`) and is applied BEFORE
    * the column is dropped, so it lands in the scan's PartitionFilters:
    * a one-day read of a 100-day store lists one directory. The precise
    * `time` bounds additionally prune parquet row groups. */
  def readRange(spark: SparkSession, path: String,
                from: Option[Timestamp], to: Option[Timestamp]): DataFrame = {
    val base = spark.read.schema(withDaySchema).parquet(path)
    val pruned = (from, to) match {
      case (Some(f), Some(t)) =>
        base.filter(col("day").between(to_date(lit(f)), to_date(lit(t)))
          && col("time").between(lit(f), lit(t)))
      case (Some(f), None) =>
        base.filter(col("day") >= to_date(lit(f)) && col("time") >= lit(f))
      case (None, Some(t)) =>
        base.filter(col("day") <= to_date(lit(t)) && col("time") <= lit(t))
      case (None, None) => base
    }
    pruned.drop("day")
  }

  /** O11 eraseOld: drop whole day partitions strictly older than the
    * cutoff date. Pure metadata/filesystem operation — no data rewrite,
    * which is the only retention strategy that survives 100 TB. Applies
    * to any day-partitioned dir (data and stats index alike). */
  def eraseOld(spark: SparkSession, path: String, cutoffDay: java.time.LocalDate): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val dropped = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("day=") &&
          java.time.LocalDate.parse(p.getName.stripPrefix("day=")).isBefore(cutoffDay)
      }
    dropped.foreach(fs.delete(_, true))
    dropped.map(_.getName)
  }

  /** Rewrite ONLY the given day partitions, keeping rows matching
    * `keep`, in the clustered layout. Untouched days are never read or
    * written. Used by per-id retention (O11 per-id variant), where a
    * partition drop is too coarse. Writes to a sibling tmp dir first,
    * then swaps each day dir — Spark cannot overwrite a path it is
    * reading, and the swap keeps the non-affected days live throughout.
    * A day whose rows are ALL erased is deleted outright (dynamic
    * overwrite would silently leave it behind).
    *
    * Crash safety: a live day dir is never deleted while it is the only
    * copy. Each swap moves the old day ASIDE (rename), lands the
    * rewrite, then drops the aside copy — and the next invocation's
    * recovery preamble restores any day whose swap died between the two
    * renames (dst missing ⇒ the aside copy is the only copy; restoring
    * the ORIGINAL is correct for retention, which simply re-erases on
    * the re-run). Only after recovery may the tmp dir be cleared. */
  def rewriteDaysFiltered(spark: SparkSession, path: String,
                          days: Seq[java.sql.Date], buckets: Int,
                          keep: org.apache.spark.sql.Column): Unit =
    rewriteDays(spark, path, days, buckets, _.filter(keep))

  /** O12 incremental form: rewrite only the given day partitions with
    * merge-on-read MATERIALIZED (duplicate (id, time) keys collapse to
    * the freshest seq, append-accumulated small files coalesce into the
    * clustered layout). Duplicate keys never span days (a row's day is
    * a function of its time), so a per-day merge equals the global one
    * restricted to those days — which is what lets a year-old store pay
    * its hot days' debt down without the full-store rewrite compact()
    * does. Same crash-safe swap as the retention rewrite. */
  def compactDays(spark: SparkSession, path: String,
                  days: Seq[java.sql.Date], buckets: Int): Unit =
    rewriteDays(spark, path, days, buckets,
      df => mergeFreshest(df).withColumn("day", to_date(col("time"))))

  private def rewriteDays(spark: SparkSession, path: String,
                          days: Seq[java.sql.Date], buckets: Int,
                          transform: DataFrame => DataFrame): Unit = {
    if (days.isEmpty) return
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$path.rewrite")
    val aside = new Path(s"$path.rewrite.old")
    if (fs.exists(aside)) {
      fs.listStatus(aside).filter(_.getPath.getName.startsWith("day=")).foreach { st =>
        val dst = new Path(root, st.getPath.getName)
        if (!fs.exists(dst)) fs.rename(st.getPath, dst)
      }
      fs.delete(aside, true)
    }
    fs.delete(tmp, true)
    transform(
      spark.read.schema(withDaySchema).parquet(path)
        .filter(col("day").isin(days: _*)))
      .repartition(buckets, pmod(hash(col("id")), lit(buckets)))
      .sortWithinPartitions("id", "time")
      .write.mode("overwrite")
      .partitionBy("day")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#flag", "true")
      .parquet(tmp.toString)
    fs.mkdirs(aside)
    days.foreach { d =>
      val dst = new Path(root, s"day=$d")
      val src = new Path(tmp, s"day=$d")
      if (fs.exists(dst)) fs.rename(dst, new Path(aside, s"day=$d"))
      if (fs.exists(src)) fs.rename(src, dst)
    }
    fs.delete(aside, true)
    fs.delete(tmp, true)
  }

  /** Merge-on-read dedup: exactly one (the freshest, by `seq`) row per
    * (id, time). Partial-aggregating max_by — no window, one shuffle on
    * the dedup key. Public because the engine's MEMORY hot level unions
    * into the same resolution (SURVEY.md §2.1 O16, §3.1 strategies). */
  def mergeFreshest(df: DataFrame): DataFrame =
    df.groupBy("id", "time")
      .agg(max_by(struct(col("value"), col("flag"), col("seq")), col("seq")).as("m"))
      .select(col("id"), col("time"), col("m.value").as("value"),
        col("m.flag").as("flag"), col("m.seq").as("seq"))

  /** fsck probe over a parquet artifact dir (data store, index, log):
    * distributed full-decompression check of every file under `path`;
    * empty when the dir is absent. */
  def probeFiles(spark: SparkSession, path: String): Seq[String] =
    ParquetProbe.probe(spark, ParquetProbe.listParquet(spark, new Path(path)))

  /** O12 compact view: the merge-on-read resolution over the whole store. */
  def compacted(spark: SparkSession, path: String): DataFrame =
    mergeFreshest(read(spark, path))

  /** Compact in place: rewrite into `path` atomically-enough for a
    * single-writer store (write tmp, swap). */
  def compactTo(spark: SparkSession, srcPath: String, dstPath: String, buckets: Int = 32): Unit =
    append(compacted(spark, srcPath), dstPath, buckets)
}
