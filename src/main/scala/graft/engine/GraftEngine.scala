package graft.engine

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.Meas
import graft.sources.TsdbStorage
import graft.streaming.Subscribe

/** Queries-as-data, mirroring the reference's only predicate language
  * (SURVEY.md §1.3) [U: libdariadb/query.h — QueryInterval,
  * QueryTimePoint]. Interval ends are inclusive; flag 0 matches all,
  * otherwise any-shared-bit.
  */
case class QueryInterval(ids: Seq[Long], flag: Long, from: Timestamp, to: Timestamp)
case class QueryTimePoint(ids: Seq[Long], flag: Long, timePoint: Timestamp)

/** What one [[GraftEngine.maintain]] pass did to ONE artifact index
  * (AnnIndex / TextIndex): corrupt files found (and dropped when
  * repairing), whether the uncertified index was rebuilt from its
  * corpus, whether append-fragmentation was compacted away. */
case class ArtifactReport(dir: String, corrupt: Seq[String],
                          rebuilt: Boolean, compacted: Boolean,
                          retuned: Option[String] = None)

/** What one [[GraftEngine.maintain]] pass did: corrupt files found (and
  * dropped when repairing), fragmented days compacted, whether the stat
  * index needed a rebuild — plus a per-artifact report for each index
  * handed to the call. */
case class MaintenanceReport(corrupt: Seq[String], compactedDays: Seq[java.sql.Date],
                             reindexed: Boolean,
                             artifacts: Seq[ArtifactReport] = Seq.empty)

/** The facade surface remote fronts program against — implemented by
  * the single-store [[GraftEngine]] AND the [[ShardedEngine]] router,
  * mirroring the reference's storage polymorphism (its network server
  * fronts `Engine` and `ShardEngine` through the same interface
  * [U: interfaces/imeasstorage.h]). `GraftServer` serves either. */
trait EngineApi {
  def append(ms: Seq[Meas]): Unit
  def readInterval(q: QueryInterval): DataFrame
  def intervalReader(q: QueryInterval): Iterator[Meas]
  def readTimePoint(q: QueryTimePoint): DataFrame
  def currentValue(ids: Seq[Long], flag: Long): DataFrame
  def readGrid(from: Timestamp, to: Timestamp, stepSeconds: Long,
               maxStalenessSeconds: Long): DataFrame
  /** Register an append observer firing with every committed batch, in
    * commit order for any single series (the push-subscribe hook). */
  def onAppend(listener: Seq[Meas] => Unit): Unit
  def removeAppendListener(listener: Seq[Meas] => Unit): Unit
}

/** The embedded-engine facade — the reference's `Engine` API surface
  * [U: engines/engine.h — class Engine; interfaces/imeasstorage.h],
  * re-expressed over the clustered parquet store. A dariadb user's
  * call sites map one-to-one:
  *
  *   append / readInterval / readTimePoint / currentValue / minMaxTime /
  *   stat / calculator / subscribe / eraseOld / compact / fsck /
  *   addParam / getParamId / ls
  *
  * Every read path resolves duplicate (id, time) keys to the freshest
  * `seq` — the merge-on-read semantic of the reference's WAL/mem/page
  * levels (SURVEY.md §2.1 O16); `compact()` materializes that
  * resolution ([U: engines/engine.cpp — compact]).
  */
class GraftEngine(val spark: SparkSession, val path: String, buckets: Int = 32,
                  hotCapacity: Long = 0L) extends EngineApi {
  import spark.implicits._

  private val schemePath = s"$path/_scheme"
  private val dataPath = s"$path/data"
  private val statsPath = s"$path/_stats"

  // ---- single-writer lease -----------------------------------------
  // Every maintenance writer (compact/compactDays/eraseOld/reindex/
  // fsck/maintain) brackets its marker transitions with the store-level
  // `_LOCK` lease: a second engine instance maintaining the same path
  // fails fast (WriterLock.ConcurrentWriterException) instead of
  // interleaving markStatsOutOfSync/markStatsInSync and re-certifying a
  // half-mutated index. One owner token per engine instance; maintain()
  // re-enters the lease its sub-ops acquire. Appends stay lease-free —
  // they are serialized per instance by the append lock, and the hot
  // ingest path must not pay two FS round-trips per batch; concurrent
  // ingest from multiple engines remains (documented) merge-safe since
  // appends only add day files and refresh only touched days.
  private val writerId = graft.sources.WriterLock.newOwner()
  private def locked[T](body: => T): T =
    graft.sources.WriterLock.withLock(spark, path, writerId)(body)

  /** Opt-in lease for the APPEND path (`spark.graft.lock.appends`):
    * default off — appends are serialized per instance by the monitor,
    * and the hot path must not pay lease round-trips per batch — but a
    * deployment genuinely running multiple writer engines on one path
    * can turn every ingest into a fail-fast lease term too. Reentrant
    * with the maintenance lease (same owner token), so maintain() and
    * an append from another thread of the SAME engine never deadlock. */
  private def maybeLeased[T](body: => T): T =
    if (spark.conf.get("spark.graft.lock.appends", "false").toBoolean) locked(body)
    else body

  // ---- MEMORY-strategy hot level -----------------------------------
  // The reference's Strategy::MEMORY keeps appends in an in-process
  // memstorage level and drops them to pages when the memory limit is
  // hit [U: libdariadb/settings.h — Strategy; storage/memstorage/
  // memstorage.cpp]. Spark-native analog: each appended batch becomes a
  // persisted (MEMORY_AND_DISK) DataFrame chunk; reads union the chunks
  // under the SAME seq-freshness merge as the durable levels (O16), so
  // hot rows outrank older stored rows and are outranked by fresher
  // appends after flush — no second resolution mechanism. `flush()`
  // drains the level through the normal append path (stats index
  // included). hotCapacity == 0 ⇒ WAL/COMPRESSED behavior (every append
  // goes straight to parquet), which is also the multi-writer-safe mode;
  // the hot level, like the reference's memstorage, is single-process.
  private val hotChunks = scala.collection.mutable.ArrayBuffer[DataFrame]()
  private var hotRows = 0L

  /** Rows currently held in the MEMORY level (0 unless hotCapacity > 0). */
  def hotSize: Long = synchronized { hotRows }

  /** Drop the MEMORY level to the durable store — the memstorage→page
    * "drop" [U: storage/memstorage/memstorage.cpp — drop_by_limit]. */
  def flush(): Unit = synchronized {
    if (hotChunks.nonEmpty) maybeLeased {
      val batch = hotChunks.reduce(_ unionByName _)
      TsdbStorage.append(batch, dataPath, buckets, Some(statsPath))
      // no explicit unpersist: a concurrent reader may still hold a plan
      // over these chunks, and dropping their blocks under it would
      // force a recompute through lineage the checkpoint has truncated.
      // References are cleared; the ContextCleaner reclaims the blocks
      // once the chunk DataFrames become unreachable.
      hotChunks.clear()
      hotRows = 0L
    }
  }

  private def hotUnion: Option[DataFrame] = synchronized { hotChunks.reduceOption(_ unionByName _) }

  private def emptyMeas: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Meas.schema)

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Crash recovery for the compact swap protocols: a crash between
    * `rename(live → .old)` and `rename(.compacting → live)` leaves the
    * live path MISSING while the aside copy holds the only data — a
    * reader would then silently see an empty store/catalog (and scheme
    * re-registrations would assign ids diverging from the logged ones).
    * Restoring the aside copy (the pre-compact original) is always
    * correct: re-running compact() simply redoes the work. Checked on
    * every read-path entry; two fs.exists when the live path is absent,
    * one when present. */
  private def recoverSwap(live: String): Unit = {
    val p = new Path(live)
    if (!fs.exists(p)) {
      val old = new Path(s"$live.old")
      if (fs.exists(old)) fs.rename(old, p)
    }
  }

  private def hasData = { recoverSwap(dataPath); fs.exists(new Path(dataPath)) }
  // index exists AND its last mutation committed (data+index cannot
  // commit atomically; a crash in between leaves the marker absent and
  // every read falls back to the always-correct scan path)
  private def hasStats = TsdbStorage.statsUsable(spark, statsPath)

  private def flagPred(flag: Long) = graft.core.Flags.matches(col("flag"), flag)
  private def idPred(ids: Seq[Long]) =
    if (ids.isEmpty) lit(true) else col("id").isin(ids: _*)

  // ---- append listeners --------------------------------------------
  // The reference notifies its subscribe machinery on EVERY append
  // reaching the engine [U: engines/engine.cpp — Engine::append →
  // SubscribeNotificator]; this is the same hook, used by the network
  // server's last-hop socket push (O17). Listeners fire INSIDE the
  // append lock, after the level commit — so delivery order matches
  // commit order across concurrent appenders. Driver-side by nature
  // (the push target is a driver-held socket); the DataFrame path
  // streams the batch through toLocalIterator in bounded chunks and
  // only when a listener is actually registered.
  private val appendListeners =
    new java.util.concurrent.CopyOnWriteArrayList[Seq[Meas] => Unit]()

  /** Register an append observer (e.g. the network server's push). */
  def onAppend(listener: Seq[Meas] => Unit): Unit = appendListeners.add(listener)

  def removeAppendListener(listener: Seq[Meas] => Unit): Unit =
    appendListeners.remove(listener)

  private def notifyAppended(ms: Seq[Meas]): Unit =
    appendListeners.forEach(l => l(ms))

  private def notifyAppended(meas: DataFrame): Unit =
    if (!appendListeners.isEmpty) {
      import scala.jdk.CollectionConverters._
      meas.select(Meas.schema.fieldNames.map(col).toSeq: _*).as[Meas]
        .toLocalIterator().asScala
        .grouped(1024)
        .foreach(chunk => notifyAppended(chunk.toSeq))
    }

  // ---- O1 append ---------------------------------------------------
  /** Appends the batch AND refreshes the per-(day, id) chunk-stat index
    * for the touched days, so stat()/minMaxTime() never scan data files
    * (SURVEY.md §1.1 Statistic; §4.2 footer index).
    *
    * Under the MEMORY strategy (hotCapacity > 0) the batch lands in the
    * in-memory level instead and is dropped to parquet when the level
    * exceeds hotCapacity rows — reads see it immediately either way. */
  def append(meas: DataFrame): Unit = synchronized {
    maybeLeased(notifyAppended(appendCore(meas)))
  }
  def append(ms: Seq[Meas]): Unit = synchronized {
    maybeLeased {
      appendCore(spark.createDataset(ms).toDF())
      notifyAppended(ms)
    }
  }

  /** Level commit; returns the frame listeners should replay (the
    * checkpointed hot chunk when one was made — re-running the caller's
    * plan for notification would double-read its source). */
  private def appendCore(meas: DataFrame): DataFrame =
    if (hotCapacity <= 0L) {
      TsdbStorage.append(meas, dataPath, buckets, Some(statsPath))
      meas
    } else {
      // eager localCheckpoint: materializes the chunk AND truncates its
      // lineage — a foreachBatch-sourced batch must not keep a live
      // dependency on streaming source files that compaction/retention
      // may later remove
      val chunk = meas.localCheckpoint(true)
      hotRows += chunk.count()
      hotChunks += chunk
      if (hotRows >= hotCapacity) flush()
      chunk
    }

  /** O1, streaming strategy: continuous ingest from a Meas stream into
    * the clustered layout — the reference's WAL→Dropper→page pipeline
    * as a microbatch sink [U: storage/dropper.cpp]. Exactly-once under
    * foreachBatch's at-least-once replay via [[appendOnce]] (the
    * checkpoint path is the cursor's appId scope). */
  def appendStream(source: DataFrame, checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) => appendOnce(batch, checkpoint, bid) }
      .start()

  // (appId, batchId) idempotency cursor for the engine's OWN streaming
  // append — the same contract the artifact streams got (AnnIndex/
  // TextIndex `txn`): foreachBatch is at-least-once, and before this
  // cursor a crash between the engine commit and the streaming
  // checkpoint commit re-appended the whole micro-batch on restart.
  // Correctness was masked (mergeFreshest collapses duplicate (id,time)
  // keys) but storage and the stats refresh paid for the duplicates
  // until compact(). The cursor is a tiny root-level file (NOT under
  // _stats — reindex()/compact() rebuild that directory from scratch
  // and must not reset stream progress), overwritten after each applied
  // batch; scoped by appId so a NEW stream restarting batch numbering
  // at 0 is not mistaken for a replay.
  private def cursorFile = new Path(s"$path/_stream_cursor")

  /** A single-(appId,batchId) cursor would let TWO streams appending to
    * one engine defeat replay detection: interleaved batches alternate
    * the stored appId, so stream A's replay arriving after stream B's
    * append looks like a new app and is re-applied. The cursor is
    * therefore a small PER-APP map, most-recently-updated last, bounded
    * at [[CursorMaxApps]] concurrent streams (eviction drops the
    * longest-idle app, which then degrades to the documented
    * masked-duplicate behavior — never to data loss). */
  private val CursorMaxApps = 16

  /** appId → last applied batchId, most-recently-updated LAST. Legacy
    * single-cursor files ("appId\nbatchId", no tabs) parse as a one-
    * entry map. */
  private def readCursors(): Vector[(String, Long)] =
    if (!fs.exists(cursorFile)) Vector.empty
    else {
      val in = fs.open(cursorFile)
      try {
        val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        if (lines.exists(_.contains('\t')))
          lines.flatMap { l =>
            val i = l.lastIndexOf('\t')
            if (i < 0) None else l.drop(i + 1).toLongOption.map(l.take(i) -> _)
          }.toVector
        else
          (for { app <- lines.headOption; bid <- lines.lift(1).flatMap(_.toLongOption) }
            yield Vector(app -> bid)).getOrElse(Vector.empty)
      } finally in.close()
    }

  private def writeCursors(cur: Vector[(String, Long)]): Unit = {
    val out = fs.create(cursorFile, true)
    try out.write(cur.map { case (a, b) => s"$a\t$b" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Append a streamed micro-batch at most once: a replayed (appId,
    * batchId) — one at or behind the persisted cursor — is a no-op (no
    * parquet written, no stats refresh, no listener notification).
    *
    * The cursor engages only in DURABLE mode (hotCapacity == 0): under
    * the MEMORY strategy an applied-but-unflushed batch dies with the
    * process, and a durable cursor would then tell the replay to skip
    * it — converting at-least-once into data LOSS. The hot level keeps
    * replay-re-append semantics instead (duplicates masked by
    * mergeFreshest, paid until compact) — the same single-process
    * caveat the level itself documents. */
  def appendOnce(batch: DataFrame, appId: String, batchId: Long): Unit = synchronized {
    if (hotCapacity <= 0L) maybeLeased {
      val cursors = readCursors()
      val applied = cursors.collectFirst { case (a, b) if a == appId => b }
      if (applied.forall(batchId > _)) { // else replay: already applied
        notifyAppended(appendCore(batch))
        writeCursors((cursors.filterNot(_._1 == appId) :+ (appId -> batchId))
          .takeRight(CursorMaxApps))
      }
    } else maybeLeased(notifyAppended(appendCore(batch)))
  }

  /** Merge-on-read view: freshest row per (id, time), across the
    * durable store AND the MEMORY hot level. */
  def merged: DataFrame = mergedRange(None, None)

  /** Merge-on-read restricted to the day partitions intersecting the
    * bounds — the interval's `day` predicate is applied BEFORE the
    * dedup aggregation, so a one-day read of a 100-day store shuffles
    * one partition, not the whole store. The hot level (bounded by
    * hotCapacity, already materialized in memory) unions in under the
    * same `time` bounds before the freshness merge. */
  private def mergedRange(from: Option[Timestamp], to: Option[Timestamp]): DataFrame = {
    val cold = if (!hasData) emptyMeas else TsdbStorage.readRange(spark, dataPath, from, to)
    val levels = hotUnion match {
      case None => cold
      case Some(hot) =>
        val bounded = (from, to) match {
          case (Some(f), Some(t)) => hot.filter(col("time").between(lit(f), lit(t)))
          case (Some(f), None) => hot.filter(col("time") >= lit(f))
          case (None, Some(t)) => hot.filter(col("time") <= lit(t))
          case (None, None) => hot
        }
        cold.unionByName(bounded)
    }
    TsdbStorage.mergeFreshest(levels)
  }

  // ---- O2/O3 interval reads ----------------------------------------
  /** O2. For explicit id lists with a certified index and no hot rows,
    * the scan is restricted to the ids' RESIDENT days inside the
    * interval (index rows whose per-(day,id) [min_time, max_time]
    * intersects it) — a 300-day read of a series that lived one week
    * scans 7 partitions, not 300. Catalog-wide reads (ids empty) and
    * fallback cases take the time-pruned scan. */
  def readInterval(q: QueryInterval): DataFrame =
    if (q.ids.nonEmpty && hasStats && hotSize == 0L) readIntervalIndexed(q)
    else readIntervalScan(q)

  /** Scan path: day partitions pruned by the time bounds alone. The
    * authoritative (and fallback) answer. */
  def readIntervalScan(q: QueryInterval): DataFrame =
    mergedRange(Some(q.from), Some(q.to))
      .filter(idPred(q.ids) && col("time").between(lit(q.from), lit(q.to)) && flagPred(q.flag))
      .orderBy("id", "time")

  private def readIntervalIndexed(q: QueryInterval): DataFrame = {
    // flag is NOT consulted here (the index doesn't know flags): the day
    // set only needs to cover every day holding rows for the ids; the
    // flag predicate filters rows after the scan, same as the scan path
    val days = TsdbStorage.readStats(spark, statsPath)
      .filter(idPred(q.ids)
        && col("max_time") >= lit(q.from) && col("min_time") <= lit(q.to))
      .select("day").distinct().collect().map(_.getDate(0)).toSeq
    if (days.isEmpty) return emptyMeas.orderBy("id", "time")
    TsdbStorage.mergeFreshest(TsdbStorage.readDays(spark, dataPath, days))
      .filter(idPred(q.ids) && col("time").between(lit(q.from), lit(q.to)) && flagPred(q.flag))
      .orderBy("id", "time")
  }

  /** O3 cursor form: per-series iterator over the interval result —
    * the Id2Cursor analog [U: storage/cursors.h]. Streams through the
    * driver; never materializes the full result. */
  def intervalReader(q: QueryInterval): Iterator[Meas] = {
    val it = readInterval(q).as[Meas].toLocalIterator()
    new Iterator[Meas] { def hasNext = it.hasNext; def next() = it.next() }
  }

  /** O7 foreach: push-based scan — the IReadCallback shape
    * [U: interfaces/icallbacks.h]. Streams through the cursor; never
    * materializes the result on the driver. */
  def foreach(q: QueryInterval)(callback: Meas => Unit): Unit =
    intervalReader(q).foreach(callback)

  // ---- O4/O5 point reads -------------------------------------------
  /** O4 as-of read. Served from the stats index when it can be exact:
    * flag 0 (match-all — the index doesn't know flags), no unflushed
    * hot rows, index certified. The index pinpoints each series' LAST
    * RESIDENT day at-or-before the timepoint, so the scan touches only
    * those few partitions instead of every day up to the timepoint —
    * the difference between "a few pruned partitions" and "half the
    * store" on an aged store. Falls back to the always-correct scan. */
  def readTimePoint(q: QueryTimePoint): DataFrame =
    if (q.flag == 0L && hasStats && hotSize == 0L) readTimePointIndexed(q)
    else readTimePointScan(q)

  /** The requested-id universe: explicit lists stay literal; the "all
    * series" default derives distributedly — from the (tiny) stats
    * index when usable, from the store otherwise (no driver-side
    * collect of the id universe, no giant isin literal). */
  private def idUniverse(ids: Seq[Long]): DataFrame =
    if (ids.nonEmpty) ids.toDF("qid")
    else if (hasStats && hotSize == 0L)
      TsdbStorage.readStats(spark, statsPath).select(col("id").as("qid")).distinct()
    else merged.select(col("id").as("qid")).distinct()

  /** Scan path: prunes every day partition after the timepoint. The
    * authoritative (and fallback) answer. */
  def readTimePointScan(q: QueryTimePoint): DataFrame = {
    val idsDf = idUniverse(q.ids)
    val last = mergedRange(None, Some(q.timePoint))
      .filter(col("time") <= lit(q.timePoint) && flagPred(q.flag) && idPred(q.ids))
      .groupBy("id")
      .agg(max_by(struct(col("time"), col("value"), col("flag")), struct(col("time"), col("seq"))).as("m"))
      .select(col("id"), col("m.time").as("time"), col("m.value").as("value"), col("m.flag").as("flag"))
    // no broadcast hint: the left (preserved) side cannot be the build
    // side of a left-outer join, so a hint there is silently ignored —
    // AQE picks the per-series aggregate as the broadcast side at runtime
    idsDf.join(last, col("qid") === col("id"), "left")
      .select(col("qid").as("id"), col("time"), col("value"),
        coalesce(col("flag"), lit(Meas.NO_DATA)).as("flag"))
      .orderBy("id")
  }

  /** Index path: per id, the last day at-or-before the timepoint that
    * holds a row ≤ timepoint (day before the timepoint's day, or the
    * day itself when its min_time is ≤ the timepoint — min_time is in
    * the index, so a day whose rows all fall AFTER a mid-day timepoint
    * is correctly skipped for its predecessor). Only the distinct
    * last-resident days are scanned — for a live store, typically one
    * or two partitions. The collect is bounded by the store's day
    * count, same class as the directory listings. Exactness: the index
    * reflects the merged store (refreshed under the _SYNCED marker at
    * every mutation), and the freshness merge runs over the scanned
    * days exactly as the scan path would. */
  private def readTimePointIndexed(q: QueryTimePoint): DataFrame = {
    val tpDay = java.sql.Date.valueOf(
      q.timePoint.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate)
    val stats = TsdbStorage.readStats(spark, statsPath).filter(idPred(q.ids))
    val days = stats
      .filter(col("day") < lit(tpDay)
        || (col("day") === lit(tpDay) && col("min_time") <= lit(q.timePoint)))
      .groupBy("id").agg(max("day").as("last_day"))
      .select(col("last_day")).distinct()
      .collect().map(_.getDate(0)).toSeq
    val idsDf = idUniverse(q.ids)
    val noData = idsDf.select(col("qid").as("id"),
      lit(null).cast("timestamp").as("time"), lit(null).cast("double").as("value"),
      lit(Meas.NO_DATA).as("flag")).orderBy("id")
    if (days.isEmpty) return noData
    val last = TsdbStorage.mergeFreshest(TsdbStorage.readDays(spark, dataPath, days))
      .filter(col("time") <= lit(q.timePoint) && idPred(q.ids))
      .groupBy("id")
      .agg(max_by(struct(col("time"), col("value"), col("flag")), struct(col("time"), col("seq"))).as("m"))
      .select(col("id"), col("m.time").as("time"), col("m.value").as("value"), col("m.flag").as("flag"))
    idsDf.join(last, col("qid") === col("id"), "left")
      .select(col("qid").as("id"), col("time"), col("value"),
        coalesce(col("flag"), lit(Meas.NO_DATA)).as("flag"))
      .orderBy("id")
  }

  def currentValue(ids: Seq[Long], flag: Long): DataFrame =
    readTimePoint(QueryTimePoint(ids, flag, Meas.TIME_MAX))

  /** Grid read — the dashboard/feature-snapshot shape: every catalog
    * series sampled on a fixed step over [from, to], forward-filled
    * with a bounded staleness horizon (readTimePoint is the single-
    * point special case). The bound is what makes this an engine-grade
    * scan: plain forward fill implies unbounded history lookback, but a
    * fill older than maxStaleness answers null anyway — so the read is
    * day-pruned to [from − maxStaleness, to], a constant-width window
    * however old the store is. Grid ids come from the scheme catalog
    * (O14): a registered series with no rows in the window still emits
    * its grid points with null value — the _NO_DATA analog. One shuffle
    * (on id), one sort, one window pass (TemporalQueries.fillCore). */
  def readGrid(from: Timestamp, to: Timestamp, stepSeconds: Long,
               maxStalenessSeconds: Long): DataFrame =
    readGrid(from, to, stepSeconds, maxStalenessSeconds, None)

  def readGrid(from: Timestamp, to: Timestamp, stepSeconds: Long,
               maxStalenessSeconds: Long, gridIds: Option[DataFrame]): DataFrame = {
    require(!to.before(from), "readGrid: inverted interval")
    require(stepSeconds > 0, "readGrid: step must be positive")
    // upper bound keeps the ms/µs arithmetic below overflow — a horizon
    // past a century is "unbounded", which this API deliberately isn't
    require(maxStalenessSeconds >= 0 && maxStalenessSeconds <= 100L * 365L * 86400L,
      "readGrid: staleness must be in [0, ~100 years]")
    val lower = new Timestamp(from.getTime - maxStalenessSeconds * 1000L)
    val obs = mergedRange(Some(lower), Some(to))
      .filter(col("time").between(lit(lower), lit(to)))
      .select(col("id").as("k"), col("time").as("t"), col("seq"), col("value").as("v"))
    // gridIds (a `series_id` frame) overrides the catalog-derived grid —
    // the sharded router passes each shard the ids it OWNS, which may
    // include legacy series whose catalog row sits on another shard
    val grid = gridIds.getOrElse(ls()).select(col("series_id").as("k"))
      .withColumn("t", explode(sequence(lit(from), lit(to), expr(s"interval $stepSeconds seconds"))))
    val stalenessUs = maxStalenessSeconds * 1000000L
    val fresh = col("ft").isNotNull &&
      (unix_micros(col("t")) - unix_micros(col("ft"))) <= lit(stalenessUs)
    graft.extensions.TemporalQueries.fillCore(obs, grid)
      .select(col("k").as("id"), col("t").as("grid_ts"),
        when(fresh, col("fv")).as("value"),
        when(fresh, unix_micros(col("t")) - unix_micros(col("ft"))).as("fill_age_us"))
      .orderBy("id", "grid_ts")
  }

  // ---- O6/O8/O9 aggregates -----------------------------------------
  /** O6: min/max time per series — answered from the stats index when
    * present (a |days|×1 aggregate over index rows, no data-file scan;
    * min/max time are merge-invariant, so the index answer is exact
    * even under duplicate-key rewrites). */
  def minMaxTime(id: Long): Option[(Timestamp, Timestamp)] = {
    val r =
      if (hasStats && hotSize == 0L)
        TsdbStorage.readStats(spark, statsPath).filter(col("id") === id)
          .agg(min("min_time"), max("max_time")).head()
      else merged.filter(col("id") === id).agg(min("time"), max("time")).head()
    if (r.isNullAt(0)) None else Some((r.getTimestamp(0), r.getTimestamp(1)))
  }

  private def statPartials(df: DataFrame): DataFrame =
    df.groupBy("id")
      .agg(count(lit(1)).as("cnt"), min("time").as("min_time"), max("time").as("max_time"),
        min("value").as("min_value"), max("value").as("max_value"), sum("value").as("sum_value"))

  /** O8: the per-series Statistic struct over an interval. Served from
    * the chunk-stat index when usable, scan otherwise. (statIndexed
    * itself delegates inverted intervals back to the scan path.) The
    * index only covers the durable store, so unflushed hot rows force
    * the scan path — which reads the hot level through mergedRange. */
  def stat(id: Long, from: Timestamp, to: Timestamp): DataFrame =
    if (hasStats && hotSize == 0L) statIndexed(id, from, to)
    else statScan(id, from, to)

  /** Rebuild the chunk-stat index from scratch — the explicit repair
    * path for an index left uncertified by a crash (or for a store that
    * predates the index). Cheaper than compact(): no data rewrite. */
  def reindex(): Unit = locked {
    if (!hasData) return
    TsdbStorage.markStatsOutOfSync(spark, statsPath)
    fs.delete(new Path(statsPath), true)
    val days = fs.listStatus(new Path(dataPath)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("day="))
      .map(n => java.sql.Date.valueOf(n.stripPrefix("day=")))
    TsdbStorage.refreshStats(spark, dataPath, statsPath, days)
    TsdbStorage.markStatsInSync(spark, statsPath)
  }

  /** Scan path: merge-on-read over the pruned day range, one grouped
    * aggregation. The authoritative (and fallback) answer. */
  def statScan(id: Long, from: Timestamp, to: Timestamp): DataFrame =
    statPartials(
      mergedRange(Some(from), Some(to))
        .filter(col("id") === id && col("time").between(lit(from), lit(to))))

  /** Index path: fully-covered days are answered from per-(day, id)
    * index rows (no data files touched); at most the two boundary days
    * are scanned with partition pruning. The index stores MERGED stats
    * (refreshed per touched day at append), so the two paths agree
    * exactly — EngineSpec asserts it across append/rewrite/compact/
    * eraseOld. A 100-day stat over a 100 TB store reads ~100 tiny index
    * rows plus ≤ 2 day partitions. */
  def statIndexed(id: Long, from: Timestamp, to: Timestamp): DataFrame = {
    // inverted interval: the covered-day range is empty, but the
    // boundary-day scans below would still match real rows — delegate
    // to the scan path, whose between() filter yields the correct
    // empty result with the right schema
    if (from.after(to)) return statScan(id, from, to)
    val utc = java.time.ZoneOffset.UTC
    val fromDay = from.toInstant.atZone(utc).toLocalDate
    val toDay = to.toInstant.atZone(utc).toLocalDate
    def dayStart(d: java.time.LocalDate) = Timestamp.from(d.atStartOfDay(utc).toInstant)
    def dayEnd(d: java.time.LocalDate) =
      Timestamp.from(d.plusDays(1).atStartOfDay(utc).toInstant.minusNanos(1000))
    val fromCovered = !from.after(dayStart(fromDay))
    val toCovered = !to.before(dayEnd(toDay))
    val coveredFrom = if (fromCovered) fromDay else fromDay.plusDays(1)
    val coveredTo = if (toCovered) toDay else toDay.minusDays(1)

    val stats = TsdbStorage.readStats(spark, statsPath).filter(col("id") === id)
    val partialCols = Seq("id", "cnt", "min_time", "max_time", "min_value", "max_value", "sum_value")
    val full =
      if (coveredFrom.isAfter(coveredTo)) stats.filter(lit(false)).select(partialCols.map(col): _*)
      else stats.filter(col("day").between(
          lit(java.sql.Date.valueOf(coveredFrom)), lit(java.sql.Date.valueOf(coveredTo))))
        .select(partialCols.map(col): _*)

    // boundary-day scans: each is a single pruned partition
    val edgeBounds: Seq[(Timestamp, Timestamp)] =
      if (fromDay == toDay) { if (fromCovered && toCovered) Seq.empty else Seq((from, to)) }
      else Seq(
        if (fromCovered) None else Some((from, dayEnd(fromDay))),
        if (toCovered) None else Some((dayStart(toDay), to))).flatten
    val edges = edgeBounds.map { case (a, b) =>
      statPartials(
        mergedRange(Some(a), Some(b))
          .filter(col("id") === id && col("time").between(lit(a), lit(b))))
    }

    (full +: edges).reduce(_ unionByName _)
      .groupBy("id")
      .agg(sum("cnt").as("cnt"), min("min_time").as("min_time"), max("max_time").as("max_time"),
        min("min_value").as("min_value"), max("max_value").as("max_value"),
        sum("sum_value").as("sum_value"))
  }

  /** O9: the named statistic-calculator function set, selectable by
    * name like the reference's `Calculator::apply(..., {functions})`
    * [U: statistic/calculator.h — FunctionFactory::functions]. Unknown
    * names fail fast (the reference's factory silently yields nothing
    * for them — failing is the safer contract).
    *
    * Skew route: the algebraic functions partial-aggregate map-side and
    * cannot overload a reducer, but exact `percentile` buffers a
    * value→count map per group whose final merge lands a hot series'
    * whole value multiset on ONE task. When the stats index reports a
    * queried series above `percentileSkewThreshold` rows, percentile
    * functions are served by SkewTools.distributedPercentiles (counts +
    * cumulative rank over slim rows — spillable) — bit-identical
    * answers (SkewToolsSpec), bounded per-task memory. */
  def calculator(q: QueryInterval,
                 functions: Seq[String] = GraftEngine.CalculatorFunctions,
                 percentileSkewThreshold: Long = GraftEngine.PercentileSkewThreshold): DataFrame = {
    val pcts = GraftEngine.PercentileFunctions.filter { case (n, _) => functions.contains(n) }
    if (pcts.isEmpty || maxSeriesRowsInRange(q) <= percentileSkewThreshold) {
      val selected = GraftEngine.calculatorAggs(functions)
      readInterval(q)
        .groupBy("id")
        .agg(selected.head, selected.tail: _*)
        .orderBy("id")
    } else {
      val rows = readInterval(q)
      val pctDf = graft.operators.SkewTools
        .distributedPercentiles(rows, col("id"), col("value"), pcts)
        .withColumnRenamed("k", "id")
      val others = functions.filterNot(pcts.map(_._1).toSet)
      val joined =
        if (others.isEmpty) pctDf
        else {
          val sel = GraftEngine.calculatorAggs(others)
          rows.groupBy("id").agg(sel.head, sel.tail: _*).join(pctDf, "id")
        }
      val outName = (f: String) => if (f == "count") "cnt" else f
      // requested column order, regardless of which route computed each
      joined.select(col("id") +: functions.map(f => col(outName(f))): _*).orderBy("id")
    }
  }

  /** Skew detector for the calculator: the largest per-series row count
    * inside the query's day range, answered from the per-(day, id)
    * stats index — bounded index rows, no data files touched. Flag
    * filters are ignored (an overcount only routes to the equally-exact
    * distributed path). 0 when the index cannot answer (absent, stale,
    * or unflushed hot rows) — the default path then applies. */
  private def maxSeriesRowsInRange(q: QueryInterval): Long = {
    if (!(hasStats && hotSize == 0L) || q.from.after(q.to)) return 0L
    val utc = java.time.ZoneOffset.UTC
    val fromDay = java.sql.Date.valueOf(q.from.toInstant.atZone(utc).toLocalDate)
    val toDay = java.sql.Date.valueOf(q.to.toInstant.atZone(utc).toLocalDate)
    TsdbStorage.readStats(spark, statsPath)
      .filter(idPred(q.ids) && col("day").between(lit(fromDay), lit(toDay)))
      .groupBy("id").agg(sum("cnt").as("c"))
      .agg(coalesce(max("c"), lit(0L)))
      .head().getLong(0)
  }

  // ---- O10 subscribe (delegates to the one subscription definition) --
  // Subscriptions tap the DURABLE level (the parquet file stream):
  // MEMORY-level rows reach subscribers at flush time, the same moment
  // the reference's memstorage drop makes them page-visible.
  def subscribe(ids: Seq[Long], flag: Long, queryName: String, checkpoint: String): StreamingQuery =
    Subscribe.start(spark, dataPath, ids, flag, queryName, checkpoint, dayPartitioned = true)

  /** O10 extension: continuous anomaly detection over the append
    * stream — each flushed sample scored against its series' preceding
    * w-sample window (StatefulStreams.zscores; streamed scores are
    * bit-identical to the batch `series_zscore` operator). Same
    * durable-level tap as subscribe(). */
  def subscribeAnomalies(queryName: String, checkpoint: String, w: Int = 8): StreamingQuery =
    graft.streaming.StatefulStreams.startZscores(
      spark, dataPath, queryName, checkpoint, w, dayPartitioned = true)

  // ---- O11/O12/O13 maintenance -------------------------------------
  def eraseOld(cutoff: Timestamp): Seq[String] = locked {
    // interpret the cutoff in UTC explicitly: day partitions are derived
    // under the session TZ (pinned UTC), while Timestamp.toLocalDateTime
    // uses the JVM default TZ — on a non-UTC JVM that off-by-hours day
    // would drop a partition still containing in-retention data
    // drop the MEMORY level to its day partitions first, so retention
    // applies uniformly (the reference drops memstorage before erase)
    flush()
    val cutoffDay = cutoff.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
    // the stats index is day-partitioned identically — drop in lockstep,
    // bracketed by the sync marker so a crash mid-drop disables the
    // index. Re-certify only if the index was usable going in: dropping
    // days from an already-stale index must not launder it back to
    // "usable" (repair is compact()/reindex(), never incidental).
    val wasUsable = hasStats
    TsdbStorage.markStatsOutOfSync(spark, statsPath)
    TsdbStorage.eraseOld(spark, statsPath, cutoffDay)
    val dropped = TsdbStorage.eraseOld(spark, dataPath, cutoffDay)
    if (wasUsable) TsdbStorage.markStatsInSync(spark, statsPath)
    dropped
  }

  /** O11, per-id variant [U: engines/engine.cpp — eraseOld(id, to)]:
    * drop only the given series' rows older than the cutoff. Unlike the
    * whole-store form this cannot be a partition drop — affected day
    * partitions are REWRITTEN with an anti-filter (dynamic partition
    * overwrite: untouched days are never read or written). The
    * per-(day, id) stats index restricts the rewrite to days ACTUALLY
    * holding erasable rows for the target ids (index row present with
    * min_time < cutoff) — so erasing a series that lived one week out
    * of a year-old store rewrites ~7 days, not 365. Falls back to the
    * full pre-cutoff day list when the index is unusable; cost is then
    * proportional to the days the cutoff spans, never the store. */
  def eraseOld(cutoff: Timestamp, ids: Seq[Long]): Seq[String] = locked {
    require(ids.nonEmpty, "per-id eraseOld needs at least one id")
    flush()
    if (!hasData) return Seq.empty
    val cutoffDay = cutoff.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
    // unlike the whole-store partition-drop form (day granularity by
    // necessity), this path is a row-level rewrite — so a mid-day cutoff
    // includes the cutoff day itself and the keep-filter's exact time
    // bound applies. A midnight cutoff skips it (no row can precede
    // 00:00 on its own day).
    val midnightCutoff =
      cutoff.toInstant == cutoffDay.atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    val candidateDays = fs.listStatus(new Path(dataPath)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("day="))
      .map(n => java.sql.Date.valueOf(n.stripPrefix("day=")))
      .filter(d => d.toLocalDate.isBefore(cutoffDay)
        || (!midnightCutoff && d.toLocalDate == cutoffDay))
    if (candidateDays.isEmpty) return Seq.empty
    val wasUsable = hasStats
    // index-driven day pruning: the index reflects the MERGED store, so
    // a (day, id) row with min_time < cutoff exists iff that day holds
    // at least one erasable row. The collect is bounded by the candidate
    // day count (tiny), same as the directory listing above.
    val affectedDays =
      if (!wasUsable) candidateDays
      else {
        val present = TsdbStorage.readStats(spark, statsPath)
          .filter(idPred(ids) && col("day").isin(candidateDays: _*)
            && col("min_time") < lit(cutoff))
          .select("day").distinct()
          .collect().map(_.getDate(0)).toSet
        candidateDays.filter(present)
      }
    if (affectedDays.isEmpty) return Seq.empty
    TsdbStorage.markStatsOutOfSync(spark, statsPath)
    TsdbStorage.rewriteDaysFiltered(spark, dataPath, affectedDays, buckets,
      keep = !(col("id").isin(ids: _*) && col("time") < lit(cutoff)))
    if (wasUsable) {
      TsdbStorage.refreshStats(spark, dataPath, statsPath, affectedDays)
      TsdbStorage.markStatsInSync(spark, statsPath)
    }
    affectedDays.map(d => s"day=$d")
  }

  /** O12: rewrite the store with merge-on-read materialized.
    * Crash-safe ordering for a single-writer store: stale tmp from a
    * previously crashed run is removed first (mode("append") would
    * otherwise merge it into the new snapshot), and the old store is
    * moved aside before the swap so no failure point leaves the store
    * path empty — a crash leaves either the old or the new snapshot
    * recoverable. */
  def compact(): Unit = locked {
    flush()
    // repack the scheme log first (independent of data presence):
    // per-call appends accumulate one tiny file each; compact() is
    // where the store pays that debt down
    compactScheme()
    if (!hasData) return // hasData ran the swap-recovery preamble
    val tmp = new Path(s"$dataPath.compacting")
    val old = new Path(s"$dataPath.old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    // disable the index across the whole rewrite: a crash anywhere in
    // here must leave readers on the scan path, never a stale index
    TsdbStorage.markStatsOutOfSync(spark, statsPath)
    TsdbStorage.compactTo(spark, dataPath, tmp.toString, buckets)
    val p = new Path(dataPath)
    fs.rename(p, old)
    fs.rename(tmp, p)
    fs.delete(old, true)
    // rebuild the stats index from the compacted store: per-day rows for
    // days whose duplicates were just collapsed would otherwise go stale
    fs.delete(new Path(statsPath), true)
    val days = fs.listStatus(new Path(dataPath)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("day="))
      .map(n => java.sql.Date.valueOf(n.stripPrefix("day=")))
    TsdbStorage.refreshStats(spark, dataPath, statsPath, days)
    TsdbStorage.markStatsInSync(spark, statsPath)
  }

  /** O12, incremental form: compact ONLY the given day partitions
    * (merge-on-read materialized, small files coalesced) — how an aged
    * store pays down its hot days' append debt without the full-store
    * rewrite. The stats index rows for these days are value-invariant
    * (they already reflect the merged view) but are refreshed anyway so
    * index files track data files one-to-one. */
  def compactDays(days: Seq[java.sql.Date]): Unit = locked {
    flush()
    if (!hasData || days.isEmpty) return
    // no-op for days this store doesn't host (a sharded router passes
    // every shard the same day list) — saves the rewrite/index machinery
    // an empty pass
    val existing = fs.listStatus(new Path(dataPath)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("day="))
      .map(n => java.sql.Date.valueOf(n.stripPrefix("day="))).toSet
    val target = days.filter(existing)
    if (target.isEmpty) return
    val wasUsable = hasStats
    TsdbStorage.markStatsOutOfSync(spark, statsPath)
    TsdbStorage.compactDays(spark, dataPath, target, buckets)
    if (wasUsable) {
      TsdbStorage.refreshStats(spark, dataPath, statsPath, target)
      TsdbStorage.markStatsInSync(spark, statsPath)
    }
  }

  /** The days worth compacting: more parquet files than `maxFiles` (the
    * append-accumulation signature). Pure directory-listing metadata —
    * the periodic-maintenance driver for [[compactDays]], the analog of
    * the reference's period-worker picking hot chunks to drop. */
  def fragmentedDays(maxFiles: Int = 2 * buckets): Seq[java.sql.Date] = {
    if (!hasData) return Seq.empty
    fs.listStatus(new Path(dataPath)).toSeq
      .filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("day="))
      .filter(d => fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet")) > maxFiles)
      .map(d => java.sql.Date.valueOf(d.getPath.getName.stripPrefix("day=")))
      .sortBy(_.toString)
  }

  /** The nightly-maintenance entrypoint — one call chains the repair
    * and debt-payment ops a production deployment crons, in dependency
    * order: integrity probe (dropping corrupt files when `repair`) →
    * targeted compaction of append-fragmented days → stat-index rebuild
    * IF anything above (or a prior crash) left it uncertified. After a
    * clean maintain(), every index-served read path is armed again.
    * Idempotent: a second run reports nothing to do.
    *
    * The store's ARTIFACT indexes cron through the same call: pass
    * `annIndex`/`textIndex` as (indexDir, corpus) and each gets the
    * same probe → repair → debt-payment cycle — fsck (corrupt files
    * dropped + index uncertified), REBUILD from the corpus when left
    * uncertified (artifact repair IS rebuild: the index is derived
    * data), and a size-targeted compact when append-accumulated. The
    * corpus travels with the dir because recertification cannot be
    * conjured from the index's own (possibly damaged) files. Artifact
    * dirs hold their own `_LOCK` leases (separate dirs, separate
    * writers), taken sequentially inside the store's lease. */
  def maintain(maxFilesPerDay: Int = 2 * buckets, repair: Boolean = true,
               annIndex: Option[(String, DataFrame)] = None,
               textIndex: Option[(String, DataFrame)] = None): MaintenanceReport = locked {
    val corrupt = fsck(repair)
    val frag = fragmentedDays(maxFilesPerDay)
    if (frag.nonEmpty) compactDays(frag)
    val reindexNeeded = hasData && !TsdbStorage.statsUsable(spark, statsPath)
    if (reindexNeeded) reindex()
    MaintenanceReport(corrupt, frag, reindexNeeded,
      maintainArtifacts(annIndex, textIndex, repair))
  }

  /** The artifact-index half of [[maintain]], callable on its own: each
    * handed index gets the probe → verify → rebuild-if-uncertified →
    * compact-if-fragmented cycle. Artifact dirs hold their own `_LOCK`
    * leases (separate dirs, separate writers), so this needs no store
    * lease — which is what lets [[ShardedEngine.maintain]] run it
    * exactly ONCE for corpus-level artifacts after the per-shard
    * fan-out instead of once per shard. */
  def maintainArtifacts(annIndex: Option[(String, DataFrame)] = None,
                        textIndex: Option[(String, DataFrame)] = None,
                        repair: Boolean = true): Seq[ArtifactReport] =
    annIndex.map { case (dir, corpus) =>
      maintainArtifact(dir,
        r => graft.extensions.AnnIndex.fsck(spark, dir, r),
        graft.extensions.AnnIndex.usable(spark, dir),
        () => graft.extensions.AnnIndex.verify(spark, dir, corpus),
        () => graft.extensions.AnnIndex.build(spark, corpus, dir),
        () => graft.extensions.AnnIndex.fragmented(spark, dir),
        () => graft.extensions.AnnIndex.compact(spark, dir), repair,
        health = () => graft.extensions.AnnIndex.quantizerHealth(spark, dir, corpus),
        retune = () => graft.extensions.AnnIndex.rebuildGrown(spark, corpus, dir))
    }.toSeq ++
    textIndex.map { case (dir, corpus) =>
      maintainArtifact(dir,
        r => graft.extensions.TextIndex.fsck(spark, dir, r),
        graft.extensions.TextIndex.usable(spark, dir),
        () => graft.extensions.TextIndex.verify(spark, dir, corpus),
        () => graft.extensions.TextIndex.build(spark, corpus, dir),
        () => graft.extensions.TextIndex.fragmented(spark, dir),
        () => graft.extensions.TextIndex.compact(spark, dir), repair)
    }.toSeq

  /** One artifact's probe → verify → rebuild-if-uncertified →
    * compact-if-fragmented cycle. `existedUsable` is sampled BEFORE fsck
    * so a never-built dir (nothing to rebuild from scratch here — the
    * user never asked for an index) is distinguished from one a crash or
    * the probe just uncertified. `verifyF` is the full-fingerprint audit
    * (content term always included): it uncertifies an index that no
    * longer matches its corpus — a corpus grown or mutated without the
    * index keeping up is caught HERE even when the per-query content
    * check is opted out (ContentCheckKey). */
  private def maintainArtifact(dir: String, fsckF: Boolean => Seq[String],
                               existedUsable: Boolean, verifyF: () => Boolean,
                               rebuild: () => Unit,
                               fragged: () => Boolean, compactF: () => Unit,
                               repair: Boolean,
                               health: () => Option[String] = () => None,
                               retune: () => Unit = () => ()): ArtifactReport = {
    val existed = existedUsable || // uncertified remains of a real index: rebuildable
      new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration).exists(new Path(dir))
    val bad = fsckF(repair)
    if (TsdbStorage.statsUsable(spark, dir)) verifyF() // uncertifies on mismatch
    val needRebuild = existed && !TsdbStorage.statsUsable(spark, dir)
    if (needRebuild && repair) rebuild()
    // tuning-debt payment, consulted only on a CERTIFIED index (a
    // rebuild above re-derived the quantizer already — health then
    // re-checks the FRESH one, so a rebuild that still collapses gets
    // its retune in the same pass): acts on the quantizerHealth signal
    // (the ivf_cell_stats retrain trigger), rebuilding with grown k
    val retuned = if (repair && TsdbStorage.statsUsable(spark, dir)) health() else None
    retuned.foreach(_ => retune())
    val doCompact = fragged()
    if (doCompact) compactF()
    ArtifactReport(dir, bad, needRebuild && repair, doCompact, retuned)
  }

  /** Rewrite the append-only scheme log as its dedup view in one file
    * (same tmp-swap discipline as the data rewrite). */
  private def compactScheme(): Unit = {
    recoverSwap(schemePath)
    if (!fs.exists(new Path(schemePath))) return
    val tmp = new Path(s"$schemePath.compacting")
    val old = new Path(s"$schemePath.old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    ls().coalesce(1).write.parquet(tmp.toString)
    val p = new Path(schemePath)
    fs.rename(p, old)
    fs.rename(tmp, p)
    fs.delete(old, true)
  }

  /** O13 fsck: verify every data file — footer, every row group, and
    * every page payload DECOMPRESSED for every column (a head-only or
    * header-only probe would miss in-page corruption; codec framing and
    * checksums fail on bit-flipped payloads). Value-level re-decoding
    * beyond decompression is not performed. Optionally drops broken
    * files [U: engines/engine.cpp — fsck]. Returns the bad file list.
    *
    * The store's ARTIFACTS are probed too, with repair semantics per
    * artifact: a corrupt stats-index file UNCERTIFIES the index
    * immediately (even without repair — readers must fall back to the
    * scan path, not throw mid-query; `reindex()`/`compact()` rebuild),
    * and with repair the bad index files are dropped. A corrupt scheme
    * log file is REPORTED but never deleted, repair or not — the log is
    * the only copy of legacy id assignments; dropping rows would
    * silently re-assign divergent content-addressed ids.
    *
    * The probe runs DISTRIBUTED: file paths are parallelized and each
    * executor task walks its files — O(#files / cluster-cores)
    * wall-clock, not O(#files) driver round-trips. */
  def fsck(repair: Boolean = false): Seq[String] = locked {
    // a writer even without `repair`: the probe may uncertify the stats
    // index and runs the swap-recovery preamble (both mutations)
    val badData = if (!hasData) Seq.empty
      else TsdbStorage.probeFiles(spark, dataPath)
    if (repair && badData.nonEmpty) {
      // dropping data files CHANGES the merged store — the per-(day,id)
      // stats must not keep serving counts that include the dropped
      // rows. Uncertify; reads fall back to the scan path until
      // reindex()/maintain() rebuilds from the surviving files.
      TsdbStorage.markStatsOutOfSync(spark, statsPath)
      badData.foreach(p => fs.delete(new Path(p), false))
    }
    val badStats = TsdbStorage.probeFiles(spark, statsPath)
    if (badStats.nonEmpty) {
      TsdbStorage.markStatsOutOfSync(spark, statsPath)
      if (repair) badStats.foreach(p => fs.delete(new Path(p), false))
    }
    val badScheme = {
      recoverSwap(schemePath)
      TsdbStorage.probeFiles(spark, schemePath)
    }
    badData ++ badStats ++ badScheme
  }

  // ---- O14 scheme --------------------------------------------------
  /** addParam: register (or look up) a series name → id
    * [U: scheme/scheme.cpp — Scheme::addParam].
    *
    * Content-addressed: the id IS a 63-bit md5 prefix of the name, so
    * registration never reads the existing catalog — it appends ONE row
    * to an append-only log, O(1) at any catalog size (the round-2
    * read-modify-write collected and rewrote the whole catalog per
    * call). `ls()` is the log's dedup view: duplicate registrations of
    * the same name produce bit-identical rows, which `distinct`
    * collapses. Collision odds are n²/2⁶⁴ ≈ 5e-8 at a million series —
    * the same determinism-for-capacity trade every content-addressed id
    * in this repo makes. The catalog memo loads from the log once per
    * engine instance (O(catalog) once, O(1) per call — never the
    * round-2 per-call read-modify-write), which also keeps the log
    * authoritative for stores whose ids predate content addressing. */
  def addParam(name: String): Long = synchronized {
    knownIds.getOrElse(name, {
      val id = GraftEngine.seriesId(name)
      knownIds(name) = id
      appendScheme(Seq(name -> id))
      id
    })
  }

  /** Batch registration: one log write for any number of names — the
    * shape to use when onboarding 10⁴+ series. */
  def addParams(names: Seq[String]): Map[String, Long] = synchronized {
    val fresh = names.distinct.filterNot(knownIds.contains)
      .map(n => n -> GraftEngine.seriesId(n))
    fresh.foreach { case (n, id) => knownIds(n) = id }
    if (fresh.nonEmpty) appendScheme(fresh)
    names.map(n => n -> knownIds(n)).toMap
  }

  /** Driver memo of the catalog, loaded from the log ONCE per engine
    * instance (single-writer store, like the reference's in-process
    * Scheme). The log stays authoritative: a store whose catalog was
    * written by an engine version with different id assignment keeps
    * its stored ids — re-registration returns the logged id, never a
    * conflicting fresh one.
    *
    * SIZE CONTRACT: this is a deliberate driver-side materialization —
    * ~100 B/entry, so 10⁶ series ≈ 100 MB of driver heap, the same
    * order as the reference's in-process scheme map. It is the right
    * trade while catalogs are ≤ a few million names (every param-id
    * lookup is O(1), no Spark job per name); a 10⁷⁺-series deployment
    * should shard engines (ShardedEngine routes by id hash, so each
    * driver memo holds only its shard's names) before it outgrows
    * this map. The WARN below makes the approach self-reporting
    * instead of failing as a silent heap creep. */
  private lazy val knownIds: scala.collection.mutable.HashMap[String, Long] = {
    val m = scala.collection.mutable.HashMap[String, Long]()
    ls().collect().foreach(r => m(r.getString(0)) = r.getLong(1))
    if (m.size > 2000000)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"scheme catalog memo holds ${m.size} names (~${m.size / 10000} MB driver heap); " +
          "consider sharding the store (ShardedEngine) before the catalog outgrows the driver")
    m
  }

  private def appendScheme(rows: Seq[(String, Long)]): Unit =
    rows.toDF("name", "series_id").coalesce(1).write.mode("append").parquet(schemePath)

  /** getParamId: served from the once-per-engine driver memo — a Spark
    * job per name lookup would reintroduce the per-call catalog-scan
    * cost addParam was rid of (single-writer store: the memo cannot go
    * stale under this engine's own registrations, which update it). */
  def getParamId(name: String): Option[Long] = synchronized { knownIds.get(name) }

  /** Adopt an EXISTING (name, id) registration from another store — used
    * by the sharded router to co-locate a legacy catalog row with the
    * shard that owns the id's data. No-op when the name is known. */
  private[engine] def adopt(name: String, id: Long): Unit = adoptAll(Seq(name -> id))

  /** Batched adoption: ONE log write for any number of foreign
    * registrations — the sharded router's bulk-onboarding path (a
    * per-name append would write one tiny file per name). */
  private[engine] def adoptAll(rows: Seq[(String, Long)]): Unit = synchronized {
    val fresh = rows.filterNot { case (n, _) => knownIds.contains(n) }
    fresh.foreach { case (n, id) => knownIds(n) = id }
    if (fresh.nonEmpty) appendScheme(fresh)
  }

  /** ls(): the catalog (dedup view over the append-only log). */
  def ls(): DataFrame = {
    recoverSwap(schemePath)
    if (!fs.exists(new Path(schemePath)))
      Seq.empty[(String, Long)].toDF("name", "series_id")
    else spark.read.parquet(schemePath).distinct()
  }
}

object GraftEngine {
  /** O9 function names [U: statistic/calculator.cpp — FunctionFactory]. */
  val CalculatorFunctions: Seq[String] =
    Seq("average", "median", "percentile90", "percentile99", "sigma", "minimum", "maximum", "count")

  /** The O9 functions that buffer per-group state (exact percentile) —
    * eligible for the distributed hot-series route in `calculator`. */
  val PercentileFunctions: Seq[(String, Double)] =
    Seq("median" -> 0.5, "percentile90" -> 0.9, "percentile99" -> 0.99)

  /** Per-series row count past which `calculator` serves percentiles
    * via the distributed counts+rank path instead of the built-in
    * buffering aggregate (~8M rows ≈ where a value→count map per merge
    * task stops being comfortably memory-resident). */
  val PercentileSkewThreshold: Long = 8L * 1000 * 1000

  /** The SINGLE name→aggregate definition of the O9 function set —
    * `calculator` above and the oracle-gated `calculator_subset` query
    * both build from it, so the driver's hash gate pins the facade's
    * selection logic, not a parallel re-implementation. Unknown names
    * fail fast (the reference's factory silently yields nothing — the
    * safer contract here is failing). `round6` wraps the float
    * aggregates for cross-engine determinism in gated queries; the
    * facade serves full precision. */
  def calculatorAggs(functions: Seq[String], round6: Boolean = false): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions._
    val unknown = functions.filterNot(CalculatorFunctions.contains)
    require(unknown.isEmpty, s"unknown calculator functions: ${unknown.mkString(", ")}")
    require(functions.nonEmpty, "calculator needs at least one function")
    def r(c: org.apache.spark.sql.Column) = if (round6) round(c, 6) else c
    functions.map {
      case "average"      => r(avg("value")).as("average")
      case "median"       => r(expr("percentile(value, 0.5D)")).as("median")
      case "percentile90" => r(expr("percentile(value, 0.9D)")).as("percentile90")
      case "percentile99" => r(expr("percentile(value, 0.99D)")).as("percentile99")
      case "sigma"        => r(stddev_pop("value")).as("sigma")
      case "minimum"      => min("value").as("minimum")
      case "maximum"      => max("value").as("maximum")
      case "count"        => count(lit(1)).as("cnt")
    }
  }

  /** Content-addressed series id: first 8 bytes of md5(name), sign bit
    * cleared. Deterministic across engines/shards — two stores assign
    * the same id to the same name with no coordination. */
  def seriesId(name: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(name.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d).getLong & Long.MaxValue
  }
}
