package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.{Flags, Meas}
import graft.engine.{GraftEngine, QueryInterval, QueryTimePoint}
import graft.sources.EventsSource

/** End-to-end spec of the embedded-engine facade: a dariadb user's
  * session (append → query → subscribe → maintain) against one store.
  */
class EngineSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("full engine lifecycle: append, interval/point reads, stat, scheme, retention, compaction") {
    val engine = new GraftEngine(spark, tmpDir("graft-engine"), buckets = 4)

    // O14 scheme
    val idA = engine.addParam("host1.cpu.load")
    val idB = engine.addParam("host1.mem.free")
    assert(idA !== idB)
    assert(engine.addParam("host1.cpu.load") === idA, "addParam is idempotent")
    assert(engine.getParamId("host1.mem.free") === Some(idB))
    assert(engine.ls().count() === 2)

    // O1 append (two batches, second rewrites one point with fresher seq)
    engine.append(Seq(
      Meas(idA, ts("2024-03-01 10:00:00"), 1.0, Flags.CLICK, 1),
      Meas(idA, ts("2024-03-01 11:00:00"), 2.0, Flags.CLICK, 2),
      Meas(idA, ts("2024-03-02 10:00:00"), 3.0, Flags.ERROR, 3),
      Meas(idB, ts("2024-03-01 10:30:00"), 10.0, Flags.CLICK, 4)))
    engine.append(Seq(
      Meas(idA, ts("2024-03-01 11:00:00"), 20.0, Flags.CLICK, 5))) // fresher rewrite

    // O2 merge-on-read: rewrite wins, no duplicate keys
    val all = engine.readInterval(QueryInterval(Seq(idA), 0L, ts("2024-03-01 00:00:00"), ts("2024-03-03 00:00:00")))
    assert(all.count() === 3)
    assert(all.filter(col("time") === ts("2024-03-01 11:00:00")).head().getDouble(2) === 20.0)

    // flag filtering: any-shared-bit
    val errs = engine.readInterval(QueryInterval(Seq(idA), Flags.ERROR, ts("2024-03-01 00:00:00"), ts("2024-03-03 00:00:00")))
    assert(errs.count() === 1)

    // O3 cursor
    val cursor = engine.intervalReader(QueryInterval(Seq(idA), 0L, ts("2024-03-01 00:00:00"), ts("2024-03-03 00:00:00")))
    val times = cursor.map(_.time).toList
    assert(times === times.sorted, "cursor is time-ordered")

    // O4 as-of read + _NO_DATA
    val tp = engine.readTimePoint(QueryTimePoint(Seq(idA, idB, 999L), 0L, ts("2024-03-01 10:45:00")))
    assert(tp.count() === 3)
    val rows = tp.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(idA).getDouble(2) === 1.0, "latest at-or-before 10:45 is the 10:00 point")
    assert(rows(999L).getLong(3) === Meas.NO_DATA)

    // O5 current values
    val cur = engine.currentValue(Seq(idA), 0L)
    assert(cur.head().getDouble(2) === 3.0)

    // O6 min/max time
    val Some((mn, mx)) = engine.minMaxTime(idA)
    assert(mn === ts("2024-03-01 10:00:00") && mx === ts("2024-03-02 10:00:00"))

    // O8 stat
    val st = engine.stat(idA, ts("2024-03-01 00:00:00"), ts("2024-03-03 00:00:00")).head()
    assert(st.getLong(1) === 3 && st.getDouble(6) === 24.0) // cnt, sum

    // O9 calculator: named-function selection like FunctionFactory
    val calc = engine.calculator(
      QueryInterval(Seq(idA), 0L, ts("2024-03-01 00:00:00"), ts("2024-03-03 00:00:00")),
      Seq("average", "maximum", "count"))
    assert(calc.columns.toSeq === Seq("id", "average", "maximum", "cnt"))
    val c0 = calc.head()
    assert(c0.getDouble(2) === 20.0 && c0.getLong(3) === 3)
    intercept[IllegalArgumentException] {
      engine.calculator(QueryInterval(Seq(idA), 0L, ts("2024-03-01 00:00:00"), ts("2024-03-03 00:00:00")),
        Seq("no_such_function"))
    }

    // O13 fsck clean store
    assert(engine.fsck() === Seq.empty)

    // O11 retention: drop the 2024-03-01 partition
    val dropped = engine.eraseOld(ts("2024-03-02 00:00:00"))
    assert(dropped === Seq("day=2024-03-01"))
    assert(engine.merged.count() === 1)

    // O12 compact rewrites in place and preserves content
    engine.append(Seq(Meas(idA, ts("2024-03-02 10:00:00"), 99.0, Flags.ERROR, 100)))
    engine.compact()
    val after = engine.merged.collect()
    assert(after.length === 1 && after.head.getDouble(2) === 99.0)
  }

  test("compact-swap crash recovery: a live path left aside-only is restored on next read") {
    val dir = tmpDir("graft-swap")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    val id = engine.addParam("swap.series")
    engine.append(Seq(Meas(id, ts("2024-03-01 10:00:00"), 5.0, Flags.CLICK, 1)))

    // simulate a compactScheme() crash between rename(_scheme → .old)
    // and rename(.compacting → _scheme): the aside copy is the only copy
    val scheme = new java.io.File(s"$dir/_scheme")
    assert(scheme.renameTo(new java.io.File(s"$dir/_scheme.old")))
    // ls() must recover the catalog, NOT silently read it as empty
    assert(engine.ls().count() === 1)
    assert(scheme.exists, "recovery restored the live scheme path")
    // a fresh engine (no memo) still resolves the logged id after recovery
    assert(new GraftEngine(spark, dir, buckets = 2).getParamId("swap.series") === Some(id))

    // same crash window for the data compact(): data → data.old only
    val data = new java.io.File(s"$dir/data")
    assert(data.renameTo(new java.io.File(s"$dir/data.old")))
    assert(engine.merged.count() === 1, "read path recovered the aside data copy")
    assert(data.exists)
    // and compact() itself starts with the recovery preamble
    assert(data.renameTo(new java.io.File(s"$dir/data.old")))
    engine.compact()
    assert(engine.merged.count() === 1)
  }

  test("fsck detects and repairs a corrupt data file") {
    val dir = tmpDir("graft-fsck")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    engine.append(Seq(Meas(1L, ts("2024-03-01 10:00:00"), 1.0, 1L, 1)))
    // plant a corrupt file inside the day partition
    val day = new java.io.File(s"$dir/data/day=2024-03-01")
    val corrupt = new java.io.File(day, "part-corrupt.parquet")
    java.nio.file.Files.write(corrupt.toPath, "not parquet at all".getBytes)
    val bad = engine.fsck(repair = false)
    assert(bad.exists(_.contains("part-corrupt")), s"fsck must flag the corrupt file, got $bad")
    engine.fsck(repair = true)
    assert(!corrupt.exists, "repair must delete the corrupt file")
    assert(engine.fsck() === Seq.empty)
    assert(engine.merged.count() === 1)

    // repairing a REAL data file changes the merged store — the stats
    // index must be uncertified (else index-served stats keep counting
    // the dropped rows) and a reindex rebuilds from the survivors
    val dir2 = tmpDir("graft-fsck-real")
    val engine2 = new GraftEngine(spark, dir2, buckets = 1)
    engine2.append(Seq(
      Meas(1L, ts("2024-03-01 10:00:00"), 1.0, 1L, 1),
      Meas(1L, ts("2024-03-02 10:00:00"), 2.0, 1L, 2)))
    new java.io.File(s"$dir2/data/day=2024-03-01").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.write(f.toPath, "ruined".getBytes))
    assert(engine2.fsck(repair = true).nonEmpty)
    assert(!graft.sources.TsdbStorage.statsUsable(spark, s"$dir2/_stats"),
      "content-changing repair must uncertify the index")
    engine2.reindex()
    val st = engine2.stat(1L, ts("2024-03-01 00:00:00"), ts("2024-03-03 00:00:00")).head()
    assert(st.getLong(1) === 1L && st.getDouble(6) === 2.0,
      "rebuilt index reflects only the surviving rows (cnt=1, sum=2.0)")
  }

  test("readGrid: staleness-bounded forward fill, catalog-driven grid, out-of-horizon days pruned") {
    val dir = tmpDir("graft-grid")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    val idA = engine.addParam("grid.a")
    val idB = engine.addParam("grid.b") // registered, no data → null grid rows
    engine.append(Seq(
      Meas(idA, ts("2024-03-01 10:00:00"), 1.0, 1L, 1),   // far outside the horizon
      Meas(idA, ts("2024-03-05 09:30:00"), 5.0, 1L, 2),
      Meas(idA, ts("2024-03-05 11:10:00"), 7.0, 1L, 3)))

    // horizon = 1h back from 10:00 → scan range [09:00, 13:00]: the
    // 2024-03-01 day partition is pruned. Prove it the hard way: corrupt
    // that partition on disk — a pruned read must still succeed.
    val day1 = new java.io.File(s"$dir/data/day=2024-03-01")
    day1.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.write(f.toPath, "ruined".getBytes))

    val out = engine.readGrid(ts("2024-03-05 10:00:00"), ts("2024-03-05 13:00:00"),
      stepSeconds = 3600L, maxStalenessSeconds = 3600L)
    val rows = out.collect()
    assert(rows.length === 8, "2 catalog series x 4 grid points")

    def cell(id: Long, t: String): Option[Double] =
      rows.find(r => r.getLong(0) == id && r.getTimestamp(1) == ts(t))
        .flatMap(r => Option(r.get(2)).map(_.asInstanceOf[Double]))
    assert(cell(idA, "2024-03-05 10:00:00") === Some(5.0), "09:30 obs within 1h staleness")
    assert(cell(idA, "2024-03-05 11:00:00") === None, "09:30 obs now 90min stale → null")
    assert(cell(idA, "2024-03-05 12:00:00") === Some(7.0), "11:10 obs within 1h")
    assert(cell(idA, "2024-03-05 13:00:00") === None, "11:10 obs now 110min stale → null")
    assert((0 to 3).forall(h => cell(idB, s"2024-03-05 1$h:00:00") === None),
      "registered series without data emits null grid rows")

    // age tracks the supplying observation
    val age = rows.find(r => r.getLong(0) == idA && r.getTimestamp(1) == ts("2024-03-05 10:00:00")).get
    assert(age.getLong(3) === 30L * 60L * 1000000L, "fill_age_us = 30 minutes")
  }

  test("subscription over the engine store delivers appended measurements") {
    val dir = tmpDir("graft-engine-sub")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    engine.append(Seq(
      Meas(7L, ts("2024-03-01 10:00:00"), 1.0, Flags.CLICK, 1),
      Meas(8L, ts("2024-03-01 10:00:00"), 2.0, Flags.ERROR, 2)))
    val q = engine.subscribe(Seq(7L), 0L, "engine_sub", tmpDir("graft-engine-sub-ckpt"))
    q.processAllAvailable()
    assert(spark.sql("SELECT count(*) FROM engine_sub").head().getLong(0) === 1)
    engine.append(Seq(Meas(7L, ts("2024-03-01 11:00:00"), 3.0, Flags.CLICK, 3)))
    q.processAllAvailable()
    q.stop()
    assert(spark.sql("SELECT count(*) FROM engine_sub").head().getLong(0) === 2)
  }

  test("scheme is an O(1) append-only log: 10^4 names register without quadratic driver time") {
    val dir = tmpDir("graft-scheme-scale")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    val names = (0 until 10000).map(i => s"host$i.cpu.load")
    val t0 = System.nanoTime()
    val ids = engine.addParams(names)
    // a further 100 single-call registrations: each is one tiny append,
    // never a read-modify-write of the 10^4-row catalog
    val extra = (0 until 100).map(i => engine.addParam(s"late$i.mem.free"))
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(ids.size === 10000 && extra.distinct.size === 100)
    assert(engine.ls().count() === 10100)
    // re-registration (same or new engine instance) is idempotent
    assert(engine.addParam("host7.cpu.load") === ids("host7.cpu.load"))
    val engine2 = new GraftEngine(spark, dir, buckets = 2)
    assert(engine2.addParam("host7.cpu.load") === ids("host7.cpu.load"))
    assert(engine2.ls().count() === 10100, "duplicate registration must not grow the dedup view")
    assert(engine2.getParamId("late42.mem.free") === Some(GraftEngine.seriesId("late42.mem.free")))
    assert(engine2.getParamId("never.registered") === None)
    // content-addressed ids are collision-free over this catalog
    assert((ids.values.toSet ++ extra).size === 10100)
    // generous wall-clock bound: the round-2 O(catalog) rewrite was
    // quadratic (~10^8 row-writes for this workload); the log is linear
    assert(elapsedSec < 60.0, s"catalog registration took ${elapsedSec}s")

    // compact() repacks the log (100+ per-call files) into one file
    engine2.compact()
    val schemeFiles = new java.io.File(s"$dir/_scheme").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(schemeFiles === 1, s"scheme log must repack to one file, found $schemeFiles")
    assert(engine2.ls().count() === 10100, "repack must preserve the catalog")
  }

  test("addParam honors ids already in the log, whatever scheme assigned them") {
    val dir = tmpDir("graft-scheme-legacy")
    // a catalog written by an engine version with sequential ids
    spark.createDataFrame(Seq(("legacy.series", 42L))).toDF("name", "series_id")
      .write.parquet(s"$dir/_scheme")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    assert(engine.addParam("legacy.series") === 42L,
      "re-registration must return the LOGGED id, not a conflicting content-addressed one")
    assert(engine.ls().count() === 1, "no duplicate row for the legacy name")
    assert(engine.getParamId("legacy.series") === Some(42L))
    // new names still get content-addressed ids
    assert(engine.addParam("new.series") === GraftEngine.seriesId("new.series"))
  }

  test("per-id eraseOld with a mid-day cutoff erases cutoff-day rows before the exact time") {
    val dir = tmpDir("graft-erase-midday")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    engine.append(Seq(
      Meas(1L, ts("2024-03-03 06:00:00"), 1.0, 1L, 1),
      Meas(1L, ts("2024-03-03 18:00:00"), 2.0, 1L, 2),
      Meas(2L, ts("2024-03-03 06:00:00"), 3.0, 1L, 3)))
    engine.eraseOld(ts("2024-03-03 12:00:00"), Seq(1L))
    val left = engine.merged.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
    assert(left === Set(
      (1L, ts("2024-03-03 18:00:00"), 2.0),
      (2L, ts("2024-03-03 06:00:00"), 3.0)),
      "the 06:00 row of id 1 is gone; id 1 after the cutoff and id 2 survive")
  }

  test("per-id eraseOld rewrites only affected days; other series and newer rows survive") {
    val dir = tmpDir("graft-erase-id")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    engine.append(Seq(
      Meas(1L, ts("2024-03-01 10:00:00"), 1.0, 1L, 1),
      Meas(1L, ts("2024-03-02 10:00:00"), 2.0, 1L, 2),
      Meas(2L, ts("2024-03-01 10:00:00"), 3.0, 1L, 3),
      Meas(2L, ts("2024-03-03 10:00:00"), 4.0, 1L, 4)))
    val touched = engine.eraseOld(ts("2024-03-03 00:00:00"), Seq(1L))
    assert(touched.sorted === Seq("day=2024-03-01", "day=2024-03-02"))
    val left = engine.merged.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
    assert(left === Set(
      (2L, ts("2024-03-01 10:00:00"), 3.0),
      (2L, ts("2024-03-03 10:00:00"), 4.0)))
    // a day emptied by the erase is deleted; a day with survivors stays
    assert(!new java.io.File(s"$dir/data/day=2024-03-02").exists)
    assert(new java.io.File(s"$dir/data/day=2024-03-01").exists)
    // the stats index was refreshed for the rewritten days and stays exact
    assert(engine.minMaxTime(1L) === None)
    val st = engine.stat(2L, ts("2024-03-01 00:00:00"), ts("2024-03-04 00:00:00")).head()
    assert(st.getLong(1) === 2 && st.getDouble(6) === 7.0)
  }

  test("per-id eraseOld prunes via the stats index: days without the ids are byte-identical") {
    val dir = tmpDir("graft-erase-pruned")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    // id 1 lives on five days; id 2 lived exactly one day in the middle
    engine.append((1 to 5).map(d =>
      Meas(1L, ts(f"2024-03-0$d 10:00:00"), d.toDouble, 1L, d.toLong)) :+
      Meas(2L, ts("2024-03-03 11:00:00"), 30.0, 1L, 99))

    def snapshot(day: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$dir/data/day=2024-03-0$day")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val before = Seq("1", "2", "4", "5").map(d => d -> snapshot(d)).toMap

    // erase id 2's whole history: only its one day may be rewritten
    val touched = engine.eraseOld(ts("2024-03-06 00:00:00"), Seq(2L))
    assert(touched === Seq("day=2024-03-03"),
      "index pruning must restrict the rewrite to the days holding the id")
    Seq("1", "2", "4", "5").foreach { d =>
      assert(snapshot(d) === before(d), s"day 2024-03-0$d files must be byte-identical")
    }
    // semantics unchanged: id 2 gone, id 1 intact, index stays exact
    assert(engine.minMaxTime(2L) === None)
    val st = engine.stat(1L, ts("2024-03-01 00:00:00"), ts("2024-03-06 00:00:00")).head()
    assert(st.getLong(1) === 5 && st.getDouble(6) === 15.0)

    // a second erase for the same id finds no erasable rows: zero days touched
    assert(engine.eraseOld(ts("2024-03-06 00:00:00"), Seq(2L)) === Seq.empty)

    // min_time refinement: a mid-day cutoff BEFORE the id's first row on
    // the cutoff day touches nothing (no erasable row exists)
    assert(engine.eraseOld(ts("2024-03-05 09:00:00"), Seq(1L)).sorted
      === Seq("day=2024-03-01", "day=2024-03-02", "day=2024-03-03", "day=2024-03-04"),
      "cutoff-day partition skipped when the id's min_time there is after the cutoff")
  }

  test("index-served readInterval ≡ scan path: resident-day pruning, flags, rewrites") {
    val dir = tmpDir("graft-ri-indexed")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    engine.append(Seq(
      Meas(1L, ts("2024-03-01 10:00:00"), 1.0, Flags.CLICK, 1),
      Meas(1L, ts("2024-03-05 10:00:00"), 2.0, Flags.ERROR, 2),
      Meas(2L, ts("2024-03-03 10:00:00"), 3.0, Flags.CLICK, 3)))
    engine.append(Seq( // fresher rewrite of the day-5 key
      Meas(1L, ts("2024-03-05 10:00:00"), 20.0, Flags.ERROR, 4)))

    def both(q: QueryInterval): (Seq[Seq[Any]], Seq[Seq[Any]]) =
      (engine.readInterval(q).collect().toSeq.map(_.toSeq),
        engine.readIntervalScan(q).collect().toSeq.map(_.toSeq))

    // wide interval, one sparse id: indexed ≡ scan, rewrite wins
    val qWide = QueryInterval(Seq(1L), 0L, ts("2024-03-01 00:00:00"), ts("2024-03-10 00:00:00"))
    val (iW, sW) = both(qWide)
    assert(iW === sW && iW.size === 2)
    assert(iW.last(2) === 20.0, "freshest seq wins across the indexed day scan")
    // flag filtering applies after the day pruning
    val (iF, sF) = both(qWide.copy(flag = Flags.ERROR))
    assert(iF === sF && iF.size === 1)
    // interval that misses the id's resident days entirely: empty, right schema
    val qMiss = QueryInterval(Seq(1L), 0L, ts("2024-03-02 00:00:00"), ts("2024-03-04 00:00:00"))
    val (iM, sM) = both(qMiss)
    assert(iM === sM && iM.isEmpty)
    assert(engine.intervalReader(qMiss).toList === Nil, "cursor path survives the empty indexed read")
    // a staled index falls back to the scan path
    graft.sources.TsdbStorage.markStatsOutOfSync(spark, s"$dir/_stats")
    assert(engine.readInterval(qWide).collect().toSeq.map(_.toSeq) === sW)
  }

  test("index-served readTimePoint ≡ scan path: boundary days, NO_DATA, rewrites") {
    val dir = tmpDir("graft-tp-indexed")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    engine.append(Seq(
      Meas(1L, ts("2024-03-01 10:00:00"), 1.0, 1L, 1),
      Meas(1L, ts("2024-03-03 09:00:00"), 2.0, 1L, 2),
      Meas(1L, ts("2024-03-03 18:00:00"), 3.0, 1L, 3),
      Meas(2L, ts("2024-03-01 08:00:00"), 9.0, 1L, 4)))
    engine.append(Seq( // fresher-seq rewrite of an existing key
      Meas(1L, ts("2024-03-03 09:00:00"), 20.0, 1L, 5)))

    def both(q: QueryTimePoint): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
      val indexed = engine.readTimePoint(q).collect().toSeq.map(_.toSeq)
      val scan = engine.readTimePointScan(q).collect().toSeq.map(_.toSeq)
      (indexed, scan)
    }
    // mid-day timepoint BEFORE the cutoff day's first row: the index
    // must fall back to the previous resident day, not return NO_DATA
    val qEarly = QueryTimePoint(Seq(1L, 2L, 999L), 0L, ts("2024-03-03 08:00:00"))
    val (iEarly, sEarly) = both(qEarly)
    assert(iEarly === sEarly)
    assert(iEarly.find(_.head == 1L).get(2) === 1.0, "day-3 rows are all after 08:00 → day-1 row answers")
    assert(iEarly.find(_.head == 999L).get(3) === Meas.NO_DATA)
    // mid-day timepoint between the cutoff day's rows: rewrite wins
    val qMid = QueryTimePoint(Seq.empty, 0L, ts("2024-03-03 12:00:00"))
    val (iMid, sMid) = both(qMid)
    assert(iMid === sMid)
    assert(iMid.find(_.head == 1L).get(2) === 20.0, "freshest seq at 09:00 wins on the scanned day")
    // timepoint before ANY data: every requested id answers NO_DATA
    val qNone = QueryTimePoint(Seq(1L, 2L), 0L, ts("2024-02-01 00:00:00"))
    val (iNone, sNone) = both(qNone)
    assert(iNone === sNone && iNone.forall(_(3) == Meas.NO_DATA))
    // a staled index forces the scan path (same result, no index read)
    graft.sources.TsdbStorage.markStatsOutOfSync(spark, s"$dir/_stats")
    assert(engine.readTimePoint(qMid).collect().toSeq.map(_.toSeq) === sMid)
  }

  test("per-id eraseOld falls back to the full day list when the index is unusable") {
    val dir = tmpDir("graft-erase-fallback")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    engine.append(Seq(
      Meas(1L, ts("2024-03-01 10:00:00"), 1.0, 1L, 1),
      Meas(1L, ts("2024-03-02 10:00:00"), 2.0, 1L, 2),
      Meas(2L, ts("2024-03-02 11:00:00"), 3.0, 1L, 3)))
    // simulate a crash-staled index: marker gone ⇒ index unusable
    graft.sources.TsdbStorage.markStatsOutOfSync(spark, s"$dir/_stats")
    val touched = engine.eraseOld(ts("2024-03-03 00:00:00"), Seq(1L))
    assert(touched.sorted === Seq("day=2024-03-01", "day=2024-03-02"),
      "without a usable index every pre-cutoff day is rewritten")
    val left = engine.merged.collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(left === Set((2L, 3.0)))
  }

  test("fsck probes artifacts: corrupt stats file uncertifies the index, scheme is never deleted") {
    val dir = tmpDir("graft-fsck-artifacts")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    engine.addParam("fsck.series")
    engine.append(Seq(
      Meas(1L, ts("2024-03-01 10:00:00"), 1.0, 1L, 1),
      Meas(1L, ts("2024-03-01 11:00:00"), 2.0, 1L, 2)))
    assert(engine.fsck() === Seq.empty)

    def plantBogus(rel: String): java.io.File = {
      val f = new java.io.File(s"$dir/$rel/part-corrupt.parquet")
      java.nio.file.Files.write(f.toPath, "not parquet at all".getBytes)
      f
    }
    // corrupt stats-index file: fsck must report it AND uncertify the
    // index even WITHOUT repair — stat() then serves from the scan path
    // instead of throwing mid-query
    plantBogus("_stats/day=2024-03-01")
    val bad1 = engine.fsck(repair = false)
    assert(bad1.exists(_.contains("_stats")) && !bad1.exists(_.contains("_scheme")))
    assert(!graft.sources.TsdbStorage.statsUsable(spark, s"$dir/_stats"))
    val st = engine.stat(1L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00")).head()
    assert(st.getLong(1) === 2 && st.getDouble(6) === 3.0, "scan fallback answers correctly")
    // repair drops the bad index file; reindex() rebuilds and recertifies
    assert(engine.fsck(repair = true).exists(_.contains("_stats")))
    engine.reindex()
    assert(graft.sources.TsdbStorage.statsUsable(spark, s"$dir/_stats"))

    // corrupt the scheme log: reported but NEVER deleted, repair or not
    val schemeFile = plantBogus("_scheme")
    val bad2 = engine.fsck(repair = true)
    assert(bad2.exists(_.contains("_scheme")))
    assert(schemeFile.exists, "the scheme log is the only copy of legacy id assignments")
  }

  test("compactDays merges duplicates and coalesces files for ONLY the chosen days") {
    val dir = tmpDir("graft-compact-days")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    // five appends: day 1 accumulates five files rewriting ONE key, day 2
    // accumulates five files of distinct keys
    (1 to 5).foreach { k =>
      engine.append(Seq(
        Meas(1L, ts("2024-03-01 10:00:00"), k.toDouble, 1L, k.toLong),
        Meas(1L, ts(f"2024-03-02 0$k%d:00:00"), k.toDouble, 1L, (10 + k).toLong)))
    }
    def files(day: String) = new java.io.File(s"$dir/data/day=$day").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> (f.length, f.lastModified)).toMap
    assert(files("2024-03-01").size >= 5, "append accumulation is the fixture premise")
    val day2Before = files("2024-03-02")
    assert(engine.fragmentedDays(maxFiles = 4)
      === Seq(java.sql.Date.valueOf("2024-03-01"), java.sql.Date.valueOf("2024-03-02")))

    val before = engine.merged.collect().map(_.toSeq).toSet
    engine.compactDays(Seq(java.sql.Date.valueOf("2024-03-01")))
    assert(engine.merged.collect().map(_.toSeq).toSet === before, "merge-on-read view unchanged")
    assert(files("2024-03-01").size <= 2, "chosen day coalesced to ≤ buckets files")
    assert(files("2024-03-02") === day2Before, "unchosen day byte-identical")
    assert(engine.fragmentedDays(maxFiles = 4) === Seq(java.sql.Date.valueOf("2024-03-02")))
    // stats index stays certified and exact over the compacted day
    val st = engine.stat(1L, ts("2024-03-01 00:00:00"), ts("2024-03-01 23:00:00")).head()
    assert(st.getLong(1) === 1 && st.getDouble(6) === 5.0, "the freshest-seq rewrite is the one surviving row")
  }

  test("MEMORY strategy: hot-level rows serve reads before any parquet exists, flush outranks") {
    val dir = tmpDir("graft-hot")
    val engine = new GraftEngine(spark, dir, buckets = 2, hotCapacity = 1000L)

    // append lands in the memory level only — no data directory yet
    engine.append(Seq(
      Meas(1L, ts("2024-03-01 10:00:00"), 1.0, Flags.CLICK, 1),
      Meas(1L, ts("2024-03-01 11:00:00"), 2.0, Flags.CLICK, 2)))
    assert(engine.hotSize === 2)
    assert(!new java.io.File(s"$dir/data").exists, "hot rows must not touch parquet")

    // every read path sees the hot level
    assert(engine.currentValue(Seq(1L), 0L).head().getDouble(2) === 2.0)
    assert(engine.readInterval(
      QueryInterval(Seq(1L), 0L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00"))).count() === 2)
    val st = engine.stat(1L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00")).head()
    assert(st.getLong(1) === 2 && st.getDouble(6) === 3.0)
    val Some((mn, mx)) = engine.minMaxTime(1L)
    assert(mn === ts("2024-03-01 10:00:00") && mx === ts("2024-03-01 11:00:00"))

    // hot rewrite of a stored key: freshness merge spans levels
    engine.flush()
    assert(engine.hotSize === 0)
    assert(new java.io.File(s"$dir/data").exists, "flush drops the level to parquet")
    engine.append(Seq(Meas(1L, ts("2024-03-01 11:00:00"), 20.0, Flags.CLICK, 3)))
    assert(engine.hotSize === 1, "post-flush append buffers again")
    assert(engine.currentValue(Seq(1L), 0L).head().getDouble(2) === 20.0,
      "hot rewrite outranks the flushed row")

    // capacity overflow auto-drops the level
    val bulk = (0 until 1000).map(i => Meas(2L, ts("2024-03-01 10:00:00"), i.toDouble, 1L, 100L + i))
    engine.append(bulk)
    assert(engine.hotSize === 0, "exceeding hotCapacity flushes")
    assert(engine.currentValue(Seq(1L), 0L).head().getDouble(2) === 20.0,
      "flushed rewrite still outranks the original by seq")
    // after flush the stat-index fast path serves again, and agrees
    val st2 = engine.stat(2L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00")).head()
    assert(st2.getLong(1) === 1 && st2.getDouble(6) === 999.0, "merge-on-read collapsed the bulk dups")
  }

  test("streaming ingest lands in the clustered layout") {
    val src = tmpDir("graft-ingest-src")
    val engine = new GraftEngine(spark, tmpDir("graft-ingest-store"), buckets = 2)
    EventsSource.meas(spark, sfDir).limit(100).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(Meas.schema).parquet(src)
    val q = engine.appendStream(stream, tmpDir("graft-ingest-ckpt"))
    q.processAllAvailable()
    q.stop()
    assert(engine.merged.count() === 100)
  }

  test("appendStream replay: an already-applied (appId, batchId) re-writes nothing") {
    import spark.implicits._
    val dir = tmpDir("graft-ingest-replay")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    def dataFiles(): Seq[String] = {
      val root = new java.io.File(s"$dir/data")
      if (!root.exists) Seq.empty
      else root.listFiles.filter(_.isDirectory).flatMap(_.listFiles)
        .map(f => s"${f.getName}:${f.length}").toSeq.sorted
    }
    def statFiles(): Seq[String] = {
      val root = new java.io.File(s"$dir/_stats")
      if (!root.exists) Seq.empty
      else root.listFiles.filter(_.isDirectory).flatMap(_.listFiles)
        .map(f => s"${f.getParentFile.getName}/${f.getName}:${f.length}").toSeq.sorted
    }
    val batch0 = spark.createDataset(Seq(
      Meas(1L, ts("2024-03-01 10:00:00"), 1.0, Flags.CLICK, 1),
      Meas(2L, ts("2024-03-01 11:00:00"), 2.0, Flags.CLICK, 2))).toDF()
    engine.appendOnce(batch0, "ckpt-A", 0L)
    val files = dataFiles(); val stats = statFiles()
    val rows = engine.merged.collect().map(_.toSeq).toSet
    // foreachBatch replay after a crash-restart: same appId, same batchId
    engine.appendOnce(batch0, "ckpt-A", 0L)
    assert(dataFiles() === files, "a replayed micro-batch must not write parquet")
    assert(statFiles() === stats, "…nor refresh the stats index")
    assert(engine.merged.collect().map(_.toSeq).toSet === rows)
    // the NEXT batch applies normally
    engine.appendOnce(spark.createDataset(Seq(
      Meas(3L, ts("2024-03-01 12:00:00"), 3.0, Flags.CLICK, 3))).toDF(), "ckpt-A", 1L)
    assert(engine.merged.count() === 3L)
    // a DIFFERENT stream legitimately restarting batch numbering at 0
    engine.appendOnce(spark.createDataset(Seq(
      Meas(4L, ts("2024-03-01 13:00:00"), 4.0, Flags.CLICK, 4))).toDF(), "ckpt-B", 0L)
    assert(engine.merged.count() === 4L, "a fresh appId is not a replay")
    // INTERLEAVED streams: stream A's replay arriving AFTER stream B's
    // append must still be detected (the cursor is a per-app map, not
    // last-writer-wins — a single cursor would re-apply here)
    val filesAfterB = dataFiles()
    engine.appendOnce(spark.createDataset(Seq(
      Meas(3L, ts("2024-03-01 12:00:00"), 3.0, Flags.CLICK, 3))).toDF(), "ckpt-A", 1L)
    assert(dataFiles() === filesAfterB,
      "stream A's replayed batch after stream B's append writes nothing")
    assert(engine.merged.count() === 4L)
    // the real streaming path drives the same cursor
    val src = tmpDir("graft-ingest-replay-src")
    spark.createDataset(Seq(Meas(5L, ts("2024-03-01 14:00:00"), 5.0, Flags.CLICK, 5)))
      .toDF().write.mode("append").parquet(src)
    val q = engine.appendStream(
      spark.readStream.schema(Meas.schema).parquet(src), tmpDir("graft-ingest-replay-ckpt"))
    try q.processAllAvailable() finally q.stop()
    assert(engine.merged.count() === 5L)
  }

  test("maintain(): one call repairs corruption, compacts fragmented days, recertifies the index") {
    val dir = tmpDir("graft-maintain")
    val engine = new GraftEngine(spark, dir, buckets = 2)
    // fragment one day with many small appends
    for (i <- 0 until 6)
      engine.append(Seq(Meas(1L, ts(f"2024-03-01 10:0$i:00"), i.toDouble, 1L, i.toLong)))
    engine.append(Seq(Meas(1L, ts("2024-03-02 10:00:00"), 9.0, 1L, 10L)))
    val before = engine.merged.collect().map(_.toSeq).toSet
    // plant a corrupt file AND uncertify the stats index (crash analog)
    val day = new java.io.File(s"$dir/data/day=2024-03-01")
    java.nio.file.Files.write(
      new java.io.File(day, "part-corrupt.parquet").toPath, "not parquet".getBytes)
    graft.sources.TsdbStorage.markStatsOutOfSync(spark, s"$dir/_stats")

    val report = engine.maintain(maxFilesPerDay = 3)
    assert(report.corrupt.exists(_.contains("part-corrupt")), "probe found the planted file")
    assert(report.compactedDays === Seq(java.sql.Date.valueOf("2024-03-01")),
      "only the fragmented day was compacted")
    assert(report.reindexed, "the uncertified index was rebuilt")
    assert(engine.merged.collect().map(_.toSeq).toSet === before, "data unchanged")
    assert(graft.sources.TsdbStorage.statsUsable(spark, s"$dir/_stats"),
      "index-served paths armed again")
    assert(new java.io.File(s"$dir/data/day=2024-03-01").listFiles()
      .count(_.getName.endsWith(".parquet")) <= 3, "fragmentation paid down")
    // idempotent: a clean store reports nothing to do
    val again = engine.maintain(maxFilesPerDay = 3)
    assert(again === graft.engine.MaintenanceReport(Seq.empty, Seq.empty, false))
    // sharded fan-out merges per-shard reports
    val sh = new graft.engine.ShardedEngine(spark, Seq(tmpDir("mt-s0"), tmpDir("mt-s1")), buckets = 2)
    sh.append(Seq(Meas(1L, ts("2024-03-01 10:00:00"), 1.0, 1L, 1L),
      Meas(2L, ts("2024-03-01 10:00:00"), 2.0, 1L, 2L)))
    assert(sh.maintain() === graft.engine.MaintenanceReport(Seq.empty, Seq.empty, false))
  }

  test("maintain() crons the artifact indexes: corrupt → uncertified → rebuilt, fragmentation compacted") {
    import graft.extensions.{AnnIndex, TextIndex}
    val engine = new GraftEngine(spark, tmpDir("graft-maintain-art"), buckets = 2)
    engine.append(Seq(Meas(1L, ts("2024-03-01 10:00:00"), 1.0, 1L, 1L)))
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val annDir = tmpDir("graft-maintain-ann")
    val textDir = tmpDir("graft-maintain-text")
    AnnIndex.build(spark, raw, annDir)
    TextIndex.build(spark, docs, textDir)
    val servedBefore = {
      spark.conf.set(AnnIndex.ConfKey, annDir)
      try SparkEntry.queries("sim_ann")(spark, sfDir).collect().toSeq.map(_.toSeq)
      finally spark.conf.unset(AnnIndex.ConfKey)
    }
    // corrupt one codes file — fsck must uncertify, maintain must rebuild
    java.nio.file.Files.write(
      new java.io.File(s"$annDir/codes/part-corrupt.parquet").toPath, "junk".getBytes)

    val report = engine.maintain(
      annIndex = Some((annDir, raw)), textIndex = Some((textDir, docs)))
    assert(report.artifacts.map(_.dir) === Seq(annDir, textDir))
    val annR = report.artifacts.head
    assert(annR.corrupt.exists(_.contains("part-corrupt")), "probe found the planted file")
    assert(annR.rebuilt, "the uncertified index was rebuilt from its corpus")
    assert(AnnIndex.usable(spark, annDir), "…and re-certified in the same call")
    assert(AnnIndex.readCodes(spark, annDir).count() === raw.count())
    // the repaired index serves identical results
    spark.conf.set(AnnIndex.ConfKey, annDir)
    try assert(SparkEntry.queries("sim_ann")(spark, sfDir).collect().toSeq.map(_.toSeq)
      === servedBefore)
    finally spark.conf.unset(AnnIndex.ConfKey)
    assert(TextIndex.usable(spark, textDir))
    // idempotent: the second pass finds nothing to probe, rebuild, or compact
    val again = engine.maintain(
      annIndex = Some((annDir, raw)), textIndex = Some((textDir, docs)))
    assert(again.artifacts.forall(a => a.corrupt.isEmpty && !a.rebuilt && !a.compacted),
      s"second maintain must be a no-op, got ${again.artifacts}")
    // a corpus mutated in place (ids unchanged): the maintenance-time
    // fingerprint audit uncertifies, and maintain rebuilds against the
    // corpus it was handed — the backstop for deployments that opt the
    // per-query content check out
    val mutated = raw.withColumn("embedding",
      expr("transform(embedding, x -> CAST(x + 1.0f AS FLOAT))"))
    val r3 = engine.maintain(annIndex = Some((annDir, mutated)))
    assert(r3.artifacts.head.rebuilt, "fingerprint audit caught the in-place mutation")
    assert(AnnIndex.usable(spark, annDir))
    spark.conf.set(AnnIndex.ConfKey, annDir)
    try assert(AnnIndex.resolveFor(spark, mutated) === Some(annDir),
      "the rebuilt index serves the corpus it was rebuilt from")
    finally spark.conf.unset(AnnIndex.ConfKey)
  }
}
