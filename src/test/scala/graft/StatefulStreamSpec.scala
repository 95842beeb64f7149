package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.{Flags, Meas}
import graft.streaming.StatefulStreams

class StatefulStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  // coalesce(1): each logical test batch must land as ONE file. A
  // multi-file append can race the FileStreamSource listing (commit
  // renames are per-file), splitting the batch across two triggers —
  // under full-suite load this flipped the sessionizer case (the 12:05
  // extender landing a trigger AFTER the 14:00 closer). One file is
  // atomic w.r.t. listing: a trigger sees the whole batch or none.
  private def write(dir: String, ms: Seq[Meas]): Unit =
    spark.createDataset(ms).toDF().coalesce(1).write.mode("append").parquet(dir)

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

  test("streaming as-of enrich: batch-local event-time order, cross-batch state, stale refs ignored") {
    import graft.streaming.StatefulStreams.TaggedRow
    val dir = tmpDir("graft-asof-src")
    val ckpt = tmpDir("graft-asof-ckpt")
    def writeTagged(rows: Seq[TaggedRow]): Unit = // one file = one trigger (see write)
      spark.createDataset(rows).toDF().coalesce(1).write.mode("append").parquet(dir)

    // batch 1: a probe BEFORE the batch's ref gets no enrichment (rows
    // are time-ordered within a batch); a probe after it gets enriched
    writeTagged(Seq(
      TaggedRow(1L, ts("2024-03-01 09:00:00"), 1L, 1.0, is_probe = true),
      TaggedRow(1L, ts("2024-03-01 10:00:00"), 2L, 10.0, is_probe = false),
      TaggedRow(1L, ts("2024-03-01 10:30:00"), 3L, 2.0, is_probe = true)))
    val stream = spark.readStream.schema(spark.createDataset(Seq.empty[TaggedRow]).schema)
      .parquet(dir).as[TaggedRow]
    val q = StatefulStreams.asofEnrich(stream).writeStream
      .format("memory").queryName("asof_enrich")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()

    def outBySeq(): Map[Long, Option[Double]] =
      spark.sql("SELECT seq, ref_v FROM asof_enrich").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap

    val o1 = outBySeq()
    assert(o1(1L) === None, "probe before the batch's only reference must stay unenriched")
    assert(o1(3L) === Some(10.0), "probe after the reference picks it up")

    // batch 2: state carries the 10:00 ref across batches; a STALE ref
    // (09:30) must not displace it; a fresher ref then takes over
    writeTagged(Seq(
      TaggedRow(1L, ts("2024-03-01 09:30:00"), 4L, 99.0, is_probe = false),
      TaggedRow(1L, ts("2024-03-01 11:00:00"), 5L, 3.0, is_probe = true),
      TaggedRow(1L, ts("2024-03-01 11:30:00"), 6L, 20.0, is_probe = false),
      TaggedRow(1L, ts("2024-03-01 11:45:00"), 7L, 4.0, is_probe = true)))
    q.processAllAvailable()
    q.stop()

    val o2 = outBySeq()
    assert(o2(5L) === Some(10.0), "cross-batch state enriches; the stale 09:30 ref is ignored")
    assert(o2(7L) === Some(20.0), "fresher in-batch reference takes over")
  }

  test("streaming sessionizer closes sessions on gap, carries open sessions across batches") {
    val dir = tmpDir("graft-sess-src")
    val ckpt = tmpDir("graft-sess-ckpt")

    // batch 1: one completed session (10:00–10:10) then a gap > 30 min —
    // the 12:00 row opens a new session, closing the first
    write(dir, Seq(
      Meas(7L, ts("2024-03-01 10:00:00"), 1.0, Flags.CLICK, 1),
      Meas(7L, ts("2024-03-01 10:10:00"), 2.0, Flags.CLICK, 2),
      Meas(7L, ts("2024-03-01 12:00:00"), 3.0, Flags.CLICK, 3)))
    val q = StatefulStreams.startSessions(spark, dir, gapMinutes = 30, "state_sess", ckpt)
    q.processAllAvailable()

    def sessions(): Seq[(Timestamp, Timestamp, Long)] =
      spark.sql("SELECT session_start, session_end, n_meas FROM state_sess WHERE id = 7 ORDER BY session_start")
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSeq

    assert(sessions() === Seq((ts("2024-03-01 10:00:00"), ts("2024-03-01 10:10:00"), 2L)),
      "only the CLOSED session is emitted; 12:00 stays open in state")

    // batch 2: 12:05 extends the open session ACROSS the batch boundary;
    // a 10:05 straggler belongs to the already-CLOSED first session and
    // must be dropped, not folded into the open one; 14:00 closes it
    write(dir, Seq(
      Meas(7L, ts("2024-03-01 12:05:00"), 4.0, Flags.CLICK, 4),
      Meas(7L, ts("2024-03-01 10:05:00"), 9.0, Flags.CLICK, 6),
      Meas(7L, ts("2024-03-01 14:00:00"), 5.0, Flags.CLICK, 5)))
    q.processAllAvailable()
    q.stop()

    assert(sessions() === Seq(
      (ts("2024-03-01 10:00:00"), ts("2024-03-01 10:10:00"), 2L),
      (ts("2024-03-01 12:00:00"), ts("2024-03-01 12:05:00"), 2L)),
      "open session extended across batches then closed; the pre-start " +
        "straggler neither inflates n_meas nor reopens the closed session")
  }

  test("streaming z-score is bit-identical to the batch operator on in-order streams") {
    val dir = tmpDir("graft-z-src")
    val ckpt = tmpDir("graft-z-ckpt")
    // 3 series × 20 in-order samples, irregular values (one flat series
    // exercising the sd=0 guard), split across two micro-batches so the
    // trailing window spans the batch boundary
    def m(id: Long, i: Int): Meas = {
      val v = if (id == 3L) 5.0 else (i * 2654435761L % 97L) / 7.0 + (if (i == 15) 40.0 else 0.0)
      Meas(id, ts(f"2024-03-01 ${8 + i / 10}%02d:${i % 10 * 5}%02d:00"), v, Flags.CLICK, i.toLong)
    }
    val all = for (id <- 1L to 3L; i <- 0 until 20) yield m(id, i)
    write(dir, all.filter(_.seq < 12))
    val q = StatefulStreams.startZscores(spark, dir, "state_z", ckpt)
    q.processAllAvailable()
    write(dir, all.filter(_.seq >= 12))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql("SELECT * FROM state_z").collect()
      .map(_.toSeq).sortBy(r => (r(0).asInstanceOf[Long], r(2).asInstanceOf[Long]))
    val batch = graft.operators.CoreQueries.zscoreBatch(spark.createDataset(all).toDF())
      .collect().map(_.toSeq).sortBy(r => (r(0).asInstanceOf[Long], r(2).asInstanceOf[Long]))
    assert(streamed.length === 3 * 12, "full preceding windows only: 20 - 8 per series")
    assert(streamed === batch,
      "streamed scores (incl. m6/sd6/z at the batch boundary and the flat-series guard) " +
        "must equal the batch window operator bit-for-bit")
    // the planted spike is flagged
    assert(streamed.exists(r => r(6) === 1L), "the i=15 spike crosses |z| > 3")
  }

  test("streaming funnel emits exactly the batch query's conversions, incrementally") {
    import graft.streaming.StatefulStreams.FunnelEvent
    val dir = tmpDir("graft-funnel-src")
    val ckpt = tmpDir("graft-funnel-ckpt")
    val horizonUs = 24L * 3600 * 1000000
    def ev(uid: Long, t: String, kind: String, id: Long) = FunnelEvent(uid, ts(t), kind, id)
    // u1: converts in one batch; u2: click in batch 1, purchase in batch 2
    // (window crosses the boundary); u3: purchase outside the horizon;
    // u4: purchase with no click; u5: TWO in-window purchases (only the
    // first emits); u6: purchase BEFORE its click (not qualifying)
    val batch1 = Seq(
      ev(1L, "2024-03-01 10:00:00", "click", 1), ev(1L, "2024-03-01 12:00:00", "purchase", 2),
      ev(2L, "2024-03-01 09:00:00", "click", 3),
      ev(3L, "2024-03-01 08:00:00", "click", 4),
      ev(4L, "2024-03-01 10:30:00", "purchase", 5),
      ev(5L, "2024-03-01 11:00:00", "click", 6),
      ev(6L, "2024-03-01 07:00:00", "purchase", 7), ev(6L, "2024-03-01 07:30:00", "click", 8),
      // u7: purchase at the SAME instant as the click, with a LOWER
      // event_id — the batch predicate (ts >= first_click) counts it, so
      // the stream's intra-batch sort must process the click first
      ev(7L, "2024-03-01 09:30:00", "purchase", 13), ev(7L, "2024-03-01 09:30:00", "click", 14))
    val batch2 = Seq(
      ev(2L, "2024-03-02 08:59:00", "purchase", 9), // 23h59m later: in window
      ev(3L, "2024-03-02 08:30:00", "purchase", 10), // 24h30m later: outside
      ev(5L, "2024-03-01 11:05:00", "purchase", 11),
      ev(5L, "2024-03-01 11:10:00", "purchase", 12)) // second purchase: no emit
    def write(b: Seq[FunnelEvent]): Unit =
      spark.createDataset(b).toDF().coalesce(1).write.mode("append").parquet(dir)
    write(batch1)
    val src = spark.readStream.schema(spark.createDataset(batch1).toDF().schema)
      .parquet(dir).as[FunnelEvent]
    val q = graft.streaming.StatefulStreams.funnel(src, horizonUs).writeStream
      .format("memory").queryName("state_funnel").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      write(batch2)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM state_funnel").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .sortBy(_._1)
    // the batch report's converted=1 rows over the same data
    val all = spark.createDataset(batch1 ++ batch2)
    val clicks = all.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min("ts").as("first_click"))
    val qualifies = col("ts") >= col("first_click") &&
      unix_micros(col("ts")) - unix_micros(col("first_click")) <= lit(horizonUs)
    val batchConv = clicks.join(all.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts")), Seq("user_id"), "left")
      .groupBy("user_id", "first_click")
      .agg(min(when(qualifies, col("ts"))).as("first_purchase"))
      .filter(col("first_purchase").isNotNull)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        (r.getTimestamp(2).getTime - r.getTimestamp(1).getTime) * 1000L))
      .sortBy(_._1)
    assert(streamed === batchConv,
      "streamed conversions (incl. the cross-batch window) ≡ batch converted rows")
    assert(streamed.map(_._1).toSet === Set(1L, 2L, 5L, 7L),
      "outside-horizon, clickless, and pre-click purchases never convert; " +
        "the same-instant purchase (u7) does")
    assert(streamed.find(_._1 == 7L).get._4 === 0L, "zero-delay conversion at the tie")
  }

  test("engine facade: subscribeAnomalies scores the durable append stream") {
    val eng = new graft.engine.GraftEngine(spark, tmpDir("graft-z-eng"), buckets = 2)
    val ms = (0 until 20).map { i =>
      Meas(5L, ts(f"2024-03-01 ${8 + i / 10}%02d:${i % 10 * 5}%02d:00"),
        if (i == 15) 99.0 else (i * 37 % 11).toDouble, Flags.CLICK, i.toLong)
    }
    eng.append(ms)
    val q = eng.subscribeAnomalies("eng_z", tmpDir("graft-z-eng-ckpt"))
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql("SELECT * FROM eng_z").collect()
      .map(_.toSeq).sortBy(_(2).asInstanceOf[Long])
    val batch = graft.operators.CoreQueries.zscoreBatch(spark.createDataset(ms).toDF())
      .collect().map(_.toSeq).sortBy(_(2).asInstanceOf[Long])
    assert(streamed === batch, "facade stream over the clustered store ≡ batch operator")
    assert(streamed.exists(r => r(6) === 1L), "the spike is flagged through the facade")
  }
}
