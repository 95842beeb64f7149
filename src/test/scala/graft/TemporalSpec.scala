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

  test("interpCore: neighbor selection — exact hit served by prev, strict-after next, edge nulls") {
    val obs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 12:00:00"), 2L, 30.0),
    ).toDF("k", "t", "seq", "v")
    val grid = Seq(
      (1L, ts("2024-01-01 09:00:00")), // before first obs → pt null
      (1L, ts("2024-01-01 10:00:00")), // exact hit → pt == t, pv = 10
      (1L, ts("2024-01-01 11:30:00")), // between → pv=10, nv=30
      (1L, ts("2024-01-01 13:00:00")), // after last obs → nt null
    ).toDF("k", "t")

    val out = TemporalQueries.interpCore(obs, grid).collect()
      .map(r => r.getTimestamp(1) ->
        ((Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))).toMap
    assert(out(ts("2024-01-01 09:00:00"))._2 === None, "no observation before the first grid point")
    assert(out(ts("2024-01-01 09:00:00"))._3 === Some(10.0), "next obs visible from before the range")
    assert(out(ts("2024-01-01 10:00:00"))._2 === Some(ts("2024-01-01 10:00:00")),
      "an observation AT the grid instant is the prev neighbor (exact hit)")
    assert(out(ts("2024-01-01 11:30:00"))._1 === Some(10.0))
    assert(out(ts("2024-01-01 11:30:00"))._3 === Some(30.0))
    assert(out(ts("2024-01-01 13:00:00"))._3 === None, "no observation after the last grid point")
  }

  test("interpCore: equal-ts observations resolve prev to greatest seq; linear midpoint is exact") {
    val obs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 99.0), // superseded at equal ts
      (1L, ts("2024-01-01 10:00:00"), 2L, 10.0), // freshest at 10:00 — must win
      (1L, ts("2024-01-01 12:00:00"), 3L, 30.0),
    ).toDF("k", "t", "seq", "v")
    val grid = Seq((1L, ts("2024-01-01 11:00:00"))).toDF("k", "t")
    val r = TemporalQueries.interpCore(obs, grid).collect().head
    assert(r.getDouble(2) === 10.0, "prev value must be the greatest-seq observation at its ts")
    // the seriesInterp formula on these neighbors: 10 + (30-10) * (3600/7200) = 20 exactly
    val v = r.getDouble(2) + (r.getDouble(4) - r.getDouble(2)) *
      ((r.getTimestamp(1).getTime - r.getTimestamp(3).getTime).toDouble /
        (r.getTimestamp(5).getTime - r.getTimestamp(3).getTime).toDouble)
    assert(v === 20.0)
  }

  test("asofForwardCore: at-or-after is inclusive, equal-ts refs resolve to greatest seq, trailing probes get nulls") {
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 1.0), // exactly AT two refs → inclusive, max seq wins
      (1L, ts("2024-01-01 10:30:00"), 101L, 2.0), // between refs → next ref at 11:00
      (1L, ts("2024-01-01 12:00:00"), 102L, 3.0), // after every ref → nulls
    ).toDF("k", "t", "seq", "v")
    val refs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 10:00:00"), 2L, 20.0), // freshest at 10:00 — must win
      (1L, ts("2024-01-01 11:00:00"), 3L, 30.0),
    ).toDF("k", "t", "seq", "v")
    val r = TemporalQueries.asofForwardCore(probes, refs)
      .collect().map(x => x.getLong(2) -> (Option(x.get(4)), Option(x.get(5)))).toMap
    assert(r(100L)._1.contains(ts("2024-01-01 10:00:00")) && r(100L)._2.contains(20.0),
      "at-or-after includes equal ts; equal-ts ties resolve to greatest seq")
    assert(r(101L)._2.contains(30.0), "between refs → earliest later ref")
    assert(r(102L)._1.isEmpty && r(102L)._2.isEmpty, "no later ref → nulls")
  }

  test("range_join: bucket decomposition ≡ brute-force theta join; containment exact; ≤1 match per probe") {
    import org.apache.spark.sql.functions._
    val res = TemporalQueries.rangeJoin.build(spark, sfDir).cache()
    // containment holds row-for-row
    assert(res.filter(!col("purchase_ts").between(col("session_start"), col("session_end"))).count() === 0L)
    // gap-disjoint sessions ⇒ at most one interval per purchase
    val dup = res.groupBy("event_id").count().filter(col("count") > 1).count()
    assert(dup === 0L)
    // brute-force theta join (equi on user only, containment filter) agrees exactly
    val ev = graft.sources.EventsSource.events(spark, sfDir)
    val sess = res.select("user_id", "session_id", "session_start", "session_end").distinct()
    val brute = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
      .join(sess, Seq("user_id"))
      .filter(col("ts").between(col("session_start"), col("session_end")))
      .select("event_id", "session_id")
    val mine = res.select("event_id", "session_id")
    assert(mine.exceptAll(brute).count() === 0L && brute.exceptAll(mine).count() === 0L)
    res.unpersist()
  }

  test("series_acf: alternating series has acf(1) = acf(3) = -1 and acf(2) = +1; constant series is null") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmpDir("graft-acf")
    // user 1 'click' series alternates 10, 12; user 2 'click' is constant
    val rows = (0 until 12).map { i =>
      (i.toLong, ts(f"2024-01-01 ${10 + i}%02d:00:00"), 1L, "click",
        if (i % 2 == 0) 10.0 else 12.0, "{}")
    } ++ (0 until 8).map { i =>
      (100L + i, ts(f"2024-01-01 ${10 + i}%02d:00:00"), 2L, "click", 7.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val acf = TemporalQueries.seriesAcf.build(spark, dir).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("lag")) ->
        Option(r.getAs[java.lang.Long]("acf_micro")).map(_.toLong)).toMap
    val clickCode = acf.keys.map(_._1).filter(_ / 8 == 1L).head % 8
    val id1 = 1L * 8 + clickCode; val id2 = 2L * 8 + clickCode
    assert(acf((id1, 1L)).get === -1000000L)
    assert(acf((id1, 2L)).get === 1000000L)
    assert(acf((id1, 3L)).get === -1000000L)
    assert(acf((id2, 1L)).isEmpty, "zero-variance series must yield null acf")
  }

  test("series_xcorr: proportional pair → +1, reflected pair → -1, pairs are ordered and same-user") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmpDir("graft-xcorr")
    // one user, three series on the same hourly grid: view = 2×click
    // (corr +1), error = 22 − click (corr −1); view vs error also −1
    val rows = (0 until 10).flatMap { i =>
      val v = if (i % 2 == 0) 10.0 else 12.0
      val t = ts(f"2024-01-01 ${10 + i}%02d:00:00")
      Seq((i * 3L, t, 1L, "click", v, "{}"),
        (i * 3L + 1L, t, 1L, "view", 2 * v, "{}"),
        (i * 3L + 2L, t, 1L, "error", 22.0 - v, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val res = TemporalQueries.seriesXcorr.build(spark, dir).collect()
    assert(res.length === 3, "three series of one user form exactly three pairs")
    assert(res.forall(_.getAs[Long]("n_buckets") === 10L))
    assert(res.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(res.forall(r => r.getAs[Long]("id_a") / 8 === r.getAs[Long]("id_b") / 8),
      "pairs never cross users")
    assert(res.map(_.getAs[Long]("xcorr_micro")).sorted.toSeq ===
      Seq(-1000000L, -1000000L, 1000000L))
  }

  test("series_cusum: planted mean shift found at the step boundary; constant series degenerates to k=1, dev 0") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmpDir("graft-cusum")
    // user 1 'click': 10 values of 10.0 then 10 of 20.0 → argmax at k=10
    // (|stat| = 1e6 vs 0.9e6 at k=9/11); user 2 'click': constant
    val rows = (0 until 20).map { i =>
      (i.toLong, ts(f"2024-01-01 ${i}%02d:10:00"), 1L, "click",
        if (i < 10) 10.0 else 20.0, "{}")
    } ++ (0 until 6).map { i =>
      (100L + i, ts(f"2024-01-01 ${i}%02d:10:00"), 2L, "click", 3.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val res = TemporalQueries.seriesCusum.build(spark, dir).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("cp_pos"), r.getAs[Long]("dev_milli"), r.getAs[Long]("n"))).toMap
    val clickCode = res.keys.filter(_ / 8 == 1L).head % 8
    val (pos1, dev1, n1) = res(1L * 8 + clickCode)
    assert(n1 === 20L && pos1 === 10L, s"changepoint at the step boundary (got $pos1)")
    assert(dev1 === 50000L, s"dev = |n·S_k − k·S_n|/n = 1e6/20 (got $dev1)")
    val (pos2, dev2, _) = res(2L * 8 + clickCode)
    assert(pos2 === 1L && dev2 === 0L, "constant series: zero statistic everywhere, k=1 tiebreak")
  }

  test("anomaly_windows: adjacent spikes coalesce into one window, a distant spike opens another") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmpDir("graft-aw")
    // 50 hourly points at 10.0; spikes at hours 20, 21 (adjacent → one
    // window) and hour 40 (> 2 h later → second window). z ≈ 3.95 for
    // spikes, −0.25 for baseline.
    val rows = (0 until 50).map { i =>
      val day = 1 + i / 24; val hour = i % 24
      (i.toLong, ts(f"2024-01-$day%02d $hour%02d:00:00"), 1L, "click",
        if (i == 20 || i == 21 || i == 40) 100.0 else 10.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val res = TemporalQueries.anomalyWindows.build(spark, dir).collect()
    assert(res.length === 2, s"two alert windows expected, got ${res.length}")
    val byWid = res.sortBy(_.getAs[Long]("wid"))
    assert(byWid(0).getAs[Long]("n_points") === 2L, "adjacent spikes coalesce")
    assert(byWid(1).getAs[Long]("n_points") === 1L)
    assert(res.forall(_.getAs[Long]("peak_z2_micro") > 9000000L),
      "peak z² above the 9.0 gate in micro units")
  }

  test("series_acf matches Spark's native corr within rounding") {
    import org.apache.spark.sql.functions._
    val res = TemporalQueries.seriesAcf.build(spark, sfDir)
      .filter(col("acf_micro").isNotNull).limit(20).collect()
    assert(res.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("time", "seq")
    val lagged = graft.sources.EventsSource.meas(spark, sfDir)
      .withColumn("x", floor(col("value") * lit(1000.0) + lit(0.5)))
    res.groupBy(_.getAs[Long]("lag")).foreach { case (lagN, rows) =>
      val native = lagged
        .withColumn("y", lag("x", lagN.toInt).over(w))
        .filter(col("y").isNotNull)
        .groupBy("id").agg(corr(col("x").cast("double"), col("y").cast("double")).as("c"))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("c")).toMap
      rows.foreach { r =>
        val mine = r.getAs[Long]("acf_micro") / 1000000.0
        val ref = native(r.getAs[Long]("id"))
        assert(math.abs(mine - ref) < 1e-5, s"id=${r.getAs[Long]("id")} lag=$lagN: $mine vs $ref")
      }
    }
  }

  test("series_seasonal: residuals per (id, hour) sum to the truncation remainder; adjustment is consistent with series_profile") {
    val res = graft.extensions.TemporalQueries.seriesSeasonal.build(spark, sfDir).collect()
    val prof = SparkEntry.queries("series_profile")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // seasonal_milli must be exactly the profile's mean for the point's hour
    val byCell = res.groupBy { r =>
      (r.getLong(0), r.getTimestamp(1).toLocalDateTime.getHour.toLong) }
    assert(byCell.keySet === prof.keySet, "every profile cell is adjusted")
    byCell.foreach { case (cell, rows) =>
      val (nObs, meanMilli) = prof(cell)
      assert(rows.length.toLong === nObs, s"cell $cell point count")
      rows.foreach(r => assert(r.getLong(4) === meanMilli, s"cell $cell seasonal"))
      // x = seasonal + resid exactly; Σresid = Σx − n·mean where mean is
      // the TRUNCATING division Σx DIV n (Spark DIV and DuckDB // both
      // truncate toward zero), so the remainder's magnitude is < n and
      // its SIGN follows Σx — a negative-mean cell legitimately yields a
      // negative remainder (the old 0 ≤ Σresid < n form assumed a
      // non-negative cell sum and failed spuriously on negative means)
      rows.foreach(r => assert(r.getLong(3) === r.getLong(4) + r.getLong(5)))
      val sumResid = rows.map(_.getLong(5)).sum
      val sumX = rows.map(_.getLong(3)).sum
      assert(math.abs(sumResid) < nObs,
        s"cell $cell residual sum $sumResid magnitude must be under n=$nObs")
      assert(sumResid === sumX - nObs * meanMilli,
        s"cell $cell residual sum $sumResid must equal sumX - n*mean = ${sumX - nObs * meanMilli}")
    }
  }
}
