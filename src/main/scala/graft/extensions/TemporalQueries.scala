package graft.extensions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.QueryDef
import graft.sources.{EventsSource, Sql}

/** Temporal join/resample operators over the events stream — the two
  * query shapes every time-series engine ends up needing beyond plain
  * interval reads (the reference's readTimePoint is the single-point
  * special case of both [U: libdariadb/query.h — QueryTimePoint]):
  *
  *  - `asof_join`: for every probe row, the latest reference row
  *    at-or-before its timestamp (trade↔quote / purchase↔click).
  *  - `series_fill`: resample each series onto a fixed time grid with
  *    forward fill + staleness age (gap-filled dashboards, feature
  *    snapshots at training time).
  *
  * Both use the union + running `last(…, ignoreNulls)` window
  * formulation rather than a range join: one shuffle on the partition
  * key, no per-row interval probe, no O(probe × reference) candidate
  * pairs. At 100 TB the window is per-user/per-series partitioned —
  * bounded state, shuffle-parallel, and AQE-splittable; a range join
  * would either broadcast a corpus-sized side or build an interval
  * index per partition for strictly more work at the same answer.
  *
  * Determinism contract: tie rows at one timestamp are ordered
  * (is_probe, seq) — reference rows sort before the probes they serve
  * (at-or-before includes equality), and equal-time reference rows
  * resolve to the highest seq, the store's freshness rule (O16).
  */
object TemporalQueries {

  import org.apache.spark.sql.{Column, DataFrame}

  /** Library form of the as-of join. Both inputs carry (k, t, seq, v);
    * returns each probe row with (ref_t, ref_v) = the reference row with
    * the greatest t ≤ probe t (ties on t resolved to the greatest seq),
    * or nulls when no reference precedes. One shuffle on k. */
  def asofCore(probes: DataFrame, refs: DataFrame): DataFrame = {
    val u = probes.withColumn("is_probe", lit(1))
      .unionByName(refs.withColumn("is_probe", lit(0)))
    val win = Window.partitionBy("k")
      .orderBy(col("t"), col("is_probe"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one select, not a withColumn chain: same-spec window expressions
    // then land in a single Window operator (one buffered pass per key
    // instead of one per column)
    u.select(col("k"), col("t"), col("seq"), col("v"), col("is_probe"),
        last(when(col("is_probe") === 0, col("t")), ignoreNulls = true).over(win).as("ref_t"),
        last(when(col("is_probe") === 0, col("v")), ignoreNulls = true).over(win).as("ref_v"))
      .filter(col("is_probe") === 1)
      .select("k", "t", "seq", "v", "ref_t", "ref_v")
  }

  /** Library form of grid forward-fill: every grid (k, t) row gains the
    * latest observation value at-or-before t (ties to greatest seq) and
    * the observation's timestamp, or nulls before the first one. */
  def fillCore(obs: DataFrame, grid: DataFrame): DataFrame = {
    val u = obs.withColumn("is_grid", lit(0))
      .unionByName(grid
        .withColumn("is_grid", lit(1))
        .withColumn("seq", lit(0L))
        .withColumn("v", lit(null).cast("double")))
    val win = Window.partitionBy("k")
      .orderBy(col("t"), col("is_grid"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.select(col("k"), col("t"), col("is_grid"),
        last(when(col("is_grid") === 0, col("v")), ignoreNulls = true).over(win).as("fv"),
        last(when(col("is_grid") === 0, col("t")), ignoreNulls = true).over(win).as("ft"))
      .filter(col("is_grid") === 1)
      .select("k", "t", "fv", "ft")
  }

  // -------------------------------------------------------------------
  // asof_join: purchases probe, clicks reference, per user.
  // -------------------------------------------------------------------
  val asofJoin: QueryDef = QueryDef(
    build = (s, d) => {
      val ev = EventsSource.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      def shaped(tpe: String) = ev.filter(col("event_type") === tpe)
        .select(col("user_id").as("k"), col("ts").as("t"),
          col("event_id").as("seq"), col("value").as("v"))
      asofCore(shaped("purchase"), shaped("click"))
        .select(col("k").as("user_id"), col("t").as("purchase_ts"), col("seq").as("event_id"),
          col("v").as("purchase_value"), col("ref_t").as("click_ts"), col("ref_v").as("click_value"),
          (unix_micros(col("t")) - unix_micros(col("ref_t"))).as("lag_us"))
        .orderBy("user_id", "purchase_ts", "event_id")
    },
    oracle = Some(
      """WITH u AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_probe
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |), w AS (
        |  SELECT user_id, ts, event_id, value, is_probe,
        |         last_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS) OVER win AS click_ts,
        |         last_value(CASE WHEN is_probe = 0 THEN value END IGNORE NULLS) OVER win AS click_value
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_probe, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT user_id, ts AS purchase_ts, event_id, value AS purchase_value,
        |       click_ts, click_value, epoch_us(ts) - epoch_us(click_ts) AS lag_us
        |FROM w WHERE is_probe = 1 ORDER BY user_id, purchase_ts, event_id""".stripMargin),
    doc = "temporal: as-of join (latest click at-or-before each purchase, per user)")

  // -------------------------------------------------------------------
  // series_fill: hourly grid over [FROM_G, TO_G] (inclusive ends, 49
  // points), forward-filled per series with the fill's staleness age.
  // Grid cardinality = |series| × 49 — output-proportional, never
  // corpus-proportional.
  // -------------------------------------------------------------------
  private val FROM_G = "2024-01-10 00:00:00"
  private val TO_G   = "2024-01-12 00:00:00"

  val seriesFill: QueryDef = QueryDef(
    build = (s, d) => {
      val m0 = EventsSource.meas(s, d)
      // grid covers EVERY known series (not just those with data before
      // the grid end) — a series first observed later still gets its 49
      // null-filled grid rows, matching the oracle's DISTINCT over meas
      val grid = m0.select(col("id").as("k")).distinct()
        .withColumn("t", explode(expr(
          s"sequence(to_timestamp('$FROM_G'), to_timestamp('$TO_G'), interval 1 hour)")))
      val obs = m0.filter(col("time") <= lit(TO_G).cast("timestamp"))
        .select(col("id").as("k"), col("time").as("t"), col("seq"), col("value").as("v"))
      fillCore(obs, grid)
        .select(col("k").as("id"), col("t").as("grid_ts"), col("fv").as("value"),
          (unix_micros(col("t")) - unix_micros(col("ft"))).as("fill_age_us"))
        .orderBy("id", "grid_ts")
    },
    oracle = Some(
      s"""${Sql.MEAS_CTE}, g AS (
         |  SELECT ids.id, gs.gts AS t
         |  FROM (SELECT DISTINCT id FROM meas) ids
         |  CROSS JOIN generate_series(TIMESTAMP '$FROM_G', TIMESTAMP '$TO_G', INTERVAL 1 HOUR) gs(gts)
         |), u AS (
         |  SELECT id, time AS t, 0 AS is_grid, seq, value FROM meas
         |  WHERE time <= TIMESTAMP '$TO_G'
         |  UNION ALL
         |  SELECT id, t, 1, 0, NULL::DOUBLE FROM g
         |), w AS (
         |  SELECT id, t, is_grid,
         |         last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER win AS fv,
         |         last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS) OVER win AS ft
         |  FROM u
         |  WINDOW win AS (PARTITION BY id ORDER BY t, is_grid, seq
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |)
         |SELECT id, t AS grid_ts, fv AS value, epoch_us(t) - epoch_us(ft) AS fill_age_us
         |FROM w WHERE is_grid = 1 ORDER BY id, grid_ts""".stripMargin),
    doc = "temporal: fixed-grid resample with forward fill + staleness age, per series")

  /** Library form of linear interpolation at grid points: each grid
    * (k, t) row gets pv/pt = latest observation at-or-before t and
    * nv/nt = earliest observation strictly after t (an observation AT
    * the grid instant is an exact hit served by the pv branch). Both
    * window frames share one partitioning and sort order, so the plan
    * has ONE Exchange + ONE Sort feeding two pipelined Window passes —
    * no second shuffle, no re-sort. */
  def interpCore(obs: DataFrame, grid: DataFrame): DataFrame = {
    val u = obs.withColumn("is_grid", lit(0))
      .unionByName(grid
        .withColumn("is_grid", lit(1))
        .withColumn("seq", lit(0L))
        .withColumn("v", lit(null).cast("double")))
    val past = Window.partitionBy("k")
      .orderBy(col("t"), col("is_grid"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = Window.partitionBy("k")
      .orderBy(col("t"), col("is_grid"), col("seq"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsOnly = (c: Column) => when(col("is_grid") === 0, c)
    u.select(col("k"), col("t"), col("is_grid"),
        last(obsOnly(col("v")), ignoreNulls = true).over(past).as("pv"),
        last(obsOnly(col("t")), ignoreNulls = true).over(past).as("pt"),
        first(obsOnly(col("v")), ignoreNulls = true).over(future).as("nv"),
        first(obsOnly(col("t")), ignoreNulls = true).over(future).as("nt"))
      .filter(col("is_grid") === 1)
      .select(col("k"), col("t"), col("pv"), col("pt"), col("nv"), col("nt"))
  }

  // -------------------------------------------------------------------
  // series_interp: linear interpolation onto the same hourly grid as
  // series_fill. The interpolation arithmetic is written ONCE in a fixed
  // operation order (sub, cast, div, mul, add — all IEEE-754 double) and
  // mirrored verbatim in the oracle: identical ops in identical order
  // are bit-deterministic across engines, unlike reassociated sums.
  // -------------------------------------------------------------------
  val seriesInterp: QueryDef = QueryDef(
    build = (s, d) => {
      val m0 = EventsSource.meas(s, d)
      val grid = m0.select(col("id").as("k")).distinct()
        .withColumn("t", explode(expr(
          s"sequence(to_timestamp('$FROM_G'), to_timestamp('$TO_G'), interval 1 hour)")))
      val obs = m0.select(col("id").as("k"), col("time").as("t"), col("seq"), col("value").as("v"))
      val ratio = (unix_micros(col("t")) - unix_micros(col("pt"))).cast("double") /
        (unix_micros(col("nt")) - unix_micros(col("pt"))).cast("double")
      interpCore(obs, grid)
        .select(col("k").as("id"), col("t").as("grid_ts"),
          when(col("pt") === col("t"), col("pv"))
            .when(col("pt").isNotNull && col("nt").isNotNull,
              col("pv") + (col("nv") - col("pv")) * ratio)
            .as("value"))
        .orderBy("id", "grid_ts")
    },
    oracle = Some(
      s"""${Sql.MEAS_CTE}, g AS (
         |  SELECT ids.id, gs.gts AS t
         |  FROM (SELECT DISTINCT id FROM meas) ids
         |  CROSS JOIN generate_series(TIMESTAMP '$FROM_G', TIMESTAMP '$TO_G', INTERVAL 1 HOUR) gs(gts)
         |), u AS (
         |  SELECT id, time AS t, 0 AS is_grid, seq, value FROM meas
         |  UNION ALL
         |  SELECT id, t, 1, 0, NULL::DOUBLE FROM g
         |), w AS (
         |  SELECT id, t, is_grid,
         |         last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER win_p AS pv,
         |         last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS) OVER win_p AS pt,
         |         first_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER win_f AS nv,
         |         first_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS) OVER win_f AS nt
         |  FROM u
         |  WINDOW win_p AS (PARTITION BY id ORDER BY t, is_grid, seq
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         win_f AS (PARTITION BY id ORDER BY t, is_grid, seq
         |                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |)
         |SELECT id, t AS grid_ts,
         |       CASE WHEN pt = t THEN pv
         |            WHEN pt IS NOT NULL AND nt IS NOT NULL
         |            THEN pv + (nv - pv) * ((epoch_us(t) - epoch_us(pt))::DOUBLE
         |                                   / (epoch_us(nt) - epoch_us(pt))::DOUBLE)
         |       END AS value
         |FROM w WHERE is_grid = 1 ORDER BY id, grid_ts""".stripMargin),
    doc = "temporal: fixed-grid resample with LINEAR interpolation between neighbors, per series")

  // -------------------------------------------------------------------
  // series_bars: OHLC downsampling — the bar/candle operator every
  // time-series store grows. open/close are argmin/argmax of the full
  // (time, seq) order within the bucket (seq = store freshness rule for
  // equal timestamps); one grouped aggregation, partial agg map-side,
  // no window over the data.
  // -------------------------------------------------------------------
  val seriesBars: QueryDef = QueryDef(
    build = (s, d) =>
      EventsSource.meas(s, d)
        .groupBy(col("id"), date_trunc("hour", col("time")).as("bucket"))
        .agg(
          min_by(col("value"), struct(col("time"), col("seq"))).as("open"),
          max_by(col("value"), struct(col("time"), col("seq"))).as("close"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          count(lit(1)).as("cnt"))
        .orderBy("id", "bucket"),
    oracle = Some(
      s"""${Sql.MEAS_CTE}, b AS (
         |  SELECT id, date_trunc('hour', time) AS bucket, value,
         |         row_number() OVER (PARTITION BY id, date_trunc('hour', time)
         |                            ORDER BY time, seq) AS rn_a,
         |         row_number() OVER (PARTITION BY id, date_trunc('hour', time)
         |                            ORDER BY time DESC, seq DESC) AS rn_d
         |  FROM meas
         |)
         |SELECT id, bucket,
         |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
         |       max(CASE WHEN rn_d = 1 THEN value END) AS close,
         |       max(value) AS high, min(value) AS low, count(*)::BIGINT AS cnt
         |FROM b GROUP BY id, bucket ORDER BY id, bucket""".stripMargin),
    doc = "temporal: OHLC bars per series per hour (argmin/argmax by (time, seq) order)")

  // -------------------------------------------------------------------
  // asof_tolerance: the bounded-staleness as-of join. Because the as-of
  // match is the LATEST reference at-or-before the probe, a staleness
  // bound is a post-filter on that single match (any other reference is
  // older still) — no second join, no extra shuffle.
  // -------------------------------------------------------------------
  private val TOL_US = 6L * 3600L * 1000000L // 6 hours

  val asofTolerance: QueryDef = QueryDef(
    build = (s, d) => {
      val ev = EventsSource.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      def shaped(tpe: String) = ev.filter(col("event_type") === tpe)
        .select(col("user_id").as("k"), col("ts").as("t"),
          col("event_id").as("seq"), col("value").as("v"))
      val lagUs = unix_micros(col("t")) - unix_micros(col("ref_t"))
      val fresh = col("ref_t").isNotNull && lagUs <= lit(TOL_US)
      asofCore(shaped("purchase"), shaped("click"))
        .select(col("k").as("user_id"), col("t").as("purchase_ts"), col("seq").as("event_id"),
          col("v").as("purchase_value"),
          when(fresh, col("ref_t")).as("click_ts"),
          when(fresh, col("ref_v")).as("click_value"),
          when(fresh, lagUs).as("lag_us"))
        .orderBy("user_id", "purchase_ts", "event_id")
    },
    oracle = Some(
      s"""WITH u AS (
         |  SELECT user_id, ts, event_id, value,
         |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_probe
         |  FROM events WHERE event_type IN ('purchase', 'click')
         |), w AS (
         |  SELECT user_id, ts, event_id, value, is_probe,
         |         last_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS) OVER win AS ct,
         |         last_value(CASE WHEN is_probe = 0 THEN value END IGNORE NULLS) OVER win AS cv
         |  FROM u
         |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_probe, event_id
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |)
         |SELECT user_id, ts AS purchase_ts, event_id, value AS purchase_value,
         |       CASE WHEN epoch_us(ts) - epoch_us(ct) <= $TOL_US THEN ct END AS click_ts,
         |       CASE WHEN epoch_us(ts) - epoch_us(ct) <= $TOL_US THEN cv END AS click_value,
         |       CASE WHEN epoch_us(ts) - epoch_us(ct) <= $TOL_US
         |            THEN epoch_us(ts) - epoch_us(ct) END AS lag_us
         |FROM w WHERE is_probe = 1 ORDER BY user_id, purchase_ts, event_id""".stripMargin),
    doc = "temporal: as-of join with a staleness tolerance (match dropped when older than 6h)")

  // -------------------------------------------------------------------
  // range_join: interval-containment join — each purchase matched to the
  // click-session attribution window ([first click, last click + 30 min],
  // sessions split by sessionize's 30-min gap) that contains it. Windows
  // of one user stay disjoint BY CONSTRUCTION: the gap rule puts the next
  // session's first click strictly more than 30 min after the previous
  // session's last, so the +30 min extension never reaches it — each
  // probe matches at most one interval, no dedup step needed.
  // The scale-sound plan is bucket decomposition: every
  // interval is exploded to the hour buckets it covers, the probe carries
  // its single bucket, and the join is an EQUI-join on (user_id, bucket)
  // with an exact containment post-filter — never a theta-join. Because a
  // probe has exactly one bucket, each (probe, interval) pair meets in at
  // most one task and needs no dedup; because sessions of one user are
  // gap-disjoint, each probe matches at most one interval. The bucket key
  // also bounds skew: a heavy user's sessions spread over (user, hour)
  // keys instead of serializing on the user alone.
  // -------------------------------------------------------------------
  /** Session gap for [[rangeJoin]] (mirrors sessionize's 30 min). */
  private val RJ_GAP_US = 30L * 60L * 1000000L

  val rangeJoin: QueryDef = QueryDef(
    build = (s, d) => {
      val ev = EventsSource.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sess = ev.filter(col("event_type") === "click")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag("us", 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull
            || col("us") - col("prev_us") > RJ_GAP_US, 1L).otherwise(0L))
        .withColumn("session_id", sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(min("ts").as("session_start"),
          (max("ts") + expr("INTERVAL 30 MINUTES")).as("session_end"),
          count(lit(1)).as("n_clicks"))
      val iv = sess.withColumn("bucket", explode(expr(
        "sequence(date_trunc('hour', session_start), date_trunc('hour', session_end), interval 1 hour)")))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts").as("purchase_ts"),
          col("value").as("purchase_value"))
        .withColumn("bucket", date_trunc("hour", col("purchase_ts")))
      probes.join(iv, Seq("user_id", "bucket"))
        .filter(col("purchase_ts").between(col("session_start"), col("session_end")))
        .select("user_id", "event_id", "purchase_ts", "purchase_value",
          "session_id", "session_start", "session_end", "n_clicks")
        .orderBy("user_id", "event_id")
    },
    oracle = Some(
      s"""WITH c AS (
         |  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
         |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM events WHERE event_type = 'click'
         |), m AS (
         |  SELECT user_id, ts, event_id,
         |         CASE WHEN prev_us IS NULL OR us - prev_us > $RJ_GAP_US
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM c
         |), s0 AS (
         |  SELECT user_id, ts,
         |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                                ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
         |  FROM m
         |), sess AS (
         |  SELECT user_id, session_id, min(ts) AS session_start,
         |         max(ts) + INTERVAL 30 MINUTES AS session_end,
         |         count(*)::BIGINT AS n_clicks
         |  FROM s0 GROUP BY user_id, session_id
         |)
         |SELECT p.user_id, p.event_id, p.ts AS purchase_ts, p.value AS purchase_value,
         |       s.session_id, s.session_start, s.session_end, s.n_clicks
         |FROM events p
         |JOIN sess s ON p.user_id = s.user_id
         |           AND p.ts BETWEEN s.session_start AND s.session_end
         |WHERE p.event_type = 'purchase'
         |ORDER BY p.user_id, p.event_id""".stripMargin),
    doc = "temporal: interval-containment join (purchases inside click-session attribution windows) via hour-bucket decomposition")

  // -------------------------------------------------------------------
  // series_acf: per-series autocorrelation at row lags 1..3 (the
  // order-of-arrival pairing every TSDB diagnostic uses on its sampled
  // grid). Determinism: values go to BIGINT milli-units FIRST, the six
  // correlation sums accumulate as DECIMAL(38,0)/HUGEINT — exact 128-bit
  // integers, order-free under Spark's partial aggregation — and only
  // the final closed-form touches doubles, in one mirrored op order.
  // Milli (not micro) units: with |value| ≤ ~1e6, x·y ≤ ~1e18 per row
  // keeps the 128-bit sums exact past 1e19 rows per series. One
  // window sort feeds all three lags; the groupBy rides the window's
  // hash partitioning (no second exchange).
  // -------------------------------------------------------------------
  val seriesAcf: QueryDef = QueryDef(
    build = (s, d) => {
      val w = Window.partitionBy("id").orderBy("time", "seq")
      val lagged = EventsSource.meas(s, d)
        .withColumn("x", floor(col("value") * lit(1000.0) + lit(0.5)))
        .select(col("id"), col("x"),
          lag("x", 1).over(w).as("y1"), lag("x", 2).over(w).as("y2"),
          lag("x", 3).over(w).as("y3"))
      val st = lagged
        .select(col("id"), col("x"), expr("stack(3, 1L, y1, 2L, y2, 3L, y3) AS (lag, y)"))
        .filter(col("y").isNotNull)
      val dec = (c: Column) => c.cast("decimal(18,0)")
      val sums = st.groupBy("id", "lag").agg(
        count(lit(1)).as("n_pairs"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      val nd = col("n_pairs").cast("double")
      def dd(c: String) = col(c).cast("double")
      val num = nd * dd("sxy") - dd("sx") * dd("sy")
      val den2 = (nd * dd("sxx") - dd("sx") * dd("sx")) * (nd * dd("syy") - dd("sy") * dd("sy"))
      // BIGINT micro output (floor(x·1e6 + 0.5)), NOT a rounded double:
      // near-zero correlations can land on -0.0, which the two engines'
      // round() disagree on (see the verify skill's determinism notes)
      sums.select(col("id"), col("lag"), col("n_pairs"),
          when(den2 > 0, floor(num / sqrt(den2) * lit(1000000.0) + lit(0.5)))
            .as("acf_micro"))
        .orderBy("id", "lag")
    },
    oracle = Some(
      s"""${Sql.MEAS_CTE}, x0 AS (
         |  SELECT id, time, seq, CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS x FROM meas
         |), lg AS (
         |  SELECT id, x,
         |         lag(x, 1) OVER w AS y1, lag(x, 2) OVER w AS y2, lag(x, 3) OVER w AS y3
         |  FROM x0 WINDOW w AS (PARTITION BY id ORDER BY time, seq)
         |), st AS (
         |  SELECT id, x, lag, y FROM (
         |    SELECT id, x, 1::BIGINT AS lag, y1 AS y FROM lg
         |    UNION ALL SELECT id, x, 2::BIGINT, y2 FROM lg
         |    UNION ALL SELECT id, x, 3::BIGINT, y3 FROM lg
         |  ) WHERE y IS NOT NULL
         |), sums AS (
         |  SELECT id, lag, count(*)::BIGINT AS n_pairs,
         |         sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         |         sum(x::HUGEINT * y) AS sxy,
         |         sum(x::HUGEINT * x) AS sxx,
         |         sum(y::HUGEINT * y) AS syy
         |  FROM st GROUP BY id, lag
         |)
         |SELECT id, lag, n_pairs,
         |       CASE WHEN (n_pairs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
         |                 * (n_pairs::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
         |            THEN CAST(floor((n_pairs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
         |                       / sqrt((n_pairs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
         |                              * (n_pairs::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
         |                       * 1000000.0 + 0.5) AS BIGINT)
         |       END AS acf_micro
         |FROM sums ORDER BY id, lag""".stripMargin),
    doc = "temporal: per-series autocorrelation at row lags 1..3 (exact 128-bit integer sums, closed-form Pearson)")

  // -------------------------------------------------------------------
  // asof_forward: the mirror of asof_join — for every probe, the
  // EARLIEST reference at-or-after its timestamp (the post-event
  // enrichment: "first click after each purchase"). Same union + one
  // window formulation, frame flipped to (currentRow, unbounded
  // FOLLOWING). Sort order (t, is_probe DESC, seq DESC) makes
  // at-or-after inclusive (equal-t references sort after the probe, so
  // the future frame sees them) and resolves equal-t reference ties to
  // the greatest seq — the store's freshness rule, same as asofCore.
  // -------------------------------------------------------------------
  def asofForwardCore(probes: DataFrame, refs: DataFrame): DataFrame = {
    val u = probes.withColumn("is_probe", lit(1))
      .unionByName(refs.withColumn("is_probe", lit(0)))
    val win = Window.partitionBy("k")
      .orderBy(col("t"), col("is_probe").desc, col("seq").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u.select(col("k"), col("t"), col("seq"), col("v"), col("is_probe"),
        first(when(col("is_probe") === 0, col("t")), ignoreNulls = true).over(win).as("ref_t"),
        first(when(col("is_probe") === 0, col("v")), ignoreNulls = true).over(win).as("ref_v"))
      .filter(col("is_probe") === 1)
      .select("k", "t", "seq", "v", "ref_t", "ref_v")
  }

  val asofForward: QueryDef = QueryDef(
    build = (s, d) => {
      val ev = EventsSource.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      def shaped(tpe: String) = ev.filter(col("event_type") === tpe)
        .select(col("user_id").as("k"), col("ts").as("t"),
          col("event_id").as("seq"), col("value").as("v"))
      asofForwardCore(shaped("purchase"), shaped("click"))
        .select(col("k").as("user_id"), col("t").as("purchase_ts"), col("seq").as("event_id"),
          col("v").as("purchase_value"), col("ref_t").as("click_ts"), col("ref_v").as("click_value"),
          (unix_micros(col("ref_t")) - unix_micros(col("t"))).as("lead_us"))
        .orderBy("user_id", "purchase_ts", "event_id")
    },
    oracle = Some(
      """WITH u AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_probe
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |), w AS (
        |  SELECT user_id, ts, event_id, value, is_probe,
        |         first_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS) OVER win AS click_ts,
        |         first_value(CASE WHEN is_probe = 0 THEN value END IGNORE NULLS) OVER win AS click_value
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_probe DESC, event_id DESC
        |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, ts AS purchase_ts, event_id, value AS purchase_value,
        |       click_ts, click_value, epoch_us(click_ts) - epoch_us(ts) AS lead_us
        |FROM w WHERE is_probe = 1 ORDER BY user_id, purchase_ts, event_id""".stripMargin),
    doc = "temporal: forward as-of join (earliest click at-or-after each purchase, per user)")

  // -------------------------------------------------------------------
  // series_xcorr: lag-0 cross-correlation between every pair of series
  // OWNED BY THE SAME USER, on the shared hourly grid. The pair space is
  // bounded by construction — a user owns ≤ 8 series (one per event
  // type), so the bucket join fans each (user, hour) key into ≤ 28
  // pairs, never corpus × corpus. Bucket feature = the hourly SUM in
  // exact BIGINT milli-units (a mean would re-introduce order-dependent
  // double division before the correlation sums); only buckets where
  // BOTH series observed data enter the pair (inner join). Same
  // determinism discipline as series_acf: DECIMAL/HUGEINT sums,
  // closed-form Pearson in one mirrored double op order, BIGINT micro
  // output.
  // -------------------------------------------------------------------
  val seriesXcorr: QueryDef = QueryDef(
    build = (s, d) => {
      val b = EventsSource.meas(s, d)
        .withColumn("x", floor(col("value") * lit(1000.0) + lit(0.5)))
        .groupBy(col("id"), date_trunc("hour", col("time")).as("bucket"))
        .agg(sum("x").as("xs"))
        .select(expr("id DIV 8").as("u"), pmod(col("id"), lit(8L)).as("code"),
          col("bucket"), col("xs"))
      val pairs = b.select(col("u"), col("bucket"), col("code").as("code_a"), col("xs").as("xa"))
        .join(b.select(col("u"), col("bucket"), col("code").as("code_b"), col("xs").as("xb")),
          Seq("u", "bucket"))
        .filter(col("code_a") < col("code_b"))
      val dec = (c: Column) => c.cast("decimal(18,0)")
      val sums = pairs.groupBy("u", "code_a", "code_b").agg(
        count(lit(1)).as("n_buckets"),
        sum(dec(col("xa"))).as("sx"), sum(dec(col("xb"))).as("sy"),
        sum(dec(col("xa")) * dec(col("xb"))).as("sxy"),
        sum(dec(col("xa")) * dec(col("xa"))).as("sxx"),
        sum(dec(col("xb")) * dec(col("xb"))).as("syy"))
      val nd = col("n_buckets").cast("double")
      def dd(c: String) = col(c).cast("double")
      val num = nd * dd("sxy") - dd("sx") * dd("sy")
      val den2 = (nd * dd("sxx") - dd("sx") * dd("sx")) * (nd * dd("syy") - dd("sy") * dd("sy"))
      sums.select(
          (col("u") * 8 + col("code_a")).as("id_a"),
          (col("u") * 8 + col("code_b")).as("id_b"),
          col("n_buckets"),
          when(den2 > 0, floor(num / sqrt(den2) * lit(1000000.0) + lit(0.5)))
            .as("xcorr_micro"))
        .orderBy("id_a", "id_b")
    },
    oracle = Some(
      s"""${Sql.MEAS_CTE}, b AS (
         |  SELECT id // 8 AS u, id % 8 AS code, date_trunc('hour', time) AS bucket,
         |         sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))::BIGINT AS xs
         |  FROM meas GROUP BY 1, 2, 3
         |), pairs AS (
         |  SELECT a.u, a.code AS code_a, c.code AS code_b, a.xs AS xa, c.xs AS xb
         |  FROM b a JOIN b c ON a.u = c.u AND a.bucket = c.bucket AND a.code < c.code
         |), sums AS (
         |  SELECT u, code_a, code_b, count(*)::BIGINT AS n_buckets,
         |         sum(xa::HUGEINT) AS sx, sum(xb::HUGEINT) AS sy,
         |         sum(xa::HUGEINT * xb) AS sxy,
         |         sum(xa::HUGEINT * xa) AS sxx,
         |         sum(xb::HUGEINT * xb) AS syy
         |  FROM pairs GROUP BY u, code_a, code_b
         |)
         |SELECT (u * 8 + code_a)::BIGINT AS id_a, (u * 8 + code_b)::BIGINT AS id_b, n_buckets,
         |       CASE WHEN (n_buckets::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
         |                 * (n_buckets::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
         |            THEN CAST(floor((n_buckets::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
         |                       / sqrt((n_buckets::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
         |                              * (n_buckets::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
         |                       * 1000000.0 + 0.5) AS BIGINT)
         |       END AS xcorr_micro
         |FROM sums ORDER BY id_a, id_b""".stripMargin),
    doc = "temporal: lag-0 cross-correlation between same-user series pairs on the hourly grid (bounded pair fan-out)")

  // -------------------------------------------------------------------
  // series_cusum: CUSUM changepoint detection per series — the position
  // k* maximizing |n·S_k − k·S_n| (S = running sum), the standard
  // mean-shift statistic with the 1/n normalizations cleared so every
  // compared value is an exact integer. One window sort per series
  // yields S_k and k; S_n and n ride the same partitioning (window
  // aggregates over the unbounded frame — no second shuffle); the
  // argmax is a row_number with a fixed (|stat| desc, k asc) tiebreak.
  // Emitted deviation = |stat| // n (truncating integer division,
  // identical in BigInt and DuckDB `//`) — the mean-shift magnitude in
  // milli-units × k(n−k)/n, never a rounded double. Products go
  // through DECIMAL(28)/HUGEINT — exact while |n·S_k| < 1e28, i.e.
  // Σ|x| ≲ 1e28/n (a 1e9-point series of 1e10-milli values still has
  // 1e9 digits of headroom). Past that bound non-ANSI Spark nulls the
  // overflowed product (silently dropping the changepoint) while
  // DuckDB's HUGEINT errors — if series ever approach it, promote to
  // the two-tier predicate dedup_docvec uses.
  // -------------------------------------------------------------------
  val seriesCusum: QueryDef = QueryDef(
    build = (s, d) => {
      val byId = Window.partitionBy("id").orderBy("time", "seq")
      val whole = Window.partitionBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val run = Window.partitionBy("id").orderBy("time", "seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dec = (c: Column) => c.cast("decimal(28,0)")
      val staged = EventsSource.meas(s, d)
        .withColumn("x", floor(col("value") * lit(1000.0) + lit(0.5)))
        .select(col("id"), col("time"), col("seq"),
          row_number().over(byId).cast("long").as("k"),
          sum("x").over(run).as("sk"),
          sum("x").over(whole).as("sn"),
          count(lit(1)).over(whole).as("n"))
        .withColumn("stat", dec(col("n")) * dec(col("sk")) - dec(col("k")) * dec(col("sn")))
        .withColumn("astat", abs(col("stat")))
      val best = Window.partitionBy("id").orderBy(col("astat").desc, col("k"))
      staged
        .withColumn("rk", row_number().over(best))
        .filter(col("rk") === 1)
        .select(col("id"), col("n"), col("k").as("cp_pos"), col("time").as("cp_time"),
          // integral DIV (exact decimal division, truncated): both a
          // decimal→decimal(.,0) CAST and a scale-limited `/`+floor can
          // round where DuckDB's `//` truncates
          expr("astat DIV n").as("dev_milli"))
        .orderBy("id")
    },
    oracle = Some(
      s"""${Sql.MEAS_CTE}, x0 AS (
         |  SELECT id, time, seq, CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS x FROM meas
         |), st AS (
         |  SELECT id, time, seq,
         |         row_number() OVER w AS k,
         |         sum(x) OVER (PARTITION BY id ORDER BY time, seq
         |                      ROWS UNBOUNDED PRECEDING)::BIGINT AS sk,
         |         sum(x) OVER (PARTITION BY id)::BIGINT AS sn,
         |         count(*) OVER (PARTITION BY id)::BIGINT AS n
         |  FROM x0 WINDOW w AS (PARTITION BY id ORDER BY time, seq)
         |), scored AS (
         |  SELECT id, time, k, n,
         |         abs(n::HUGEINT * sk - k::HUGEINT * sn) AS astat
         |  FROM st
         |), best AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY astat DESC, k) AS rk
         |  FROM scored
         |)
         |SELECT id, n, k::BIGINT AS cp_pos, time AS cp_time,
         |       (astat // n)::BIGINT AS dev_milli
         |FROM best WHERE rk = 1 ORDER BY id""".stripMargin),
    doc = "temporal: CUSUM changepoint per series (argmax |n·S_k − k·S_n|, exact integer statistic)")

  // -------------------------------------------------------------------
  // anomaly_windows: alert coalescing — the per-point z-score anomaly
  // flag merged into TIME WINDOWS (gaps-and-islands, 2 h gap), which is
  // what a pager actually wants (one alert per incident, not one per
  // sample). The flag is EXACT integer arithmetic: z² > 9 is algebraic-
  // ally (n·x − S)² > 9·(n·Σx² − S²) with milli-int x — no doubles, no
  // epsilon, both engines agree by construction (zero-variance series
  // produce no flags). Emitted peak z² is a truncating HUGEINT micro
  // quotient. One window sort per series computes the moments; islands
  // merge with a lag + running sum over the (few) flagged points.
  // Exactness bound: dev·dev (and dev²·1e6) run in DECIMAL(38)/HUGEINT,
  // exact while |dev| = |n·x − S| < ~1.3e16 — comfortably past any
  // realistic series (1e9 points × 1e6-milli values → |dev| ≲ 1e15)
  // but NOT unconditional: past it non-ANSI Spark nulls the product
  // (silently un-flagging the point) while DuckDB errors. If series
  // ever approach the bound, split the flag predicate into the
  // dedup_docvec two-tier shape.
  // -------------------------------------------------------------------
  private val AW_GAP_US = 2L * 3600L * 1000000L

  val anomalyWindows: QueryDef = QueryDef(
    build = (s, d) => {
      val whole = Window.partitionBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val dec = (c: Column) => c.cast("decimal(28,0)")
      val staged = EventsSource.meas(s, d)
        .withColumn("x", floor(col("value") * lit(1000.0) + lit(0.5)))
        .select(col("id"), col("time"), col("seq"), col("x"),
          sum("x").over(whole).as("sn"),
          sum(col("x").cast("decimal(18,0)") * col("x").cast("decimal(18,0)")).over(whole).as("qn"),
          count(lit(1)).over(whole).as("n"))
        .withColumn("dev", dec(col("n")) * dec(col("x")) - dec(col("sn")))
        .withColumn("varn", dec(col("n")) * col("qn") - dec(col("sn")) * dec(col("sn")))
        .filter(col("varn") > 0 && col("dev") * col("dev") > lit(9) * col("varn"))
      val byId = Window.partitionBy("id").orderBy("time", "seq")
      val run = byId.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      staged
        .withColumn("prev_us", lag(unix_micros(col("time")), 1).over(byId))
        .withColumn("nw", when(col("prev_us").isNull
          || unix_micros(col("time")) - col("prev_us") > AW_GAP_US, 1L).otherwise(0L))
        .withColumn("wid", sum("nw").over(run))
        // integral DIV (exact decimal division, truncated) — a decimal
        // `/` rounds at the result scale and can disagree with DuckDB's
        // `//` when the true quotient sits within 1e-6 of an integer
        .withColumn("z2m", expr("(dev * dev * 1000000) DIV varn"))
        .groupBy("id", "wid")
        .agg(min("time").as("window_start"), max("time").as("window_end"),
          count(lit(1)).as("n_points"), max("z2m").as("peak_z2_micro"))
        .select("id", "wid", "window_start", "window_end", "n_points", "peak_z2_micro")
        .orderBy("id", "wid")
    },
    oracle = Some(
      s"""${Sql.MEAS_CTE}, x0 AS (
         |  SELECT id, time, seq, CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS x FROM meas
         |), mo AS (
         |  SELECT id, time, seq, x,
         |         sum(x) OVER (PARTITION BY id) AS sn,
         |         sum(x::HUGEINT * x) OVER (PARTITION BY id) AS qn,
         |         count(*) OVER (PARTITION BY id)::BIGINT AS n
         |  FROM x0
         |), flagged AS (
         |  SELECT id, time, seq,
         |         (n::HUGEINT * x - sn) AS dev,
         |         (n::HUGEINT * qn - sn::HUGEINT * sn) AS varn
         |  FROM mo
         |  WHERE (n::HUGEINT * qn - sn::HUGEINT * sn) > 0
         |    AND (n::HUGEINT * x - sn) * (n::HUGEINT * x - sn)
         |        > 9 * (n::HUGEINT * qn - sn::HUGEINT * sn)
         |), marked AS (
         |  SELECT id, time, seq, dev, varn,
         |         CASE WHEN lag(epoch_us(time)) OVER w IS NULL
         |                OR epoch_us(time) - lag(epoch_us(time)) OVER w > $AW_GAP_US
         |              THEN 1 ELSE 0 END AS nw
         |  FROM flagged WINDOW w AS (PARTITION BY id ORDER BY time, seq)
         |), islands AS (
         |  SELECT id, time, dev, varn,
         |         sum(nw) OVER (PARTITION BY id ORDER BY time, seq
         |                       ROWS UNBOUNDED PRECEDING)::BIGINT AS wid
         |  FROM marked
         |)
         |SELECT id, wid, min(time) AS window_start, max(time) AS window_end,
         |       count(*)::BIGINT AS n_points,
         |       max((dev * dev * 1000000 // varn))::BIGINT AS peak_z2_micro
         |FROM islands GROUP BY id, wid ORDER BY id, wid""".stripMargin),
    doc = "temporal: z-score anomalies coalesced into alert windows (exact-integer z² flag, gaps-and-islands merge)")

  val defs: Map[String, QueryDef] = Map(
    "asof_join"      -> asofJoin,
    "asof_tolerance" -> asofTolerance,
    "asof_forward"   -> asofForward,
    "series_fill"    -> seriesFill,
    "series_interp"  -> seriesInterp,
    "series_bars"    -> seriesBars,
    "range_join"     -> rangeJoin,
    "series_acf"     -> seriesAcf,
    "series_xcorr"   -> seriesXcorr,
    "series_cusum"   -> seriesCusum,
    "anomaly_windows" -> anomalyWindows,
    "series_profile" -> seriesProfile,
    "series_seasonal" -> seriesSeasonal,
  )

  // -------------------------------------------------------------------
  // series_profile: the hour-of-day calendar profile per series — the
  // heatmap every TSDB dashboard draws. One grouped aggregation on
  // (id, hour-of-day); the mean leaves as a truncating integer milli
  // quotient (sum DIV count — both engines' integer division), so the
  // gate needs no float discipline at all.
  // -------------------------------------------------------------------
  lazy val seriesProfile: QueryDef = QueryDef(
    build = (s, d) =>
      EventsSource.meas(s, d)
        .withColumn("x", floor(col("value") * lit(1000.0) + lit(0.5)))
        .groupBy(col("id"), hour(col("time")).cast("long").as("hod"))
        .agg(count(lit(1)).as("n_obs"), sum("x").as("sum_milli"))
        .withColumn("mean_milli", expr("sum_milli DIV n_obs"))
        .select("id", "hod", "n_obs", "mean_milli")
        .orderBy("id", "hod"),
    oracle = Some(
      s"""${Sql.MEAS_CTE}
         |SELECT id, hour(time)::BIGINT AS hod, count(*)::BIGINT AS n_obs,
         |       (sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) // count(*))::BIGINT AS mean_milli
         |FROM meas GROUP BY id, hour(time)
         |ORDER BY id, hod""".stripMargin),
    doc = "temporal: hour-of-day profile per series (the calendar heatmap; integer-milli means)")

  // -------------------------------------------------------------------
  // series_seasonal: hour-of-day seasonal ADJUSTMENT — series_profile
  // names the calendar shape, this removes it: every point minus its
  // (id, hour) profile mean, the residual being the deseasonalized
  // signal anomaly scoring should run on (a "spike" at the daily peak
  // hour is often just the season). Integer-milli throughout — the
  // profile mean is the same truncating `DIV`/`//` series_profile
  // gates, the residual an exact BIGINT difference. Plan: the profile
  // groupBy and the join back share the (id, hod) partitioning — one
  // exchange feeds both sides, no second corpus shuffle.
  // -------------------------------------------------------------------
  lazy val seriesSeasonal: QueryDef = QueryDef(
    build = (s, d) => {
      val m = EventsSource.meas(s, d)
        .withColumn("x", floor(col("value") * lit(1000.0) + lit(0.5)).cast("long"))
        .withColumn("hod", hour(col("time")).cast("long"))
      val prof = m.groupBy("id", "hod")
        .agg(expr("sum(x) DIV count(1)").as("seasonal_milli"))
      m.join(prof, Seq("id", "hod"))
        .select(col("id"), col("time"), col("seq"), col("x").as("x_milli"),
          col("seasonal_milli"), (col("x") - col("seasonal_milli")).as("resid_milli"))
        .orderBy("id", "time", "seq")
    },
    oracle = Some(
      s"""${Sql.MEAS_CTE}, x0 AS (
         |  SELECT id, time, seq, CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS x,
         |         hour(time)::BIGINT AS hod
         |  FROM meas
         |), prof AS (
         |  SELECT id, hod, (sum(x) // count(*))::BIGINT AS seasonal_milli
         |  FROM x0 GROUP BY id, hod
         |)
         |SELECT x0.id, x0.time, x0.seq, x0.x AS x_milli, prof.seasonal_milli,
         |       (x0.x - prof.seasonal_milli)::BIGINT AS resid_milli
         |FROM x0 JOIN prof ON x0.id = prof.id AND x0.hod = prof.hod
         |ORDER BY x0.id, x0.time, x0.seq""".stripMargin),
    doc = "temporal: hour-of-day seasonal adjustment (profile mean removed per point; residual = the deseasonalized signal)")
}
