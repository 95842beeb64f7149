package graft.extensions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.QueryDef

/** Multimodal-column plumbing, semi-structured (JSON) extraction, and
  * relational pipeline demos (SURVEY.md §2.3 X5 + §2.2 join coverage).
  */
object MiscQueries {

  // -------------------------------------------------------------------
  // X5 multimodal columns: content is carried as an opaque binary column
  // with typed metadata. The decode step is a STUB (no image/audio libs
  // in this container — see extensions/Multimodal.scala for the
  // mapPartitions plumbing); the deterministic fake used here keeps the
  // whole path testable end-to-end. All expressions are codegen'd
  // built-ins — no UDF in the scan path.
  // -------------------------------------------------------------------
  val multimodalMeta: QueryDef = {
    // the fake-decode contract lives in ONE place: Multimodal.MediaDecoder
    val D = Multimodal.MediaDecoder
    val fmtCase =
      D.FORMATS.zipWithIndex.map { case (f, i) => s"WHEN $i THEN '$f'" }.mkString(" ")
    QueryDef(
      build = (s, d) =>
        s.read.parquet(s"$d/documents.parquet")
          .withColumn("content", col("text").cast("binary")) // opaque payload
          .withColumn("byte_len", octet_length(col("text")).cast("long"))
          .select(
            col("doc_id"),
            col("byte_len"),
            (lit(D.DIM_BASE) + col("byte_len") % D.W_MOD).cast("long").as("width"),
            (lit(D.DIM_BASE) + (col("byte_len") * D.H_MULT) % D.H_MOD).cast("long").as("height"),
            (lit(1) + col("byte_len") % D.FRAMES_MOD).cast("long").as("n_frames"),
            expr(s"CASE CAST(byte_len % ${D.FORMATS.size} AS INT) $fmtCase END").as("fmt"),
            md5(col("text")).as("content_md5"))
          .orderBy("doc_id"),
      oracle = Some(
        s"""SELECT doc_id,
           |       octet_length(encode(text))::BIGINT AS byte_len,
           |       (${D.DIM_BASE} + octet_length(encode(text)) % ${D.W_MOD})::BIGINT AS width,
           |       (${D.DIM_BASE} + (octet_length(encode(text)) * ${D.H_MULT}) % ${D.H_MOD})::BIGINT AS height,
           |       (1 + octet_length(encode(text)) % ${D.FRAMES_MOD})::BIGINT AS n_frames,
           |       CASE octet_length(encode(text)) % ${D.FORMATS.size} $fmtCase END AS fmt,
           |       md5(text) AS content_md5
           |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "X5 multimodal metadata (binary payload + stubbed decode)")
  }

  // -------------------------------------------------------------------
  // X2×X5 image perceptual-hash dedup: the LAION-style media dedup
  // pass — every payload gets a 64-bit average-hash (REAL 8×8 raster
  // hash for payloads a JDK codec decodes, UTF-8-codepoint resample
  // for the rest — Multimodal.MediaDecoder.aHash64 is the single
  // definition), then keep-first per identical hash. The hash runs in
  // the batched mapPartitions decoder loop (one codec init per
  // partition); the dedup itself is one grouped window on the
  // 64-bit key — at 100 TB the hash pass is embarrassingly parallel
  // and the shuffle carries (doc_id, 64 chars) per item, nothing
  // payload-sized. The oracle reproduces the fallback hash exactly
  // (string_split + unicode + the same integer cross-multiplied
  // threshold), so the all-fallback synthetic corpus hash-gates the
  // whole pipeline; MultimodalSpec pins the raster path on real PNGs
  // (re-encode ⇒ identical hash, perturbation ⇒ small Hamming).
  // -------------------------------------------------------------------
  val phashDedup: QueryDef = QueryDef(
    build = (s, d) => {
      import s.implicits._
      val ph = Multimodal.mediaRows(s, d)
        .mapPartitions { it =>
          // per-partition codec init happens inside ImageIO; payloads
          // stream through the iterator — constant memory
          it.map(r => (r.doc_id, Multimodal.MediaDecoder.aHash64(r.content)))
        }
        .toDF("doc_id", "phash")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("phash")
      ph.select(col("doc_id"), col("phash"),
          min("doc_id").over(w).as("rep_id"),
          count(lit(1)).over(w).as("n_same"))
        .orderBy("doc_id")
    },
    oracle = Some(
      """WITH cp AS (
        |  SELECT doc_id, string_split(text, '') AS cs FROM documents
        |), pos AS (
        |  SELECT doc_id, (i - 1) * 64 // len(cs) AS j, unicode(cs[i])::BIGINT AS v
        |  FROM (SELECT doc_id, cs, unnest(generate_series(1, len(cs))) AS i FROM cp)
        |), cell AS (
        |  SELECT doc_id, j, sum(v)::BIGINT AS s, count(*)::BIGINT AS c
        |  FROM pos GROUP BY doc_id, j
        |), tot AS (
        |  SELECT doc_id, sum(s)::BIGINT AS tot, sum(c)::BIGINT AS n FROM cell GROUP BY doc_id
        |), grid AS (
        |  SELECT d.doc_id, g.j::BIGINT AS j FROM documents d CROSS JOIN generate_series(0, 63) AS g(j)
        |), bits AS (
        |  SELECT gr.doc_id, gr.j,
        |         CASE WHEN coalesce(ce.s, 0) * coalesce(t.n, 0) > coalesce(t.tot, 0) * coalesce(ce.c, 0)
        |              THEN '1' ELSE '0' END AS b
        |  FROM grid gr
        |  LEFT JOIN tot t ON t.doc_id = gr.doc_id
        |  LEFT JOIN cell ce ON ce.doc_id = gr.doc_id AND ce.j = gr.j
        |), ph AS (
        |  SELECT doc_id, string_agg(b, '' ORDER BY j) AS phash FROM bits GROUP BY doc_id
        |)
        |SELECT doc_id, phash,
        |       min(doc_id) OVER (PARTITION BY phash) AS rep_id,
        |       count(*) OVER (PARTITION BY phash)::BIGINT AS n_same
        |FROM ph ORDER BY doc_id""".stripMargin),
    doc = "X2/X5 image perceptual-hash dedup (aHash: raster for decodable payloads, codepoint fallback)")

  // -------------------------------------------------------------------
  // X5 semi-structured props: JSON extraction on events, aggregated per
  // event type. from_json with an explicit schema (never schema
  // inference at scale).
  // -------------------------------------------------------------------
  val eventsProps: QueryDef = QueryDef(
    build = (s, d) =>
      graft.sources.EventsSource.events(s, d)
        .withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
          .getField("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), round(avg("k"), 6).as("avg_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type"),
    oracle = Some(
      """SELECT event_type, count(*)::BIGINT AS cnt,
        |       round(avg(k), 6) AS avg_k, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
    doc = "X5 JSON props extraction (from_json with explicit schema)")

  // -------------------------------------------------------------------
  // Relational coverage (§2.2): grouped aggregation over the fact table
  // (TPC-H Q1 shape) …
  // -------------------------------------------------------------------
  val pricingSummary: QueryDef = QueryDef(
    build = (s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    oracle = Some(
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(l_extendedprice), 4) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(avg(l_extendedprice), 6) AS avg_price,
        |       count(*)::BIGINT AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    doc = "relational: grouped agg over the fact table (TPC-H Q1 shape)")

  // … and a multi-way join: fact-side shuffle join on orderkey, dimension
  // sides broadcast (customer/nation are small by star-schema design).
  val revenueByNation: QueryDef = QueryDef(
    build = (s, d) => {
      val l = s.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val o = s.read.parquet(s"$d/orders.parquet").select("o_orderkey", "o_custkey")
      val c = s.read.parquet(s"$d/customer.parquet").select("c_custkey", "c_nationkey")
      val n = s.read.parquet(s"$d/nation.parquet").select("n_nationkey", "n_name")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("nation")
    },
    oracle = Some(
      """SELECT n.n_name AS nation,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
        |       count(*)::BIGINT AS cnt
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY nation""".stripMargin),
    doc = "relational: multi-way join (shuffle on fact key, broadcast dims)")

  // -------------------------------------------------------------------
  // Sessionization: gap-based sessions per user over the event stream —
  // lag + conditional cumulative sum, the canonical windowed pattern.
  // Partitions are per-user (bounded); no global window.
  // -------------------------------------------------------------------
  private val GAP_MIN = 30
  val sessionize: QueryDef = QueryDef(
    build = (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      graft.sources.EventsSource.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag("us", 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull
            || col("us") - col("prev_us") > GAP_MIN * 60 * 1000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("session_start"),
          (max("us") - min("us")).as("duration_us"))
        .orderBy("user_id", "session_id")
    },
    oracle = Some(
      s"""WITH e AS (
         |  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
         |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM events
         |), marked AS (
         |  SELECT user_id, ts, event_id, us,
         |         CASE WHEN prev_us IS NULL OR us - prev_us > ${GAP_MIN * 60 * 1000000L}
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM e
         |), sessions AS (
         |  SELECT user_id, ts, us,
         |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                                ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
         |  FROM marked
         |)
         |SELECT user_id, session_id, count(*)::BIGINT AS n_events,
         |       min(ts) AS session_start,
         |       (max(us) - min(us))::BIGINT AS duration_us
         |FROM sessions GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin),
    doc = "events sessionization (30-min gap, windowed cumsum)")

  // -------------------------------------------------------------------
  // Vector analytics: per-label embedding centroids, element-wise —
  // posexplode + grouped avg (shuffle key bounded by labels × dims).
  // -------------------------------------------------------------------
  val labelCentroids: QueryDef = QueryDef(
    build = (s, d) =>
      s.read.parquet(s"$d/embeddings.parquet")
        .select(col("label").cast("long").as("label"),
          posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(round(avg("x"), 6).as("centroid_x"), count(lit(1)).as("cnt"))
        .withColumn("dim", col("dim").cast("long"))
        .orderBy("label", "dim"),
    oracle = Some(
      """SELECT label::BIGINT AS label, (g.i - 1)::BIGINT AS dim,
        |       round(avg(embedding[g.i]::DOUBLE), 6) AS centroid_x,
        |       count(*)::BIGINT AS cnt
        |FROM embeddings CROSS JOIN generate_series(1, 64) g(i)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin),
    doc = "vector analytics: per-label element-wise centroids")

  // -------------------------------------------------------------------
  // Relational coverage beyond the reference (§2.2 checklist): rollup /
  // grouping sets, semi/anti joins, set operations — all native Spark,
  // listed so the "could a reference user go further here" question has
  // a concrete, oracle-verified yes.
  // -------------------------------------------------------------------
  val rollupRevenue: QueryDef = QueryDef(
    build = (s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 4).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("cnt"), col("sum_qty"))
        .orderBy("returnflag", "linestatus"),
    oracle = Some(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(*)::BIGINT AS cnt, round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin),
    doc = "relational: rollup / grouping sets")

  // -------------------------------------------------------------------
  // pivot_revenue: relational PIVOT — revenue and row count per
  // returnflag, spread over linestatus columns. Values are enumerated
  // explicitly (F/O), so Spark skips the distinct-values pre-pass job
  // and the output schema is static; the physical plan is ONE grouped
  // aggregation (pivot lowers to conditional aggregates — map-side
  // partials, one shuffle on the groupBy key, no per-value scan).
  // -------------------------------------------------------------------
  val pivotRevenue: QueryDef = QueryDef(
    build = (s, d) => {
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      s.read.parquet(s"$d/lineitem.parquet")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(rev), 4).as("rev"), count(lit(1)).as("cnt"))
        .select(col("l_returnflag"),
          col("F_rev").as("rev_f"), col("F_cnt").as("cnt_f"),
          col("O_rev").as("rev_o"), col("O_cnt").as("cnt_o"))
        .orderBy("l_returnflag")
    },
    oracle = Some(
      """SELECT l_returnflag,
        |       round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice * (1 - l_discount) END), 4) AS rev_f,
        |       count(CASE WHEN l_linestatus = 'F' THEN 1 END)::BIGINT AS cnt_f,
        |       round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice * (1 - l_discount) END), 4) AS rev_o,
        |       count(CASE WHEN l_linestatus = 'O' THEN 1 END)::BIGINT AS cnt_o
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),
    doc = "relational: PIVOT over enumerated linestatus values (conditional aggregates, one shuffle)")

  // -------------------------------------------------------------------
  // customer_quartiles: ranking-window coverage — ntile(4) + percent_rank
  // of customer revenue within each market segment. The total order
  // (rev_milli DESC, c_custkey) is exact-integer, so both engines tile
  // identically; percent_rank's quotient is emitted as BIGINT micro
  // (floor(x·1e6 + 0.5)), never a rounded double. Revenue aggregates to
  // exact milli BEFORE ranking (o_totalprice is money-shaped — micro
  // per order, summed as BIGINT, // 1000 to milli keeps any realistic
  // customer under int64). One orders-side groupBy, a broadcast-sized
  // customer join, and one window per segment.
  // -------------------------------------------------------------------
  val customerQuartiles: QueryDef = QueryDef(
    build = (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rev = s.read.parquet(s"$d/orders.parquet")
        .select(col("o_custkey"),
          floor(col("o_totalprice") * lit(1000000.0) + lit(0.5)).as("micro"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"), sum("micro").as("sum_micro"))
        .withColumn("rev_milli", expr("sum_micro DIV 1000"))
      val cust = s.read.parquet(s"$d/customer.parquet").select("c_custkey", "c_mktsegment")
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("rev_milli").desc, col("c_custkey"))
      cust.join(rev, col("c_custkey") === col("o_custkey"))
        .select(col("c_mktsegment"), col("c_custkey"), col("n_orders"), col("rev_milli"),
          ntile(4).over(w).cast("long").as("quartile"),
          floor(percent_rank().over(w) * lit(1000000.0) + lit(0.5)).as("pr_micro"))
        .orderBy("c_mktsegment", "quartile", "c_custkey")
    },
    oracle = Some(
      """WITH rev AS (
        |  SELECT o_custkey, count(*)::BIGINT AS n_orders,
        |         sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))::BIGINT AS sum_micro
        |  FROM orders GROUP BY o_custkey
        |), r2 AS (
        |  SELECT o_custkey, n_orders, sum_micro // 1000 AS rev_milli FROM rev
        |)
        |SELECT c.c_mktsegment, c.c_custkey, r.n_orders, r.rev_milli,
        |       ntile(4) OVER w AS quartile,
        |       CAST(floor(percent_rank() OVER w * 1000000.0 + 0.5) AS BIGINT) AS pr_micro
        |FROM customer c JOIN r2 r ON c.c_custkey = r.o_custkey
        |WINDOW w AS (PARTITION BY c.c_mktsegment ORDER BY r.rev_milli DESC, c.c_custkey)
        |ORDER BY c.c_mktsegment, quartile, c.c_custkey""".stripMargin),
    doc = "relational: ntile quartiles + percent_rank of customer revenue per market segment (exact-integer rank keys)")

  // -------------------------------------------------------------------
  // events_pathing: the user-journey transition matrix — corpus-wide
  // counts of (previous event type → event type) steps within each
  // user's timeline, with the per-origin transition probability (the
  // first-order Markov model funnels and next-action predictors start
  // from). One lag window per user, one grouped count; the probability
  // is truncating integer micro (cnt·1e6 DIV origin total), never a
  // rounded double. Output is |types|² rows.
  // -------------------------------------------------------------------
  val eventsPathing: QueryDef = QueryDef(
    build = (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val trans = graft.sources.EventsSource.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("from_type", lag("event_type", 1).over(byUser))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("cnt"))
      val totals = trans.groupBy("from_type").agg(sum("cnt").as("from_total"))
      trans.join(totals, "from_type")
        .select(col("from_type"), col("to_type"), col("cnt"),
          expr("cnt * 1000000 DIV from_total").as("p_micro"))
        .orderBy("from_type", "to_type")
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |  FROM events
        |), tr AS (
        |  SELECT from_type, event_type AS to_type, count(*)::BIGINT AS cnt
        |  FROM t WHERE from_type IS NOT NULL GROUP BY from_type, event_type
        |), tot AS (
        |  SELECT from_type, sum(cnt)::BIGINT AS from_total FROM tr GROUP BY from_type
        |)
        |SELECT tr.from_type, tr.to_type, tr.cnt,
        |       (tr.cnt * 1000000 // tot.from_total)::BIGINT AS p_micro
        |FROM tr JOIN tot USING (from_type)
        |ORDER BY tr.from_type, tr.to_type""".stripMargin),
    doc = "events: first-order transition matrix (prev type → type per user, integer-micro probabilities)")

  val semiAntiJoin: QueryDef = QueryDef(
    build = (s, d) => {
      val c = s.read.parquet(s"$d/customer.parquet").select("c_custkey", "c_mktsegment")
      val o = s.read.parquet(s"$d/orders.parquet")
        .filter(col("o_totalprice") > 200000.0).select("o_custkey")
      val withBig = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("with_big_order"))
      val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("without_big_order"))
      withBig.join(without, Seq("c_mktsegment"), "full")
        .select(col("c_mktsegment"),
          coalesce(col("with_big_order"), lit(0L)).as("with_big_order"),
          coalesce(col("without_big_order"), lit(0L)).as("without_big_order"))
        .orderBy("c_mktsegment")
    },
    oracle = Some(
      """WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000.0),
        |w AS (
        |  SELECT c_mktsegment, count(*)::BIGINT AS with_big_order FROM customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM big) GROUP BY c_mktsegment
        |), wo AS (
        |  SELECT c_mktsegment, count(*)::BIGINT AS without_big_order FROM customer
        |  WHERE c_custkey NOT IN (SELECT o_custkey FROM big) GROUP BY c_mktsegment
        |)
        |SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
        |       coalesce(w.with_big_order, 0)::BIGINT AS with_big_order,
        |       coalesce(wo.without_big_order, 0)::BIGINT AS without_big_order
        |FROM w FULL JOIN wo ON w.c_mktsegment = wo.c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin),
    doc = "relational: left-semi / left-anti joins")

  val setOps: QueryDef = QueryDef(
    build = (s, d) => {
      val active = graft.sources.EventsSource.meas(s, d)
        .filter(col("time") >= lit("2024-01-20 00:00:00").cast("timestamp"))
        .select("id").distinct()
      val early = graft.sources.EventsSource.meas(s, d)
        .filter(col("time") < lit("2024-01-05 00:00:00").cast("timestamp"))
        .select("id").distinct()
      val both = active.intersect(early).withColumn("set_op", lit("both"))
      val lateOnly = active.except(early).withColumn("set_op", lit("late_only"))
      val earlyOnly = early.except(active).withColumn("set_op", lit("early_only"))
      both.unionByName(lateOnly).unionByName(earlyOnly)
        .orderBy("set_op", "id")
    },
    oracle = Some(
      s"""${graft.sources.Sql.MEAS_CTE},
         |active AS (SELECT DISTINCT id FROM meas WHERE time >= TIMESTAMP '2024-01-20 00:00:00'),
         |early AS (SELECT DISTINCT id FROM meas WHERE time < TIMESTAMP '2024-01-05 00:00:00')
         |SELECT id, set_op FROM (
         |  SELECT id, 'both' AS set_op FROM (SELECT id FROM active INTERSECT SELECT id FROM early)
         |  UNION ALL
         |  SELECT id, 'late_only' FROM (SELECT id FROM active EXCEPT SELECT id FROM early)
         |  UNION ALL
         |  SELECT id, 'early_only' FROM (SELECT id FROM early EXCEPT SELECT id FROM active)
         |)
         |ORDER BY set_op, id""".stripMargin),
    doc = "relational: intersect / except set operations")

  // -------------------------------------------------------------------
  // Running (cumulative) revenue per customer — the canonical ordered-
  // window aggregate. Prices are converted to integer cents BEFORE the
  // cumulative sum: a running DOUBLE sum is order-sensitive in the last
  // ulp and engines differ in windowed-aggregation strategy (sequential
  // vs segment tree), so a rounded-DOUBLE running total is a latent
  // cross-engine hash mismatch; BIGINT cents are exact. Window is
  // bounded per customer key — no global ordering.
  // -------------------------------------------------------------------
  private val RUNNING_CUST_MAX = 200L

  val runningRevenue: QueryDef = QueryDef(
    build = (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      s.read.parquet(s"$d/orders.parquet")
        .filter(col("o_custkey") < RUNNING_CUST_MAX)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice") * 100.0).cast("long").as("cents"))
        .withColumn("running_cents", sum("cents").over(w))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    oracle = Some(
      s"""WITH o AS (
         |  SELECT o_custkey, o_orderdate, o_orderkey,
         |         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
         |  FROM orders WHERE o_custkey < $RUNNING_CUST_MAX
         |)
         |SELECT o_custkey, o_orderdate, o_orderkey, cents,
         |       sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)::BIGINT
         |         AS running_cents
         |FROM o ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin),
    doc = "relational: per-customer running revenue (bounded ordered window, integer cents)")

  // Declared ABOVE `defs`: building the map forces the lazy QueryDefs
  // below, whose oracle strings interpolate this at that moment — a
  // constant declared after `defs` would still read 0.
  private val FUNNEL_US = 24L * 3600L * 1000000L

  // -------------------------------------------------------------------
  // Market-basket affinity: part pairs co-occurring in the same order,
  // ranked by support — the classic co-occurrence mine (the
  // data-mixing / recommender analog of "what appears with what" at
  // fact scale). The self-join key is l_orderkey, so the pair fan-out
  // per order is bounded by BASKET size (≤7 lines in TPC-H-shaped
  // data): pair volume is Σ k(k-1)/2 per order — ∝ lineitem, never
  // |parts|². Plan: one co-partitioned self-join shuffle on orderkey,
  // one grouped shuffle on the pair key, TakeOrdered for the top-25
  // (total deterministic order: support desc, then both keys).
  // -------------------------------------------------------------------
  val basketPairs: QueryDef = QueryDef(
    build = (s, d) => {
      // repartition on the JOIN key before the (ok, pk) dedup: a
      // HashPartitioning(ok) satisfies the dedup's ClusteredDistribution
      // (ok is a subset of its keys) AND the self-join's requirement, so
      // ONE lineitem exchange serves both — the (ok, pk)-keyed dedup
      // shape would re-exchange on ok for the sort-merge join at scale
      val l = s.read.parquet(s"$d/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .repartition(col("ok"))
        .dropDuplicates("ok", "pk")
      l.as("a").join(l.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
        .groupBy("part_a", "part_b")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(25)
    },
    oracle = Some(
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), p AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk
        |)
        |SELECT part_a, part_b, count(*)::BIGINT AS n_orders
        |FROM p GROUP BY part_a, part_b
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 25""".stripMargin),
    doc = "relational: market-basket co-occurrence (orderkey self-join, basket-bounded fan-out, top-25 by support)")

  val defs: Map[String, QueryDef] = Map(
    "basket_pairs"    -> basketPairs,
    "multimodal_meta" -> multimodalMeta,
    "dedup_phash" -> phashDedup,
    "events_props"    -> eventsProps,
    "pricing_summary" -> pricingSummary,
    "revenue_by_nation" -> revenueByNation,
    "sessionize"      -> sessionize,
    "label_centroids" -> labelCentroids,
    "rollup_revenue"  -> rollupRevenue,
    "pivot_revenue"   -> pivotRevenue,
    "customer_quartiles" -> customerQuartiles,
    "events_pathing"  -> eventsPathing,
    "semi_anti_join"  -> semiAntiJoin,
    "set_ops"         -> setOps,
    "cohort_retention" -> cohortRetention,
    "running_revenue" -> runningRevenue,
    "events_funnel"   -> eventsFunnel,
  )

  // -------------------------------------------------------------------
  // Cohort retention: users grouped by first-activity week, counted per
  // week offset they remained active — the canonical events-pipeline
  // analysis (two grouped aggs + a join on the user key).
  // -------------------------------------------------------------------
  lazy val cohortRetention: QueryDef = QueryDef(
    build = (s, d) => {
      val ev = graft.sources.EventsSource.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        .distinct()
      val first = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
      ev.join(first, "user_id")
        .withColumn("week_offset",
          ((unix_micros(col("week")) - unix_micros(col("cohort_week"))) / (7L * 86400L * 1000000L))
            .cast("long"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("active_users"))
        .orderBy("cohort_week", "week_offset")
    },
    oracle = Some(
      """WITH ev AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS week FROM events
        |), first AS (
        |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
        |)
        |SELECT f.cohort_week, ((epoch_us(e.week) - epoch_us(f.cohort_week)) // (7::BIGINT * 86400 * 1000000))::BIGINT AS week_offset,
        |       count(*)::BIGINT AS active_users
        |FROM ev e JOIN first f ON e.user_id = f.user_id
        |GROUP BY f.cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin),
    doc = "events cohort retention (first-activity week × active-week offset)")

  // -------------------------------------------------------------------
  // Funnel: first click → first qualifying purchase within a 24h
  // horizon, per user. Stage 2 is a conditional argmin over the joined
  // purchases — the left join and the regroup share the user_id hash
  // partitioning (group keys are a superset of the join key), so the
  // whole funnel is ONE shuffle of each input on user_id; no window.
  // -------------------------------------------------------------------
  lazy val eventsFunnel: QueryDef = QueryDef(
    build = (s, d) => {
      val ev = graft.sources.EventsSource.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min("ts").as("first_click"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      val qualifies = col("ts") >= col("first_click") &&
        unix_micros(col("ts")) - unix_micros(col("first_click")) <= lit(FUNNEL_US)
      clicks.join(purchases, Seq("user_id"), "left")
        .groupBy("user_id", "first_click")
        .agg(min(when(qualifies, col("ts"))).as("first_purchase"))
        .select(col("user_id"), col("first_click"), col("first_purchase"),
          when(col("first_purchase").isNotNull, 1L).otherwise(0L).as("converted"),
          (unix_micros(col("first_purchase")) - unix_micros(col("first_click"))).as("delay_us"))
        .orderBy("user_id")
    },
    oracle = Some(
      s"""WITH c AS (
         |  SELECT user_id, min(ts) AS first_click FROM events
         |  WHERE event_type = 'click' GROUP BY user_id
         |), p AS (
         |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
         |), f AS (
         |  SELECT c.user_id, c.first_click,
         |         min(CASE WHEN p.ts >= c.first_click
         |                   AND epoch_us(p.ts) - epoch_us(c.first_click) <= $FUNNEL_US
         |                  THEN p.ts END) AS first_purchase
         |  FROM c LEFT JOIN p ON c.user_id = p.user_id
         |  GROUP BY c.user_id, c.first_click
         |)
         |SELECT user_id, first_click, first_purchase,
         |       CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END::BIGINT AS converted,
         |       epoch_us(first_purchase) - epoch_us(first_click) AS delay_us
         |FROM f ORDER BY user_id""".stripMargin),
    doc = "events funnel: first click → first purchase within 24h, per user (one shuffle)")
}
