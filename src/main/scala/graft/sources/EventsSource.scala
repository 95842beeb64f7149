package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maps the driver's `events` table onto the reference's Meas model
  * (SURVEY.md §1.4): each (user_id, event_type) pair is one time series.
  *
  *   series id  := user_id * 8 + type_code          (stable, invertible)
  *   time       := ts
  *   value      := value
  *   flag       := 1 << type_code                   (one-hot event type)
  *   seq        := event_id                         (freshness tiebreaker)
  *
  * The encoding is deliberately arithmetic (not hashed) so the DuckDB
  * oracle can reproduce it exactly; `Sql.TYPE_CASE`/`Sql.MEAS_CTE` are the
  * SQL mirrors of the expressions here. Keep the two in lockstep.
  */
object EventsSource {

  /** Event type → small code. Mirrored by [[Sql.TYPE_CASE]]. */
  val typeCodeSql: String =
    "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 " +
      "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END"

  /** `events.ts` has shipped in two physical encodings across driver
    * generations: TIMESTAMP(NANOS) — which Spark's parquet reader
    * rejects, so it's read as raw nanos (legacy conf) and floor-divided
    * to microseconds, exactly DuckDB's ns→µs truncation — and plain
    * timestamp[us] (isAdjustedToUTC=false), which Spark reads as
    * TIMESTAMP_NTZ. Normalize both to session-TZ TIMESTAMP: every
    * entrypoint pins `spark.sql.session.timeZone=UTC`, so the NTZ cast
    * is value-identity and both encodings land on the same µs instants
    * the oracle sees.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** ts-encoding dispatch (see [[events]]); keep every reader on this. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }

  /** The single definition of the events→Meas projection (kept in
    * lockstep with [[Sql.MEAS_CTE]]). */
  private def toMeas(df: DataFrame): DataFrame =
    df.select(
      (col("user_id") * 8 + expr(typeCodeSql)).cast("long").as("id"),
      col("ts").as("time"),
      col("value"),
      expr(s"shiftleft(1, $typeCodeSql)").cast("long").as("flag"),
      col("event_id").as("seq"),
    )

  /** The canonical Meas view of the events table. */
  def meas(spark: SparkSession, sfDir: String): DataFrame =
    toMeas(events(spark, sfDir))

  /** Interval-pruned Meas view: the [from, to] predicate (inclusive,
    * µs-truncated time semantics) is applied to the RAW stored column
    * before any projection, so it pushes down to the parquet scan and
    * prunes row groups — the chunk-footer-index analog that a filter on
    * the derived `time` column cannot give (Catalyst can't push
    * predicates through `timestamp_micros(ts div 1000)` or an NTZ cast).
    * ns encoding: half-open raw-ns window from [[graft.core.TimeBounds]]
    * — the one definition shared with every caller and pinned by
    * property tests. µs encoding: the bounds ARE µs instants, so the
    * inclusive window is two NTZ literals, pushed down as-is.
    */
  def measInInterval(spark: SparkSession, sfDir: String, from: String, to: String): DataFrame = {
    import graft.core.TimeBounds
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val pruned = raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") >= TimeBounds.nsLower(from) && col("ts") < TimeBounds.nsUpperExclusive(to))
      case _ =>
        raw.filter(col("ts") >= lit(TimeBounds.localDateTime(from)) &&
          col("ts") <= lit(TimeBounds.localDateTime(to)))
    }
    toMeas(normalizeTs(pruned))
  }

  /** Series catalog [U: libdariadb/scheme/scheme.h — class Scheme]:
    * name <-> id mapping, derived from the distinct (user, type) pairs.
    * Small by construction (|users| × |types|) → always broadcastable.
    */
  def scheme(spark: SparkSession, sfDir: String): DataFrame = {
    val code = expr(typeCodeSql)
    events(spark, sfDir)
      .select(
        (col("user_id") * 8 + code).cast("long").as("series_id"),
        col("user_id"),
        col("event_type"),
        concat(lit("u"), col("user_id").cast("string"), lit("."), col("event_type")).as("name"),
      )
      .distinct()
  }
}

/** Shared SQL fragments for DuckDB oracles. These must stay semantically
  * identical to the Spark expressions in [[EventsSource]].
  */
object Sql {
  val TYPE_CASE: String = EventsSource.typeCodeSql

  /** CTE exposing the canonical `meas` view to oracle SQL. */
  val MEAS_CTE: String =
    s"""WITH meas AS (
       |  SELECT (user_id * 8 + $TYPE_CASE)::BIGINT AS id,
       |         ts AS time,
       |         value,
       |         (1 << $TYPE_CASE)::BIGINT AS flag,
       |         event_id AS seq
       |  FROM events
       |)""".stripMargin

  /** CTE for the series catalog (mirrors [[EventsSource.scheme]]). */
  val SCHEME_CTE: String =
    s"""scheme AS (
       |  SELECT DISTINCT (user_id * 8 + $TYPE_CASE)::BIGINT AS series_id,
       |         user_id, event_type,
       |         'u' || user_id::VARCHAR || '.' || event_type AS name
       |  FROM events
       |)""".stripMargin
}
