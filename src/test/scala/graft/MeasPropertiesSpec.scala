package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.Meas

/** Property-style specs on generated Meas sets (SURVEY.md §5.3). The
  * scalatest↔scalacheck bridge isn't available offline, so cases are
  * drawn directly from ScalaCheck generators with fixed seeds.
  */
class MeasPropertiesSpec extends SparkSpec {

  private val measGen: Gen[List[Meas]] = Gen.listOfN(200, for {
    id <- Gen.choose(1L, 8L)
    t <- Gen.choose(0L, 1000L)
    v <- Gen.choose(-1000.0, 1000.0)
    flag <- Gen.oneOf(1L, 2L, 4L, 8L, 16L)
    seq <- Gen.choose(0L, 1000000L)
  } yield Meas(id, new java.sql.Timestamp(1700000000000L + t * 60000L), v, flag, seq))

  private def cases(n: Int): Seq[List[Meas]] =
    (1 to n).map(i => measGen(Gen.Parameters.default, Seed(42L + i))
      .getOrElse(sys.error("gen failed")))

  test("property: interval split counts add up for arbitrary data") {
    for (ms <- cases(5)) {
      val df = spark.createDataFrame(ms).cache()
      val lo = 1700000000000L + 200 * 60000L
      val mid = 1700000000000L + 500 * 60000L
      val hi = 1700000000000L + 800 * 60000L
      def ts(x: Long) = new java.sql.Timestamp(x)
      val whole = df.filter(col("time").between(lit(ts(lo)), lit(ts(hi)))).count()
      val l = df.filter(col("time").between(lit(ts(lo)), lit(ts(mid)))).count()
      val r = df.filter(col("time") > lit(ts(mid)) && col("time") <= lit(ts(hi))).count()
      df.unpersist()
      assert(whole === l + r)
    }
  }

  test("property: compaction (freshest per (id,time)) is idempotent") {
    for (ms <- cases(5)) {
      val df = spark.createDataFrame(ms)
      def compactOnce(d: org.apache.spark.sql.DataFrame) =
        d.groupBy("id", "time")
          .agg(max_by(struct(col("value"), col("flag"), col("seq")), col("seq")).as("m"))
          .select(col("id"), col("time"), col("m.value").as("value"),
            col("m.flag").as("flag"), col("m.seq").as("seq"))
      val once = compactOnce(df).cache()
      val twice = compactOnce(once)
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
      once.unpersist()
    }
  }

  test("property: pruned raw-ns interval source ≡ filter on derived time, random µs bounds") {
    import graft.core.TimeBounds
    import graft.sources.EventsSource
    val utc = java.time.ZoneOffset.UTC
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    def str(us: Long) =
      java.time.LocalDateTime.ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000, utc).format(fmt)
    def tstamp(us: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

    // bounds with arbitrary sub-second µs components — the ns→µs
    // truncation edge is exactly where a second copy of the bound
    // arithmetic would drift
    val boundsGen: Gen[(Long, Long)] = for {
      startSec <- Gen.choose(1704067200L, 1706745600L) // 2024-01-01 .. 2024-02-01
      microFrom <- Gen.choose(0L, 999999L)
      lenUs <- Gen.choose(0L, 7L * 86400L * 1000000L)
    } yield {
      val f = startSec * 1000000L + microFrom
      (f, f + lenUs)
    }
    val all = EventsSource.meas(spark, sfDir).cache()
    for (i <- 1 to 8) {
      val (fUs, tUs) = boundsGen(Gen.Parameters.default, Seed(1000L + i))
        .getOrElse(sys.error("gen failed"))
      assert(TimeBounds.micros(str(fUs)) === fUs, "string round-trip must be exact")
      val pruned = EventsSource.measInInterval(spark, sfDir, str(fUs), str(tUs))
      val filtered = all.filter(col("time").between(lit(tstamp(fUs)), lit(tstamp(tUs))))
      assert(pruned.exceptAll(filtered).isEmpty && filtered.exceptAll(pruned).isEmpty,
        s"pruned ≠ filtered for [$fUs, $tUs] µs")
    }
    // sharpest edge: an ACTUAL stored event time used as both interval
    // ends — inclusion must hold. ns encoding: pick one with a non-zero
    // ns remainder (the truncation edge). µs encoding: any stored
    // instant (the point window is exact by construction).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawTs = spark.read.parquet(s"$sfDir/events.parquet").select(col("ts"))
    val us = rawTs.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        rawTs.filter(col("ts") % 1000L =!= 0L).head().getLong(0) / 1000L
      case _ =>
        val ldt = rawTs.head().getAs[java.time.LocalDateTime]("ts")
        ldt.toInstant(utc).getEpochSecond * 1000000L + ldt.getNano / 1000L
    }
    val point = EventsSource.measInInterval(spark, sfDir, str(us), str(us))
    assert(point.filter(col("time") === lit(tstamp(us))).count() >= 1,
      "a measurement must be included when the interval ends at its stored µs instant")
    all.unpersist()
  }

  test("property: per-id stat respects global min/max") {
    for (ms <- cases(5)) {
      val df = spark.createDataFrame(ms)
      val g = df.agg(min("value"), max("value")).head()
      val per = df.groupBy("id").agg(min("value").as("mn"), max("value").as("mx"))
      assert(per.filter(col("mn") < g.getDouble(0) || col("mx") > g.getDouble(1)).count() === 0L)
    }
  }
}
