package graft

import org.apache.spark.sql.functions._

import graft.core.Meas
import graft.operators.CoreQueries
import graft.sources.EventsSource

/** Reference-semantics specs mirroring the upstream unit-test pattern
  * (SURVEY.md §5): boundary inclusion, as-of/_NO_DATA behavior, merge
  * freshness, permutation invariance.
  */
class OperatorSpec extends SparkSpec {

  private def meas = EventsSource.meas(spark, sfDir)

  test("readInterval: both interval ends are inclusive") {
    val any = meas.orderBy("time").limit(1).head()
    val t = any.getTimestamp(1)
    val hit = meas.filter(col("time").between(lit(t), lit(t)))
    assert(hit.count() >= 1, "a point interval [t, t] must match the measurement at t")
  }

  test("readInterval splits: [a,m] ∪ (m,b] == [a,b]") {
    val a = "2024-01-05 00:00:00"; val m = "2024-01-12 00:00:00"; val b = "2024-01-25 00:00:00"
    def cnt(c: org.apache.spark.sql.Column) = meas.filter(c).count()
    val whole = cnt(col("time").between(lit(a).cast("timestamp"), lit(b).cast("timestamp")))
    val left = cnt(col("time").between(lit(a).cast("timestamp"), lit(m).cast("timestamp")))
    val right = cnt(col("time") > lit(m).cast("timestamp") && col("time") <= lit(b).cast("timestamp"))
    assert(whole === left + right)
  }

  test("readTimePoint yields exactly one row per known series, _NO_DATA when empty") {
    val res = CoreQueries.readTimePoint.build(spark, sfDir).cache()
    val nSeries = EventsSource.scheme(spark, sfDir).count()
    assert(res.count() === nSeries)
    val noData = res.filter(col("flag") === Meas.NO_DATA)
    assert(noData.filter(col("value").isNotNull).count() === 0L)
    // every non-NO_DATA row must be at or before the time point
    assert(res.filter(col("flag") =!= Meas.NO_DATA
      && col("time") > lit(CoreQueries.TP).cast("timestamp")).count() === 0L)
    res.unpersist()
  }

  test("currentValue equals readTimePoint at +infinity") {
    val cur = CoreQueries.currentValue.build(spark, sfDir)
    val viaMax = meas.groupBy("id")
      .agg(max_by(struct(col("time"), col("value"), col("flag")), struct(col("time"), col("seq"))).as("m"))
      .select(col("id"), col("m.time").as("time"), col("m.value").as("value"), col("m.flag").as("flag"))
    assert(cur.exceptAll(viaMax).isEmpty && viaMax.exceptAll(cur).isEmpty)
  }

  test("stat sum/min/max are invariant under input permutation") {
    val base = meas.groupBy("id").agg(round(sum("value"), 6).as("s"), min("value").as("mn"), max("value").as("mx"))
    val shuffled = meas.orderBy(md5(concat_ws("|", col("seq")))) // deterministic scramble
      .groupBy("id").agg(round(sum("value"), 6).as("s"), min("value").as("mn"), max("value").as("mx"))
    assert(base.exceptAll(shuffled).isEmpty && shuffled.exceptAll(base).isEmpty)
  }

  test("merge_dedup prefers the fresher level for rewritten keys") {
    val res = CoreQueries.mergeDedup.build(spark, sfDir).cache()
    // every measurement whose seq%10==0 must carry the level-1 boost
    val boosted = res.filter(col("seq") % 10 === 0)
    val orig = meas.filter(col("seq") % 10 === 0).select(col("seq"), col("value").as("v0"))
    val joined = boosted.join(orig, "seq")
    assert(joined.filter(abs(col("value") - (col("v0") + 1000.0)) > 1e-9).count() === 0L)
    assert(res.count() === meas.count(), "merge must not invent or drop keys")
    res.unpersist()
  }

  test("flag match: query flag 0 matches everything, one-hot flags partition the set") {
    val total = meas.count()
    val byFlag = (0 to 4).map(c => meas.filter(col("flag") === (1L << c)).count()).sum
    assert(byFlag === total)
  }
}
