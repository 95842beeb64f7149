package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewTools
import graft.sources.EventsSource

class SkewToolsSpec extends SparkSpec {

  test("salted two-phase stat equals the direct grouped aggregation on a skewed input") {
    // manufacture skew: replicate one series' rows 50×
    val meas = EventsSource.meas(spark, sfDir)
    val hot = meas.limit(1).select("id").head().getLong(0)
    val skewed = meas.unionByName(
      (1 to 49).map(i => meas.filter(col("id") === hot).withColumn("seq", col("seq") + i * 1000000L))
        .reduce(_ unionByName _))

    val direct = skewed.groupBy(col("id").as("k"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
        min("value").as("min_value"), max("value").as("max_value"))
    val salted = SkewTools.saltedStat(skewed, col("id"), col("value"), col("seq"), salts = 8)

    val joined = direct.withColumnRenamed("cnt", "d_cnt")
      .withColumnRenamed("sum_value", "d_sum")
      .withColumnRenamed("min_value", "d_mn").withColumnRenamed("max_value", "d_mx")
      .join(salted, "k")
    assert(joined.count() === direct.count())
    val bad = joined.filter(col("d_cnt") =!= col("cnt")
      || abs(col("d_sum") - col("sum_value")) > 1e-6
      || col("d_mn") =!= col("min_value") || col("d_mx") =!= col("max_value"))
    assert(bad.count() === 0L)
    // the hot key really was spread: its partials existed on >1 salt
    val hotSalts = skewed.filter(col("id") === hot)
      .select(pmod(hash(col("seq")), lit(8)).as("s")).distinct().count()
    assert(hotSalts > 1)
  }
}
