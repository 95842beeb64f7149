package graft

import org.apache.spark.sql.functions._

import graft.sources.EventsSource

/** Proves the co-located-join story: two stores bucketed the same way
  * on the series id join WITHOUT any shuffle exchange — the layout
  * (SURVEY.md §4.2 per-series clustering) is what makes repeated
  * fact-fact joins affordable at scale.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two id-bucketed tables plans no shuffle exchange") {
    val meas = EventsSource.meas(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS graft_b1")
    spark.sql("DROP TABLE IF EXISTS graft_b2")
    meas.write.bucketBy(8, "id").sortBy("id", "time")
      .mode("overwrite").saveAsTable("graft_b1")
    meas.groupBy("id").agg(avg("value").as("id_avg"))
      .write.bucketBy(8, "id").mode("overwrite").saveAsTable("graft_b2")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join path
    try {
      val joined = spark.table("graft_b1").join(spark.table("graft_b2"), "id")
        .filter(col("value") > col("id_avg"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_b1")
      spark.sql("DROP TABLE IF EXISTS graft_b2")
    }
  }
}
