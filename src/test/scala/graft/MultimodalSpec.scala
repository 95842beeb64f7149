package graft

import org.apache.spark.sql.functions._

import graft.extensions.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media pipeline: typed rows → batched extract, deterministic features") {
    val rows = Multimodal.mediaRows(spark, sfDir)
    val feats = Multimodal.extractFeatures(rows).cache()
    assert(feats.count() === rows.count())
    // histogram mass == payload length (no bytes lost in batching)
    val broken = feats.toDF()
      .withColumn("mass", expr("aggregate(byte_histogram, 0L, (a, x) -> a + x)"))
      .filter(col("mass") =!= col("byte_len"))
    assert(broken.count() === 0L)
    // deterministic: a second run is bit-identical
    val again = Multimodal.extractFeatures(rows)
    assert(feats.toDF().exceptAll(again.toDF()).isEmpty)
    feats.unpersist()
  }

  test("features stay partition-count-stable (batch contract, no repartition surprises)") {
    val rows = Multimodal.mediaRows(spark, sfDir).repartition(3)
    val feats = Multimodal.extractFeatures(rows)
    assert(feats.rdd.getNumPartitions === 3)
  }
}
