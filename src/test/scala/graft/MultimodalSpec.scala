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

  test("resize clamps the long edge and preserves payload histograms") {
    val rows = Multimodal.mediaRows(spark, sfDir)
    val resized = Multimodal.resize(rows, maxDim = 128).cache()
    val bad = resized.filter(r => math.max(r.width, r.height) > 128 && r.scale < 1.0)
    assert(bad.count() === 0L)
    assert(resized.count() === rows.count())
    resized.unpersist()
  }

  test("frame sampling emits strided frames with exact payload coverage for stride 1") {
    val rows = Multimodal.mediaRows(spark, sfDir)
    val frames = Multimodal.sampleFrames(rows, frameSize = 100, stride = 1).cache()
    // stride-1 frames reassemble the payload byte count
    val frameBytes = frames.toDF()
      .agg(sum(length(col("frame_bytes")))).head().getLong(0)
    val realBytes = Multimodal.extractFeatures(rows).toDF()
      .agg(sum("byte_len")).head().getLong(0)
    assert(frameBytes === realBytes)
    // stride 3 is a strict subset
    val strided = Multimodal.sampleFrames(rows, frameSize = 100, stride = 3)
    assert(strided.count() < frames.count())
    frames.unpersist()
  }
}
