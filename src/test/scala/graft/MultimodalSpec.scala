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

  test("real PNG/BMP payloads decode to true dimensions via the JDK codec path") {
    import spark.implicits._
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val png = imageBytes(37, 21, "png")
    val bmp = imageBytes(8, 300, "bmp")
    // a payload that LOOKS like a PNG but is corrupt past the signature
    val corrupt = png.take(16) ++ Array.fill[Byte](64)(0x5a)
    val rows = Seq(
      Multimodal.MediaRow(1L, png, "image"),
      Multimodal.MediaRow(2L, bmp, "image"),
      Multimodal.MediaRow(3L, corrupt, "image")).toDS()
    val feats = Multimodal.extractFeatures(rows).collect().map(f => f.doc_id -> f).toMap
    assert((feats(1L).width, feats(1L).height, feats(1L).fmt) === (37, 21, "png"))
    assert((feats(2L).width, feats(2L).height, feats(2L).fmt) === (8, 300, "bmp"))
    // corrupt raster falls back to the deterministic fake, never half-real
    val n = corrupt.length
    val D = Multimodal.MediaDecoder
    assert((feats(3L).width, feats(3L).height) === (D.DIM_BASE + n % D.W_MOD, D.DIM_BASE + (n * D.H_MULT) % D.H_MOD))
    // resize operates on the REAL dimensions for decodable payloads
    val resized = Multimodal.resize(rows, maxDim = 10).collect().map(r => r.doc_id -> r).toMap
    assert(resized(2L).height === 10 && resized(2L).scale === 10.0 / 300.0)
  }

  test("synthetic text payloads are all fallback-path (multimodal_meta oracle independence)") {
    // the gated multimodal_meta query derives width/height from the fake
    // constants in SQL; that is only sound while no corpus payload decodes
    // as a real image — pin it
    val rows = Multimodal.mediaRows(spark, sfDir)
    val real = rows.filter(r => Multimodal.MediaDecoder.decodeImage(r.content).isDefined)
    assert(real.count() === 0L, "a decodable corpus payload would desync the SQL-path oracle")
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
