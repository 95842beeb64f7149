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

  test("aHash: re-encoded image identical, perturbation near, different image far") {
    val D = Multimodal.MediaDecoder
    def img(w: Int, h: Int)(px: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val i = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => i.setRGB(x, y, px(x, y))))
      i
    }
    def png(i: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", out)
      out.toByteArray
    }
    // a half-dark / half-light gradient — structured, not flat
    val a = img(64, 48)((x, y) => if (x < 32) 0x101010 + y else 0xe0e0e0 - y)
    val hashA = D.aHash64(png(a))
    // PNG is lossless: a decode→re-encode round trip hashes identically
    val roundTrip = png(D.decodeRaster(png(a)).get)
    assert(D.aHash64(roundTrip) === hashA, "lossless re-encode must not move the hash")
    // perturb one 8×6 corner block: at most a few grid cells flip
    val aTweaked = img(64, 48)((x, y) =>
      if (x < 8 && y < 6) 0xffffff else if (x < 32) 0x101010 + y else 0xe0e0e0 - y)
    val dNear = D.hamming(D.aHash64(png(aTweaked)), hashA)
    assert(dNear > 0 && dNear <= 6, s"corner tweak moved $dNear bits")
    // an unrelated structure (inverted halves) is far
    val b = img(64, 48)((x, y) => if (x >= 32) 0x101010 + y else 0xe0e0e0 - y)
    val dFar = D.hamming(D.aHash64(png(b)), hashA)
    assert(dFar > 20, s"structurally different image only $dFar bits away")
    // the raster path is what hashed these (not the codepoint fallback)
    assert(D.decodeRaster(png(a)).isDefined)
  }

  test("dedup_phash groups identical payloads and leaves the rest singleton") {
    import spark.implicits._
    val dir = tmpDir("graft-phash")
    // docs 0 and 7 share identical text → identical fallback aHash
    val txt = (0 until 10).map(i => if (i == 7) "copy copy copy shared payload"
      else if (i == 0) "copy copy copy shared payload" else s"unique document number $i with drift ${"z" * i}")
    txt.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("dedup_phash")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L)._2 === 0L && got(7L)._2 === 0L, "identical payloads share the min-id rep")
    assert(got(0L)._3 === 2L && got(7L)._3 === 2L)
    assert(got(0L)._1 === got(7L)._1)
    (1 until 7).foreach(i => assert(got(i.toLong)._3 === 1L, s"doc $i singleton"))
  }
}
