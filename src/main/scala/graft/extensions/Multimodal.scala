package graft.extensions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.3 X5): media content rides
  * as an opaque `binary` column + typed metadata struct; decode /
  * feature-extraction runs batched per partition so a real decoder
  * amortizes model/codec init once per partition, not per row.
  *
  * Decode is REAL for the formats the JDK ships codecs for (PNG, BMP,
  * GIF, JPEG via `javax.imageio` — full pixel decode, no external
  * libraries): a payload those codecs recognize yields its true
  * dimensions and format. Payloads no JDK codec accepts (this
  * container has no ffmpeg/audio libs; the synthetic test corpus rides
  * text bytes) fall back to a deterministic fake so the pipeline shape
  * stays exercised end-to-end — that fallback is the ONLY stubbed
  * piece. Schema, encoders, partitioning, and the per-partition batch
  * loop are the production shape either way.
  */
object Multimodal {

  /** Typed media row: payload + envelope metadata. */
  case class MediaRow(doc_id: Long, content: Array[Byte], media_type: String)

  /** Extraction output: deterministic features per media item. */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      fmt: String,
      byte_histogram: Array[Long]) // 16-bucket histogram of payload bytes

  /** Decoder: real `javax.imageio` pixel decode first, deterministic
    * fake fallback for payloads no JDK codec accepts. The fake's
    * constants are the single source of truth for the fallback
    * contract — the SQL-path query (MiscQueries.multimodalMeta) and
    * its oracle derive from them too (the synthetic corpus is all
    * fallback-path, so the oracle is decoder-independent). */
  object MediaDecoder {
    val DIM_BASE = 64
    val W_MOD = 576
    val H_MOD = 416
    val H_MULT = 7
    val FRAMES_MOD = 30
    val FORMATS: Seq[String] = Seq("png", "jpeg", "webp")

    def decode(content: Array[Byte]): (Int, Int, String) =
      decodeImage(content) match {
        case Some((w, h, fmt)) => (w, h, fmt)
        case None => // deterministic fake: the audio/video/unknown-codec stand-in
          val n = content.length
          (DIM_BASE + n % W_MOD, DIM_BASE + (n * H_MULT) % H_MOD, FORMATS(n % FORMATS.size))
      }

    /** Real image decode via the JDK's own codecs (PNG/BMP/GIF/JPEG).
      * Fully decodes the pixel raster — corrupt payloads past the header
      * fail here and fall back, they don't yield half-real metadata.
      * None for formats the JDK lacks or non-image payloads. */
    def decodeImage(content: Array[Byte]): Option[(Int, Int, String)] =
      readImage(content).map { case (fmt, img) => (img.getWidth, img.getHeight, fmt) }

    /** The decoded raster itself — for pixel-level features (aHash). */
    def decodeRaster(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
      readImage(content).map(_._2)

    private def readImage(content: Array[Byte]): Option[(String, java.awt.image.BufferedImage)] =
      try {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(in)
              val fmt = r.getFormatName.toLowerCase
              val img = r.read(0) // full raster decode, not a header probe
              Some((fmt, img))
            } finally r.dispose()
          }
        } finally if (in != null) in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    // ---------------------------------------------------------------
    // Average-hash (aHash): the classic 64-bit perceptual image
    // fingerprint — downsample to an 8×8 grid, threshold each cell
    // against the global mean. Encoded as a 64-char bit string (never
    // a BIGINT: bit 63 would wrap the sign and the two engines
    // disagree on shift-overflow semantics). Thresholds use exact
    // integer cross-multiplication (cellSum·total > grandSum·cellCnt),
    // so the hash is bit-deterministic with no FP anywhere.
    //
    // Decodable payloads hash their actual pixel raster (integer luma
    // 299/587/114, each pixel binned to one grid cell). Payloads no
    // codec accepts hash their UTF-8 codepoint sequence resampled to
    // 64 cells — deterministic, and exactly mirrorable in SQL
    // (string_split + unicode in DuckDB), which is what lets the
    // synthetic all-fallback corpus carry a full hash gate for
    // `dedup_phash` while MultimodalSpec pins the raster path on real
    // PNGs.
    // ---------------------------------------------------------------
    def aHash64(content: Array[Byte]): String =
      decodeRaster(content) match {
        case Some(img) => aHashRaster(img)
        case None => aHashCodepoints(
          new String(content, java.nio.charset.StandardCharsets.UTF_8))
      }

    def aHashRaster(img: java.awt.image.BufferedImage): String = {
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val cy = (y.toLong * 8 / h).toInt
        var x = 0
        while (x < w) {
          val j = cy * 8 + (x.toLong * 8 / w).toInt
          val rgb = img.getRGB(x, y)
          val gray = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
            (rgb & 0xff) * 114L) / 1000L
          sums(j) += gray
          cnts(j) += 1
          x += 1
        }
        y += 1
      }
      thresholdBits(sums, cnts)
    }

    def aHashCodepoints(text: String): String = {
      val cps = text.codePoints.toArray
      val n = cps.length
      if (n == 0) return "0" * 64
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var i = 0
      while (i < n) {
        val j = (i.toLong * 64 / n).toInt
        sums(j) += cps(i)
        cnts(j) += 1
        i += 1
      }
      thresholdBits(sums, cnts)
    }

    private def thresholdBits(sums: Array[Long], cnts: Array[Long]): String = {
      val tot = sums.sum
      val n = cnts.sum
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < 64) {
        sb.append(if (sums(j) * n > tot * cnts(j)) '1' else '0')
        j += 1
      }
      sb.toString
    }

    /** Hamming distance between two 64-char bit strings. */
    def hamming(a: String, b: String): Int =
      (0 until 64).count(i => a.charAt(i) != b.charAt(i))
  }

  /** Lift the documents table into typed media rows (text bytes stand in
    * for media payloads; schema/encoders are the real thing). */
  def mediaRows(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("content"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
          .as("media_type"))
      .as[MediaRow]
  }

  /** Batched per-partition feature extraction. The iterator-in /
    * iterator-out shape means constant memory per partition and one
    * decoder init per partition — the mapInPandas-equivalent batch
    * contract, Scala-native. */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition decoder/model init would go here (once, not per row)
      it.map { r =>
        val (w, h, fmt) = MediaDecoder.decode(r.content)
        val hist = new Array[Long](16)
        var i = 0
        while (i < r.content.length) { hist((r.content(i) & 0xff) >> 4) += 1; i += 1 }
        MediaFeatures(r.doc_id, r.media_type, r.content.length.toLong, w, h, fmt, hist)
      }
    }
  }

  /** End-to-end: documents → typed media → batched extract, as a
    * DataFrame for downstream relational composition. */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaRows(spark, sfDir)).toDF()

  /** Resized "image": the stub scales the fake dimensions and re-buckets
    * the histogram — the payload transform slot where a real resampler
    * plugs in. Same batched iterator contract. */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int, scale: Double, byte_histogram: Array[Long])
  def resize(rows: Dataset[MediaRow], maxDim: Int): Dataset[ResizedMedia] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val (w, h, _) = MediaDecoder.decode(r.content)
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val hist = new Array[Long](16)
        var i = 0
        while (i < r.content.length) { hist((r.content(i) & 0xff) >> 4) += 1; i += 1 }
        ResizedMedia(r.doc_id, math.round(w * scale).toInt, math.round(h * scale).toInt, scale, hist)
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th chunk of the
    * payload stands in for a decoded frame; emits (doc_id, frame_idx,
    * frame_bytes) — the explode-shaped output a real frame sampler has.
    * Constant memory per partition (iterator chaining, no buffering). */
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])
  def sampleFrames(rows: Dataset[MediaRow], frameSize: Int, stride: Int): Dataset[Frame] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = math.max(1, (r.content.length + frameSize - 1) / frameSize)
        (0 until nFrames by stride).iterator.map { f =>
          val from = f * frameSize
          val until = math.min(from + frameSize, r.content.length)
          Frame(r.doc_id, f, java.util.Arrays.copyOfRange(r.content, from, until))
        }
      }
    }
  }
}
