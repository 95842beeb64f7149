package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingSpans

/** Streaming duplicated-window marks must equal the batch keep-first
  * marking for in-order streams — including across micro-batch
  * boundaries (a copy arriving later still marks; the first copy never
  * retro-marks).
  */
class StreamingSpansSpec extends SparkSpec {

  private val K = 8
  private def fill(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"u${tag}_$i")
  private val runA = (0 until 12).map(i => s"a$i")

  // docs 0/3 share runA (doc 0 first); doc 1 unique; doc 2 repeats runA
  // twice INSIDE itself only at first (still unique content corpus-wide
  // until doc 3 arrives… no: doc 2 also carries runA → 0 is first, 2 and
  // 3 are later copies); doc 4 has nothing shared
  private val corpus: Seq[(Long, Seq[String])] = Seq(
    0L -> (fill("x", 4) ++ runA ++ fill("y", 4)),
    1L -> fill("q", 25),
    2L -> (runA ++ fill("g", 9)),
    3L -> (fill("z", 7) ++ runA),
    4L -> fill("w", 20),
  )

  /** Naive reference: all K-windows, contents in ≥2 docs, min doc kept. */
  private def expectedMarks: Set[(Long, Long)] = {
    val wins = for {
      (d, ts) <- corpus; p <- 0 to ts.length - K
    } yield (d, p.toLong, ts.slice(p, p + K).mkString(" "))
    val dup = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
    val first = dup.map { case (c, ws) => c -> ws.map(_._1).min }
    wins.collect { case (d, p, c) if dup.contains(c) && first(c) != d => (d, p) }.toSet
  }

  test("streaming marks ≡ batch keep-first marking, across micro-batches") {
    val src = tmpDir("graft-sspans-src")
    val ckpt = tmpDir("graft-sspans-ckpt")
    def write(ids: Set[Long]): Unit =
      spark.createDataFrame(
        corpus.filter(c => ids(c._1)).map { case (d, ts) =>
          (d, ts.mkString(" "), new java.sql.Timestamp(1000L * (d + 1)))
        }).toDF("doc_id", "text", "ingest_ts")
        .coalesce(1).write.mode("append").parquet(src)

    // first micro-batch: docs 0–2 (doc 2's runA copy must mark against
    // doc 0 WITHIN the batch); second: docs 3–4 (doc 3 marks against
    // the STATE carried over, not against any in-batch row)
    write(Set(0L, 1L, 2L))
    val q = StreamingSpans.start(spark, src, "sspans_sink", ckpt)
    try {
      q.processAllAvailable()
      val afterFirst = spark.table("sspans_sink")
        .select("doc_id", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterFirst === expectedMarks.filter(_._1 <= 2),
        "in-batch later copy marks; first copy does not")
      write(Set(3L, 4L))
      q.processAllAvailable()
      val all = spark.table("sspans_sink")
        .select("doc_id", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(all === expectedMarks,
        "cross-batch copy marks against carried state; unique docs never mark")
      assert(expectedMarks.nonEmpty && expectedMarks.forall(_._1 != 0L),
        "sanity: the corpus plants real duplication and doc 0 is never marked")
    } finally q.stop()
  }

  test("state is watermark-bounded: a cross-horizon copy counts as first again") {
    val src = tmpDir("graft-sspans-evict-src")
    val ckpt = tmpDir("graft-sspans-evict-ckpt")
    val run = (0 until 10).map(i => s"e$i")
    def write(d: Long, toks: Seq[String], tsSec: Long): Unit =
      spark.createDataFrame(Seq((d, toks.mkString(" "), new java.sql.Timestamp(tsSec * 1000L))))
        .toDF("doc_id", "text", "ingest_ts")
        .coalesce(1).write.mode("append").parquet(src)

    write(0L, fill("m", 3) ++ run, 1L)
    val q = StreamingSpans.start(spark, src, "sspans_evict_sink", ckpt, watermark = "1 second")
    try {
      q.processAllAvailable()
      // in-horizon copy marks…
      write(1L, run ++ fill("n", 3), 2L)
      q.processAllAvailable()
      assert(spark.table("sspans_evict_sink").count() === 3, // 10-token run → 3 windows
        "an in-horizon copy marks its interior windows")
      // …then far-future unrelated docs advance the watermark past the
      // run hashes' timeout AND give Spark a batch in which those
      // groups have no data (the timeout path only fires for dataless
      // groups: batch N's watermark derives from batch N−1's max event
      // time, and a group with new rows is invoked with its state
      // intact instead). After eviction, a late copy finds no state and
      // counts as first — bounded state; cross-horizon dedup is the
      // batch pass's job
      write(2L, fill("o", 12), 100000L)
      q.processAllAvailable()
      write(3L, fill("p", 12), 100001L) // watermark now 99999s → evict
      q.processAllAvailable()
      write(4L, fill("r", 2) ++ run, 100002L)
      q.processAllAvailable()
      assert(spark.table("sspans_evict_sink").count() === 3,
        "a copy arriving after the horizon does not mark (state evicted)")
    } finally q.stop()
  }
}
