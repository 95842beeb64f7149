package graft

import java.sql.Timestamp

import graft.streaming.StreamingDedup

/** Streaming exact dedup: first occurrence of a content hash passes,
  * later copies — including copies arriving in LATER microbatches with
  * different doc_ids — are dropped while inside the watermark horizon. */
class StreamingDedupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked streaming dedup drops cross-batch duplicate content") {
    import spark.implicits._
    val src = tmpDir("sdedup-src")

    def write(rows: Seq[(Long, String, Timestamp)]): Unit =
      rows.toDF("doc_id", "text", "ingest_ts")
        .coalesce(1).write.mode("append").parquet(src)

    write(Seq(
      (1L, "the quick brown fox", ts("2024-05-01 10:00:00")),
      (2L, "an entirely different document", ts("2024-05-01 10:00:10"))))

    val q = StreamingDedup.start(spark, src, "sdedup", tmpDir("sdedup-ckpt"))
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM sdedup").head().getLong(0) === 2)

      // a later batch re-sends doc 1's text under a new doc_id (dropped)
      // and adds genuinely new content (kept)
      write(Seq(
        (3L, "the quick brown fox", ts("2024-05-01 10:05:00")),
        (4L, "fresh new content", ts("2024-05-01 10:05:30"))))
      q.processAllAvailable()

      val kept = spark.sql("SELECT doc_id FROM sdedup").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 4L), s"duplicate content must be dropped, got $kept")
    } finally q.stop()
  }
}
