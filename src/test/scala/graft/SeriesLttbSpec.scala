package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

/** `series_lttb` semantics on constructed stores (the oracle gate
  * checks cross-engine equality; this spec checks the selection is the
  * one we mean):
  *
  *   - a spike inside an interior bucket is that bucket's pick — the
  *     defining LTTB property (keep the visually extreme point);
  *   - a constant series degenerates to first-point-per-bucket (all
  *     areas equal ⇒ the rn tie-break);
  *   - endpoints are always kept, and a ≤ B-point series passes
  *     through whole.
  */
class SeriesLttbSpec extends SparkSpec {

  private def mkDir(values: Seq[Double], user: Long): String = {
    val d = tmpDir("graft-lttb")
    val rows = values.zipWithIndex.map { case (v, i) =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), user, "click", v, "{}")
    }
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  private def run(dir: String): Seq[(Long, Long, Double)] =
    SparkEntry.queries("series_lttb")(spark, dir).collect().toSeq
      .map { case Row(_, b: Long, _, seq: Long, v: Double) => (b, seq, v) }
      .map { case (b, seq, v) => (b, seq, v) }

  test("a spike inside an interior bucket is that bucket's pick") {
    // 26 flat points with a spike at position 10; n=26 > B=8, so
    // interior positions 2..25 split into 6 buckets of 4. Position 10
    // (rn 11) lands in bucket 1 + 9*6/24 = 3; its area dominates.
    val values = (0 until 26).map(i => if (i == 10) 100.0 else 1.0)
    val out = run(mkDir(values, user = 1L))
    assert(out.size === 8) // one pick per bucket
    val byBucket = out.map(t => t._1 -> t._2).toMap
    assert(byBucket(0L) === 0L, "first point kept")
    assert(byBucket(7L) === 25L, "last point kept")
    assert(byBucket(3L) === 10L, "the spike is its bucket's pick")
  }

  test("a constant series degenerates to first-point-per-bucket") {
    val out = run(mkDir(Seq.fill(26)(5.0), user = 2L))
    assert(out.size === 8)
    // bucket b ∈ 1..6 holds rns 2+4(b−1) .. 1+4b; all areas are 0, so
    // the tie-break keeps the bucket's first row
    val byBucket = out.map(t => t._1 -> t._2).toMap
    (1 to 6).foreach(b => assert(byBucket(b.toLong) === (1 + 4 * (b - 1)).toLong, s"bucket $b"))
  }

  test("a series with at most B points passes through whole") {
    val out = run(mkDir(Seq(3.0, 1.0, 4.0, 1.0, 5.0), user = 3L))
    assert(out.size === 5)
    assert(out.map(_._3) === Seq(3.0, 1.0, 4.0, 1.0, 5.0))
  }
}
