package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

/** `series_ewma` semantics on a constructed store (the oracle gate
  * checks cross-engine equality on the synthetic corpus; this spec
  * checks the smoothing is the one we mean):
  *
  *   - a CONSTANT series is a fixed point at every position — the
  *     present-weight normalization makes the series head exact
  *     instead of zero-biased (the naive truncated EWMA divides by the
  *     full-window weight sum and under-reads the first K−1 samples);
  *   - an impulse decays geometrically with (3/4)^i, verified against
  *     an independent loop implementation of the definition.
  */
class SeriesEwmaSpec extends SparkSpec {

  private val dir: String = {
    val d = tmpDir("graft-ewma")
    val mkTs = (m: Int) => Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val rows =
      // series u1.click (id 8): constant 5.0
      (0 until 12).map(i => (i.toLong, mkTs(i), 1L, "click", 5.0, "{}")) ++
        // series u2.click (id 16): unit impulse at position 6
        (0 until 16).map(i => (100L + i, mkTs(i), 2L, "click", if (i == 6) 1.0 else 0.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  /** (id, seq) → ewma_micro. */
  private lazy val out: Map[(Long, Long), Long] =
    SparkEntry.queries("series_ewma")(spark, dir).collect().toSeq
      .map { case Row(id: Long, _, seq: Long, e: Long) => ((id, seq), e) }.toMap

  test("constant series is a fixed point, including the head") {
    (0 until 12).foreach(i => assert(out((8L, i.toLong)) === 5000000L))
  }

  test("impulse response matches an independent implementation of the definition") {
    val w = Iterator.iterate(1.0)(_ * 0.75).take(8).toSeq
    val xs = (0 until 16).map(i => if (i == 6) 1.0 else 0.0)
    (0 until 16).foreach { t =>
      val k = math.min(t + 1, 8)
      val num = (0 until k).map(i => xs(t - i) * w(i)).sum
      val den = (0 until k).map(w).sum
      assert(out((16L, (100 + t).toLong)) === math.round(num / den * 1e6),
        s"position $t")
    }
  }

  test("impulse is fully forgotten once it leaves the K-sample window") {
    // the window at position t covers positions t−7..t: position 5 is
    // pre-impulse, positions 14/15 are post-horizon — all exactly zero
    assert(out((16L, 105L)) === 0L)
    assert(out((16L, 114L)) === 0L)
    assert(out((16L, 115L)) === 0L)
  }
}
