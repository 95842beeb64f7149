package graft

import org.apache.spark.sql.Row

/** Span-level substring dedup (`dedup_spans` / `dedup_span_frac`):
  * the islands merge must produce MAXIMAL spans — overlapping and
  * touching duplicated windows coalesce, a gap wider than the window
  * size splits — pinned on a constructed corpus where the expected
  * spans are known by hand (the oracle gate checks equivalence with
  * DuckDB on the synthetic corpus; this spec checks the semantics are
  * the ones we mean).
  */
class DedupSpansSpec extends SparkSpec {

  // Unique filler tokens (uN) never repeat across docs, so only the
  // planted runs can form duplicated windows. SPAN_K = 8.
  private def fill(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"u${tag}_$i")
  private val runA = (0 until 20).map(i => s"a$i") // 20-token shared run
  private val runB = (0 until 8).map(i => s"b$i")  // exactly one window
  private val corpusDir: String = {
    val dir = tmpDir("graft-spans")
    val mk = (id: Long, toks: Seq[String]) =>
      (id, toks.mkString(" "), "en", "src0", toks.mkString(" ").length.toLong)
    val rows = Seq(
      // doc 0 / doc 1: runA at different offsets → one maximal span each
      mk(0L, fill("x", 5) ++ runA ++ fill("y", 5)),
      mk(1L, fill("z", 11) ++ runA),
      // doc 2: runA AND runB separated by a 9-token unique gap (> K) →
      // two spans; also proves touching windows inside runA coalesce
      mk(2L, runA ++ fill("g", 9) ++ runB),
      // doc 3: runB only → its single window is a span of exactly K
      mk(3L, fill("w", 6) ++ runB ++ fill("v", 6)),
      // doc 4: all unique → no spans, dup_ppm = 0
      mk(4L, fill("q", 30)),
    )
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def spans: Map[Long, Seq[(Long, Long, Long, Long)]] =
    SparkEntry.queries("dedup_spans")(spark, corpusDir).collect().toSeq
      .map { case Row(d: Long, s: Long, e: Long, t: Long, n: Long) => (d, (s, e, t, n)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  test("overlapping windows merge into one maximal span; offsets are per-doc") {
    val sp = spans
    // doc 0: runA occupies token positions 5..24 → windows start 5..17
    assert(sp(0L) === Seq((5L, 24L, 20L, 13L)))
    // doc 1: same run at positions 11..30
    assert(sp(1L) === Seq((11L, 30L, 20L, 13L)))
  }

  test("a gap wider than the window size splits spans; a single window is a K-token span") {
    val sp = spans
    // doc 2: runA at 0..19 (13 windows), runB at 29..36 (1 window)
    assert(sp(2L) === Seq((0L, 19L, 20L, 13L), (29L, 36L, 8L, 1L)))
    // doc 3: runB at 6..13, exactly one duplicated window
    assert(sp(3L) === Seq((6L, 13L, 8L, 1L)))
    // doc 4: nothing
    assert(!sp.contains(4L))
  }

  test("scrub keeps the corpus-first occurrence and excises later copies") {
    val rows = SparkEntry.queries("dedup_scrub")(spark, corpusDir).collect().toSeq
      .map { case Row(d: Long, n: Long, r: Long, t: String) => d -> ((n, r, t)) }.toMap
    // doc 0 is runA's first occurrence → untouched
    assert(rows(0L) === ((30L, 0L, (fill("x", 5) ++ runA ++ fill("y", 5)).mkString(" "))))
    // doc 1's runA copy is scrubbed (first_doc = 0)
    assert(rows(1L) === ((31L, 20L, fill("z", 11).mkString(" "))))
    // doc 2 loses runA (first in doc 0) but KEEPS runB (doc 2 is its first)
    assert(rows(2L) === ((37L, 20L, (fill("g", 9) ++ runB).mkString(" "))))
    // doc 3's runB copy is scrubbed (first_doc = 2)
    assert(rows(3L) === ((20L, 8L, (fill("w", 6) ++ fill("v", 6)).mkString(" "))))
    // doc 4 has no duplicated content
    assert(rows(4L) === ((30L, 0L, fill("q", 30).mkString(" "))))
  }

  test("dup_ppm is exact integer arithmetic over the merged spans") {
    val frac = SparkEntry.queries("dedup_span_frac")(spark, corpusDir).collect().toSeq
      .map { case Row(d: Long, n: Long, t: Long, p: Long) => d -> ((n, t, p)) }.toMap
    assert(frac(0L) === ((30L, 20L, 20L * 1000000L / 30L)))
    assert(frac(2L) === ((37L, 28L, 28L * 1000000L / 37L)))
    assert(frac(4L) === ((30L, 0L, 0L)))
    assert(frac.size === 5) // every doc appears, span-less ones at 0
  }
}
