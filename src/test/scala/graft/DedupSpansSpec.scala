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

  test("property: spans and scrub match a naive reference on random collision-rich corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val K = 8
    // 3-token vocab makes 8-windows collide constantly (3^8 = 6561
    // contents vs ~2000 windows per corpus) → overlapping spans,
    // touching spans, multi-island docs, and full-doc duplicates all
    // arise naturally; ~1/5 docs is an exact copy of its predecessor
    val docGen = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val corpusGen = Gen.listOfN(60, Gen.zip(docGen, Gen.choose(0, 4)))

    def naive(corpus: Map[Long, Vector[String]]): (Seq[(Long, Long, Long, Long, Long)], Map[Long, (Long, Long, String)]) = {
      val wins = for {
        (d, ts) <- corpus.toSeq; p <- 0 to ts.length - K
      } yield (d, p.toLong, ts.slice(p, p + K).mkString(" "))
      val byContent = wins.groupBy(_._3)
      val dup = byContent.filter(_._2.map(_._1).distinct.size >= 2)
      val firstDoc = dup.map { case (c, ws) => c -> ws.map(_._1).min }
      val spans = wins.filter(w => dup.contains(w._3)).groupBy(_._1).toSeq.flatMap {
        case (d, ws) =>
          val ps = ws.map(_._2).distinct.sorted
          ps.foldLeft(Vector.empty[Vector[Long]]) { (acc, p) =>
            if (acc.nonEmpty && p - acc.last.last <= K) acc.init :+ (acc.last :+ p)
            else acc :+ Vector(p)
          }.map(run => (d, run.head, run.last + K - 1, run.last - run.head + K, run.size.toLong))
      }.sortBy(s => (s._1, s._2))
      val scrub = corpus.map { case (d, ts) =>
        val covered = wins.collect {
          case (`d`, p, c) if dup.contains(c) && firstDoc(c) < d =>
            (p until p + K).toSet
        }.foldLeft(Set.empty[Long])(_ ++ _)
        val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i.toLong) => t }
        d -> ((ts.length.toLong, (ts.length - kept.length).toLong, kept.mkString(" ")))
      }
      (spans, scrub)
    }

    (1 to 3).foreach { seed =>
      val raw = corpusGen(Gen.Parameters.default, Seed(41L + seed))
        .getOrElse(sys.error("gen failed"))
      val corpus: Map[Long, Vector[String]] = raw.zipWithIndex.foldLeft(Map.empty[Long, Vector[String]]) {
        case (acc, ((toks, dupFlag), i)) =>
          val ts = if (dupFlag == 0 && i > 0) acc(i - 1L) else toks.toVector
          acc + (i.toLong -> ts)
      }
      val dir = tmpDir(s"graft-spans-prop-$seed")
      spark.createDataFrame(corpus.toSeq.map { case (d, ts) =>
        (d, ts.mkString(" "), "en", "src0", ts.mkString(" ").length.toLong)
      }).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")

      val (expSpans, expScrub) = naive(corpus)
      val gotSpans = SparkEntry.queries("dedup_spans")(spark, dir).collect().toSeq
        .map { case Row(d: Long, s: Long, e: Long, t: Long, n: Long) => (d, s, e, t, n) }
      assert(gotSpans === expSpans, s"seed $seed: spans diverge from the reference")
      val gotScrub = SparkEntry.queries("dedup_scrub")(spark, dir).collect().toSeq
        .map { case Row(d: Long, n: Long, r: Long, t: String) => d -> ((n, r, t)) }.toMap
      assert(gotScrub === expScrub, s"seed $seed: scrub diverges from the reference")
    }
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
