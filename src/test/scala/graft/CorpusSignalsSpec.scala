package graft

import org.apache.spark.sql.Row

/** Semantics pins for the round-7 corpus-signal queries:
  *
  *   - `lm_score` (unigram-LM surprisal): verified against an
  *     independent Scala implementation on a corpus with power-of-two
  *     token frequencies, where every surprisal is an exact integer
  *     number of bits;
  *   - `jaccard_recall` (banding-recall audit): band keys and pair
  *     counts match an independent exact-Jaccard computation; an exact
  *     duplicate (identical MinHash signature ⇒ identical buckets) is
  *     structurally guaranteed to be caught; the ppm columns satisfy
  *     their defining arithmetic.
  */
class CorpusSignalsSpec extends SparkSpec {

  private def mk(id: Long, text: String) =
    (id, text, "en", "src0", text.length.toLong)

  // ---------------------------------------------------------------
  // lm_score corpus: 16 corpus tokens total with counts 8/4/2/1/1 →
  // surprisals are exactly 1/2/3/4/4 bits.
  // ---------------------------------------------------------------
  private val lmDir: String = {
    val d = tmpDir("graft-lm")
    val rows = Seq(
      mk(0L, "a a a a a a a a"),
      mk(1L, "b b b b c c"),
      mk(2L, "d e"))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("lm_score matches an independent implementation on exact-bit frequencies") {
    val got = SparkEntry.queries("lm_score")(spark, lmDir).collect().toSeq
      .map { case Row(id: Long, n: Long, sum: Long, mean: Long) => (id, (n, sum, mean)) }
      .toMap
    assert(got === Map(
      0L -> ((8L, 8000000L, 1000000L)),   // 8 × 1 bit
      1L -> ((6L, 14000000L, 2333333L)),  // 4×2 + 2×3 bits, 14e6 DIV 6
      2L -> ((2L, 8000000L, 4000000L)),   // 2 × 4 bits
    ))
  }

  // ---------------------------------------------------------------
  // mixture_temperature: 16/4 language split → exact sqrt masses 4/2,
  // so every output cell is exact integer arithmetic.
  // ---------------------------------------------------------------
  private val mixDir: String = {
    val d = tmpDir("graft-mix")
    val rows = (0 until 16).map(i => (i.toLong, s"m$i", "en", "src0", 2L)) ++
      (0 until 4).map(i => (100L + i, s"n$i", "de", "src0", 2L))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("mixture_temperature: T=2 weights from exact sqrt masses") {
    val got = SparkEntry.queries("mixture_temperature")(spark, mixDir).collect().toSeq
      .map { case Row(l: String, n: Long, f: Long, t: Long, b: Long) => (l, (n, f, t, b)) }
      .toMap
    // flat: 16/20, 4/20; sqrt masses 4e6, 2e6 → temp: 4/6, 2/6
    assert(got === Map(
      "en" -> ((16L, 800000L, 666666L, 833L)),  // down-weighted 0.83×
      "de" -> ((4L, 200000L, 333333L, 1666L)),  // up-weighted 1.67×
    ))
  }

  test("doc_embed matches a hand-rolled hashing-trick implementation") {
    val d = tmpDir("graft-embed")
    val rows = Seq(mk(0L, "a a b"), mk(1L, "b c c c"), mk(2L, "a"))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    // independent implementation of the md5 dim/sign contract
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def dimOf(t: String) = (java.lang.Long.parseLong(md5hex(t).substring(0, 8), 16) % 64).toInt
    def sgnOf(t: String) = if (java.lang.Long.parseLong(md5hex(t).substring(8, 9), 16) % 2 == 0) 1L else -1L
    def vecOf(toks: Seq[String]): Seq[Long] = {
      val v = new Array[Long](64)
      toks.foreach(t => v(dimOf(t)) += sgnOf(t))
      v.toSeq
    }
    val got = SparkEntry.queries("doc_embed")(spark, d).collect().toSeq
      .map(r => (r.getLong(0),
        (r.getString(1).split(",").toSeq.map(_.toLong), r.getLong(2), r.getLong(3)))).toMap
    val texts = Map(0L -> Seq("a", "a", "b"), 1L -> Seq("b", "c", "c", "c"), 2L -> Seq("a"))
    texts.foreach { case (id, toks) =>
      val want = vecOf(toks)
      assert(got(id)._1 === want, s"doc $id vector")
      assert(got(id)._2 === want.count(_ != 0L), s"doc $id nnz")
      assert(got(id)._3 ===
        math.floor(math.sqrt(want.map(x => x * x).sum.toDouble) * 1e6 + 0.5).toLong,
        s"doc $id norm")
    }
    // identical bags embed identically; the signed counts scale with
    // multiplicity (the property the cosine machinery relies on)
    assert(got(2L)._1.map(_ * 2L) === vecOf(Seq("a", "a")))
  }

  test("topic_mixture: cell occupancies match ivf_cell_stats; weights satisfy their integer arithmetic") {
    val tm = SparkEntry.queries("topic_mixture")(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val cs = SparkEntry.queries("ivf_cell_stats")(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tm.view.mapValues(_._1).toMap === cs,
      "the mixture must weight exactly the cells the quantizer serves")
    val nTot = tm.values.map(_._1).sum
    val sMicro = tm.map { case (c, (n, _, _, _)) =>
      c -> math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong }
    val sTot = sMicro.values.sum
    tm.foreach { case (c, (n, f, t, b)) =>
      assert(f === n * 1000000L / nTot, s"cell $c flat_ppm")
      assert(t === sMicro(c) * 1000000L / sTot, s"cell $c temp_ppm")
      assert(b === t * 1000L / math.max(f, 1L), s"cell $c boost_pm")
      // temperature flattens: small cells never boosted below flat share order
    }
    // T=2 up-weights below-average cells, down-weights above-average ones
    val avg = nTot / tm.size
    tm.foreach { case (c, (n, _, _, b)) =>
      if (n < avg / 2) assert(b > 1000L, s"small cell $c must be up-weighted, got $b")
      if (n > avg * 2) assert(b < 1000L, s"large cell $c must be down-weighted, got $b")
    }
  }

  test("text_winnow matches an independent implementation; shared 11-token runs share a fingerprint") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def kgramHash(toks: Seq[String], p: Int): Long =
      java.lang.Long.parseLong(md5hex(toks.slice(p, p + 8).mkString(" ")).substring(0, 15), 16)
    // independent winnow: window minima over W=4, run-compressed; docs
    // with fewer than W k-grams degrade to the whole-document window
    def winnowOf(text: String): (Long, Long, Seq[(Long, Long)], String) = {
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val hs = (0 to toks.size - 8).map(p => kgramHash(toks, p))
      val fp =
        if (hs.size < 4) Vector((0L, hs.min))
        else {
          val mins = (3 until hs.size).map(p => ((p - 3).toLong, hs.slice(p - 3, p + 1).min))
          mins.foldLeft(Vector.empty[(Long, Long)]) { (acc, qm) =>
            if (acc.nonEmpty && acc.last._2 == qm._2) acc else acc :+ qm
          }
        }
      val digest = md5hex(fp.map { case (q, m) => s"$q:$m" }.sorted.mkString(","))
      (hs.size.toLong, math.max(hs.size - 3, 1).toLong, fp, digest)
    }
    val shared = (1 to 12).map(i => s"run$i").mkString(" ") // 12 shared tokens ≥ W + k − 1 = 11
    val docA = s"a1 a2 a3 a4 a5 $shared a6 a7 a8 a9"
    val docB = s"b1 b2 b3 b4 b5 b6 b7 $shared b8 b9"
    val docC = (1 to 30).map(i => s"c$i").mkString(" ") // disjoint
    val docD = (1 to 9).map(i => s"d$i").mkString(" ")  // 2 k-grams: short-doc path
    val docE = docD                                      // verbatim short copy
    val d = tmpDir("graft-winnow")
    spark.createDataFrame(Seq(mk(0L, docA), mk(1L, docB), mk(2L, docC), mk(3L, docD), mk(4L, docE)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("text_winnow")(spark, d).collect().toSeq
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val wants = Map(0L -> winnowOf(docA), 1L -> winnowOf(docB), 2L -> winnowOf(docC),
      3L -> winnowOf(docD), 4L -> winnowOf(docE))
    wants.foreach { case (id, (nk, nw, fp, dig)) =>
      assert(got(id) === ((nk, nw, fp.size.toLong, dig)), s"doc $id")
    }
    // the winnowing theorem: a shared run of ≥ W + k − 1 tokens forces a
    // common fingerprint VALUE; disjoint docs share none
    val fpv = wants.view.mapValues(_._3.map(_._2).toSet).toMap
    assert((fpv(0L) & fpv(1L)).nonEmpty, "the 12-token shared run must yield a common fingerprint")
    assert((fpv(0L) & fpv(2L)).isEmpty && (fpv(1L) & fpv(2L)).isEmpty,
      "disjoint-vocabulary docs share no fingerprint")
    // the short-doc path: a verbatim 9-token copy is VISIBLE to the
    // match step (the recall hole the degenerate window exists to close)
    val matches = SparkEntry.queries("winnow_matches")(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches.contains((3L, 4L)), "verbatim short copies must share their whole-doc fingerprint")
  }

  test("chunk_embed: single-chunk docs embed identically to doc_embed; chunk ids align with chunk_split") {
    val d = tmpDir("graft-chunkembed")
    val shortDoc = (1 to 20).map(i => s"s$i").mkString(" ")   // 1 chunk (≤ 32 toks)
    val longDoc = (1 to 80).map(i => s"l$i").mkString(" ")    // 3 chunks (strides 0/24/48)
    spark.createDataFrame(Seq(mk(0L, shortDoc), mk(1L, longDoc)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val ce = SparkEntry.queries("chunk_embed")(spark, d).collect().toSeq
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getString(2).split(",").toSeq.map(_.toLong), r.getLong(3)))).toMap
    val de = SparkEntry.queries("doc_embed")(spark, d).collect().toSeq
      .map(r => (r.getLong(0),
        (r.getString(1).split(",").toSeq.map(_.toLong), r.getLong(3)))).toMap
    // a document inside one window IS its chunk — same vector, same norm
    assert(ce((0L, 0L)) === de(0L), "whole-doc chunk must equal the document embedding")
    // chunk ids line up with the splitter row-for-row
    val cs = SparkEntry.queries("chunk_split")(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ce.keySet === cs, "chunk_embed must emit exactly the splitter's chunks")
    assert(ce.keySet.count(_._1 == 1L) === 3, "80 tokens at stride 24 → 3 chunks")
  }

  test("chunk_topk: each query document retrieves its own passages first") {
    val d = tmpDir("graft-chunktopk")
    val rows = Seq(
      mk(0L, (1 to 40).map(i => s"alpha$i").mkString(" ")), // query 0: 2 chunks
      mk(1L, (1 to 40).map(i => s"beta$i").mkString(" ")),  // query 1: disjoint vocab
      mk(2L, (1 to 40).map(i => s"gam$i").mkString(" ")),   // query 2: disjoint vocab
      mk(3L, (1 to 40).map(i => s"alpha$i").mkString(" "))) // copy of 0 — also retrievable
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("chunk_topk")(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    // rank 1 per query is a chunk of the query itself or its verbatim copy
    got.filter(_._2 == 1L).foreach { case (q, _, doc, cos) =>
      val own = Set(q) ++ (if (q == 0L) Set(3L) else Set.empty[Long])
      assert(own.contains(doc), s"query $q rank-1 from doc $doc")
      assert(cos > 0.6, s"own-passage cosine must be high, got $cos")
    }
    // disjoint-vocabulary cross hits score near zero
    got.filter { case (q, _, doc, _) => q == 1L && doc != 1L }
      .foreach { case (_, _, _, cos) => assert(math.abs(cos) < 0.5) }
  }

  test("quality_gopher: every rule branch fires on its constructed document") {
    val goodWords = Seq("the", "and", "with", "that", "quality", "corpus", "tokens", "letters")
    val pass = (0 until 60).map(i => goodWords(i % goodWords.size)).mkString(" ")
    val docs = Seq(
      mk(0L, pass),                                            // pass
      mk(1L, "the and tiny"),                                  // too_few_words
      mk(2L, (0 until 60).map(_ => "ab").mkString(" ")),       // word_length (mean 2)
      mk(3L, ("123456 " * 60).trim),                           // word_length fires before non_alpha (mean 6 is fine → non_alpha)
      mk(4L, (0 until 60).map(i => s"zqx$i xyz").mkString(" ")), // stopwords (alpha + length fine, no stop hits)
    )
    val d = tmpDir("graft-gopher")
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("quality_gopher")(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getString(5))).toMap
    assert(got(0L) === "pass")
    assert(got(1L) === "too_few_words")
    assert(got(2L) === "word_length")
    assert(got(3L) === "non_alpha", "digit-only words have valid length but no alphabetic char")
    assert(got(4L) === "stopwords")
  }

  test("lm_calibration: 9 deciles per language, cuts non-decreasing") {
    val rows = SparkEntry.queries("lm_calibration")(spark, sfDir).collect().toSeq
      .map { case Row(l: String, dec: Long, _, cut: Long) => (l, dec, cut) }
    assert(rows.size === 45) // 5 langs × 9 deciles on the sf0.001 corpus
    rows.groupBy(_._1).foreach { case (l, rs) =>
      val cuts = rs.sortBy(_._2).map(_._3)
      assert(cuts.size === 9, s"lang $l")
      assert(cuts === cuts.sorted, s"lang $l cuts must be non-decreasing: $cuts")
    }
  }

  // ---------------------------------------------------------------
  // lm_crossval: construct a corpus where one held-out doc carries a
  // token the 80 % train split has never seen — the OOV path (zero on
  // the synthetic corpora, whose vocabulary is shared across the
  // split) gets pinned here.
  // ---------------------------------------------------------------
  test("lm_crossval counts OOV tokens and smooths their surprisal") {
    // same md5-permille bucketing as the query
    def bkt(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % 1000
    }
    val trainIds = (0L until 200L).filter(bkt(_) < 800).take(4)
    val heldId = (0L until 200L).find(bkt(_) >= 800).get
    val d = tmpDir("graft-lmcv")
    val rows = trainIds.map(i => mk(i, "seen seen common")) :+
      mk(heldId, "seen novel")
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("lm_crossval")(spark, d).collect()
    assert(got.length === 1) // only the held-out doc is scored
    val Row(id: Long, n: Long, oov: Long, sum: Long, _) = got.head: @unchecked
    assert(id === heldId && n === 2L && oov === 1L)
    // train: 4 docs × (2×seen + 1×common) → T=12, V=2, T+V=14;
    // "seen" cnt=8 → log2(14/9); "novel" cnt=0 → log2(14/1)
    val expected = math.floor(math.log(14.0 / 9.0) / math.log(2) * 1e6 + 0.5).toLong +
      math.floor(math.log(14.0) / math.log(2) * 1e6 + 0.5).toLong
    assert(sum === expected)
  }

  // ---------------------------------------------------------------
  // jaccard_recall corpus: docs 0/1 identical (J = 1, band 10);
  // docs 2/3 share a 14-token prefix of 20 (J = 12/24 = 0.5, band 5);
  // doc 4 disjoint filler.
  // ---------------------------------------------------------------
  private val jrDir: String = {
    val d = tmpDir("graft-jr")
    val shared = (0 until 20).map(i => s"w$i")
    val rows = Seq(
      mk(0L, (0 until 20).map(i => s"x$i").mkString(" ")),
      mk(1L, (0 until 20).map(i => s"x$i").mkString(" ")),
      mk(2L, shared.mkString(" ")),
      mk(3L, (shared.take(14) ++ (0 until 6).map(i => s"v$i")).mkString(" ")),
      mk(4L, (0 until 20).map(i => s"q$i").mkString(" ")))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("jaccard_recall bands match independent exact Jaccard; exact dups are always caught") {
    // independent truth: distinct 3-gram shingles per doc
    def shingles(toks: Seq[String]): Set[String] =
      toks.sliding(3).map(_.mkString(" ")).toSet
    val a = shingles((0 until 20).map(i => s"w$i"))
    val b = shingles((0 until 14).map(i => s"w$i") ++ (0 until 6).map(i => s"v$i"))
    val j = a.intersect(b).size.toDouble / a.union(b).size
    assert(j === 0.5) // the constructed mid-band pair

    val rows = SparkEntry.queries("jaccard_recall")(spark, jrDir).collect().toSeq
      .map { case Row(band: Long, np: Long, nc: Long, miss: Long, th: Long) =>
        (band, (np, nc, miss, th)) }.toMap
    // exactly two truth pairs: (0,1) at J=1 → band 10; (2,3) at J=0.5 → band 5
    assert(rows.keySet === Set(5L, 10L))
    assert(rows(10L)._1 === 1L)
    // identical docs ⇒ identical signatures ⇒ same band buckets: caught
    assert(rows(10L)._2 === 1L)
    assert(rows(5L)._1 === 1L)
    rows.foreach { case (band, (np, nc, miss, th)) =>
      assert(nc <= np)
      assert(miss === (np - nc) * 1000000L / np, s"band $band miss_ppm arithmetic")
      // theory at the band midpoint, q^4 with q = 1 − jm²
      val jm = math.min((band * 100000L + 50000L).toDouble / 1e6, 1.0)
      val q = 1.0 - jm * jm
      assert(th === math.floor((1.0 - q * q * q * q) * 1e6 + 0.5).toLong, s"band $band theory_ppm")
    }
  }

  // ---------------------------------------------------------------
  // lm_bigram: same unigram profile, different transition structure —
  // the word-salad case a unigram LM cannot distinguish.
  // ---------------------------------------------------------------
  private val bgDir: String = {
    val d = tmpDir("graft-bg")
    val rows = Seq(
      mk(0L, "x y x y x y x y"),  // deterministic transitions
      mk(1L, "x x y y x y y x")) // same unigrams, salad transitions
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("lm_bigram: salad transitions score above structured ones at equal unigram profile") {
    val got = SparkEntry.queries("lm_bigram")(spark, bgDir).collect().toSeq
      .map { case Row(id: Long, n: Long, sum: Long, mean: Long) => (id, (n, sum, mean)) }
      .toMap
    // both docs have 7 bigrams; unigram counts are identical (8 x, 8 y)
    assert(got(0L)._1 === 7L)
    assert(got(1L)._1 === 7L)
    assert(got(1L)._3 > got(0L)._3,
      "the word-salad doc must carry higher conditional surprisal")
    got.values.foreach { case (n, sum, mean) => assert(mean === sum / n) }
    // independent arithmetic: corpus bigram counts (x,y)=6 (y,x)=5
    // (x,x)=1 (y,y)=2, both marginals 7 → doc 0 sum =
    // 4·log2(7/6) + 3·log2(7/5) micro-rounded per TYPE then summed
    def m(num: Long, den: Long): Long =
      math.floor(math.log(num.toDouble / den.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
    assert(got(0L)._2 === 4L * m(7, 6) + 3L * m(7, 5))
    assert(got(1L)._2 === m(7, 1) + 2L * m(7, 6) + 2L * m(7, 2) + 2L * m(7, 5))
  }

  // ---------------------------------------------------------------
  // bpe_encode: hand-exact merge application on a constructed corpus.
  // ---------------------------------------------------------------
  private val beDir: String = {
    val d = tmpDir("graft-be")
    val rows = Seq(
      mk(0L, "abab abab cd"),
      mk(1L, "cd cd"))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("bpe_encode: learned merges compress exactly as hand-applied") {
    // pair counts (word-frequency weighted): ab=4, ba=2, cd=3 →
    // merge ranks: ab(1), cd(2), ba(3). abab → two ab-placeholders
    // (ba never survives ab's earlier replace), cd → one placeholder.
    val got = SparkEntry.queries("bpe_encode")(spark, beDir).collect().toSeq
      .map { case Row(id: Long, b: Long, a: Long, ppm: Long) => (id, (b, a, ppm)) }
      .toMap
    assert(got(0L) === ((10L, 5L, 500000L))) // 4+4+2 → 2+2+1
    assert(got(1L) === ((4L, 2L, 500000L)))  // 2+2 → 1+1
  }

  // ---------------------------------------------------------------
  // source_stats: per-source exact counts on a constructed corpus.
  // ---------------------------------------------------------------
  private val ssDir: String = {
    val d = tmpDir("graft-ss")
    val longText = (0 until 40).map(i => s"w$i").mkString(" ") // passes every gate
    val rows = Seq(
      (0L, longText, "en", "srcA", longText.length.toLong),
      (1L, longText, "en", "srcA", longText.length.toLong),   // exact dup of 0
      (2L, "tiny doc", "de", "srcA", 8L),                     // short → quality fail
      (3L, longText + " tail", "en", "srcB", 5L))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("source_stats: dup and quality-fail attribution per source is exact") {
    val got = SparkEntry.queries("source_stats")(spark, ssDir).collect().toSeq
      .map { case Row(src: String, nd: Long, nl: Long, tpd: Long, qf: Long, dp: Long) =>
        (src, (nd, nl, tpd, qf, dp)) }
      .toMap
    // srcA: 3 docs, 2 langs, 1 short fail (333333 ppm), 1 dup non-keeper
    assert(got("srcA") === ((3L, 2L, (40L + 40L + 2L) / 3L, 333333L, 333333L)))
    // srcB: 1 doc, clean
    assert(got("srcB") === ((1L, 1L, 41L, 0L, 0L)))
  }

  test("dedup_keepbest: kept member is the cluster's quality argmax, and the choice differs from keep-first") {
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))) // (doc_id, cluster_id)
    val multi = clusters.groupBy(_._2).filter(_._2.size > 1)
    // text_quality's gated `quality` double, re-scaled to the micro the
    // keep decision orders on (round(x,6)·1e6 is integral, so the floor
    // recovers the identical integer)
    val qMicro = SparkEntry.queries("text_quality")(spark, sfDir).collect().toSeq
      .map(r => r.getLong(0) -> math.floor(r.getDouble(4) * 1e6 + 0.5).toLong).toMap
    val got = SparkEntry.queries("dedup_keepbest")(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === multi.keySet, "one row per multi-member cluster")
    multi.foreach { case (cid, members) =>
      val ids = members.map(_._1)
      val (n, kept, keptQ, minQ) = got(cid)
      assert(n === ids.size.toLong, s"cluster $cid member count")
      assert(ids.contains(kept), s"cluster $cid keeper must be a member")
      val want = ids.map(id => (qMicro(id), -id)).max // q desc, id asc
      assert((keptQ, -kept) === want, s"cluster $cid keeper must attain (max q, min id)")
      assert(minQ === ids.map(qMicro).min, s"cluster $cid min quality")
    }
    // the operator is not keep-first in disguise: on this corpus some
    // cluster's best member is NOT its min-id representative
    assert(got.exists { case (cid, (_, kept, _, _)) => kept != cid },
      "at least one cluster must keep a non-min-id member")
  }
}
