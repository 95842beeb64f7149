package graft

import org.apache.spark.sql.Row

/** The composed corpus-cleaning pipeline (`corpus_clean`): every
  * document must be attributed to the FIRST stage that drops it, and
  * the kept set must be exactly what running the stages in sequence
  * leaves. The oracle gate checks DuckDB equivalence on the synthetic
  * corpus; this spec checks the attribution semantics are the ones we
  * mean, on a corpus where the verdicts are known by hand.
  *
  * Doc ids start at 100 so the query's planted tranche (ids < 50
  * re-appended id-shifted — there to exercise the exact-dup path on
  * the synthetic corpus) stays empty here.
  */
class PipelineSpec extends SparkSpec {

  private def toks(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"${tag}_$i")

  private val textA = toks("a", 40).mkString(" ")
  private val textB = toks("b", 40).mkString(" ")
  // textB with the final token changed: shares 36 of ~38 shingles —
  // a simhash near-dup (deterministic md5 signatures, so if the pair
  // bands + verifies once it does forever)
  private val textBvar = (toks("b", 39) :+ "zzz").mkString(" ")

  private val corpusDir: String = {
    val dir = tmpDir("graft-pipeline")
    val rows = Seq(
      (100L, toks("u", 40).mkString(" "), "en"), // clean, unique → kept
      (101L, toks("v", 40).mkString(" "), "fr"), // non-en → lang
      (102L, toks("w", 10).mkString(" "), "en"), // < 30 tokens → quality
      (103L, textA, "en"),                       // first of exact pair → kept
      (104L, textA, "en"),                       // identical, later id → exact_dup
      (105L, textB, "en"),                       // first of near pair → kept
      (106L, textBvar, "en"),                    // one-token variant → near_dup
      (107L, textA, "fr"),                       // non-en AND exact dup of 103 →
                                                 // 'lang' (first stage wins)
    ).map { case (id, text, lang) => (id, text, lang, "src0", text.length.toLong) }
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("each doc is attributed to the first stage that drops it") {
    val verdicts = SparkEntry.queries("corpus_clean")(spark, corpusDir)
      .collect().toSeq
      .map { case Row(d: Long, v: String, k: Boolean) => (d, (v, k)) }
      .toMap
    assert(verdicts === Map(
      100L -> ("kept", true),
      101L -> ("lang", false),
      102L -> ("quality", false),
      103L -> ("kept", true),
      104L -> ("exact_dup", false),
      105L -> ("kept", true),
      106L -> ("near_dup", false),
      107L -> ("lang", false),
    ))
  }
}
