package graft

import org.apache.spark.sql.Row

/** Semantics pins for the round-9 additions:
  *
  *   - `dedup_cascade`: on a corpus of mutually-unrelated documents the
  *     planted variants are the ONLY duplicates, so each tier's removal
  *     count is exactly its plant population, token accounting matches
  *     hand-computed whitespace token counts, and the tier chaining
  *     identity (next tier's docs_in = this tier's survivors) holds;
  *   - `basket_pairs`: pair supports on constructed baskets, including
  *     the dedup of a part repeated within one order and the
  *     (support desc, part_a, part_b) total order.
  */
class CascadeSpec extends SparkSpec {

  import spark.implicits._

  // 10 docs, ids 0..9 — plants: ids 0,5 verbatim copies (tier 1),
  // ids 1,6 re-encoded copies (tier 2), ids 2,7 'zq '-prefixed copies
  // (tier 3). Texts are long (120 tokens) and pairwise unrelated, so
  // the near tier's MinHash banding has exactly the two planted pairs
  // to find, and the prefixed copy shares 118 of 119 shingles with its
  // source (J ≈ 0.992 — far above the 0.8 verification gate).
  private val TOKENS = 120
  private def text(seed: Long): String =
    (0 until TOKENS).map(j => s"t${seed * 131 + j * 7919}").mkString(" ")

  private val cascadeDir: String = {
    val d = tmpDir("graft-cascade")
    val rows = (0L until 10L).map(i => (i, text(i), "en", "src0", text(i).length.toLong))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("dedup_cascade: per-tier removals equal the plant populations, accounting is exact") {
    val got = SparkEntry.queries("dedup_cascade")(spark, cascadeDir).collect().toSeq
      .map { case Row(no: Long, tier: String, in: Long, rm: Long, tok: Long, surv: Long) =>
        (no, tier, in, rm, tok, surv) }
    assert(got.map(_._2) === Seq("exact", "norm", "near"))
    val Seq(t1, t2, t3) = got
    // corpus: 10 base + 2 verbatim + 2 re-encoded + 2 prefixed = 16
    assert(t1._3 === 16L)
    // tier 1 removes exactly the verbatim copies of ids 0 and 5
    assert(t1._4 === 2L)
    assert(t1._5 === 2L * TOKENS, "verbatim copies carry TOKENS tokens each")
    // chaining: every tier consumes the previous tier's survivors
    assert(t2._3 === t1._6)
    // tier 2 removes exactly the re-encoded copies of ids 1 and 6
    // (upper-case + doubled spaces + padding folds back to the source)
    assert(t2._4 === 2L)
    assert(t2._5 === 2L * TOKENS)
    assert(t3._3 === t2._6)
    // tier 3 removes exactly the 'zq '-prefixed copies of ids 2 and 7
    assert(t3._4 === 2L)
    assert(t3._5 === 2L * (TOKENS + 1), "prefixed copies carry one extra token")
    assert(t3._6 === 10L, "the ten distinct base documents survive the cascade")
  }

  test("basket_pairs: supports on constructed baskets, in-order part dedup, total order") {
    val d = tmpDir("graft-basket")
    // orders: 100 → parts {1,2,3}; 200 → {1,2} with part 1 twice
    // (dedup'd before pairing); 300 → {2} (no pair); 400 → {1,2}
    Seq(
      (100L, 1L), (100L, 2L), (100L, 3L),
      (200L, 1L), (200L, 1L), (200L, 2L),
      (300L, 2L),
      (400L, 1L), (400L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("basket_pairs")(spark, d).collect().toSeq
      .map { case Row(a: Long, b: Long, n: Long) => (a, b, n) }
    assert(got === Seq(
      (1L, 2L, 3L),   // orders 100, 200 (counted once), 400
      (1L, 3L, 1L),
      (2L, 3L, 1L)))
  }
}
