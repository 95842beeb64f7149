package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.extensions.TextIndex
import graft.streaming.StreamingLm

/** The online reference-LM gate: index-served scores must be
  * bit-identical to corpus-derived ones, admission appends must extend
  * the vocabulary exactly-once (so a later batch sees an earlier
  * batch's tokens), and the stream form must equal the batch form.
  */
class StreamingLmSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def withIndex[T](dir: String)(body: => T): T = {
    spark.conf.set(TextIndex.ConfKey, dir)
    try body finally spark.conf.unset(TextIndex.ConfKey)
  }

  private def scores(batch: org.apache.spark.sql.DataFrame,
                     owned: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long, Long)] =
    StreamingLm.batchScores(spark, batch, owned).collect().toSeq
      .map { case Row(id: Long, n: Long, oov: Long, s: Long, m: Long) => (id, (n, oov, s, m)) }
      .toMap

  test("index-served vocab scores equal corpus-derived scores bit-for-bit") {
    val owned = mkDocs((0L until 20L).map(i => (i, s"alpha beta gamma tok$i")))
    val ownedDir = tmpDir("graft-lmgate-owned")
    owned.write.parquet(s"$ownedDir/documents.parquet")
    val ownedStored = spark.read.parquet(s"$ownedDir/documents.parquet")
    val batch = mkDocs(Seq((100L, "alpha beta unseen"), (101L, "gamma gamma")))
    val derived = scores(batch, ownedStored) // no index conf → fallback
    val idx = tmpDir("graft-lmgate-idx")
    TextIndex.build(spark, ownedStored, idx)
    assert(TextIndex.hasVocab(spark, idx))
    withIndex(idx) {
      assert(scores(batch, ownedStored) === derived,
        "served LM must equal the corpus-derived LM")
    }
    // and the arithmetic itself: "unseen" is OOV, "alpha" is not
    assert(derived(100L)._2 === 1L)
    assert(derived(101L)._2 === 0L)
  }

  test("admission appends grow the vocabulary exactly-once; a later batch sees an earlier batch's tokens") {
    val owned = mkDocs((0L until 20L).map(i => (i, s"alpha beta gamma tok$i")))
    val idx = tmpDir("graft-lmgate-grow")
    val ownedDir = tmpDir("graft-lmgate-grow-docs")
    owned.write.parquet(s"$ownedDir/documents.parquet")
    TextIndex.build(spark, spark.read.parquet(s"$ownedDir/documents.parquet"), idx)
    val probe = mkDocs(Seq((200L, "novelword alpha")))

    def oovOfProbe(): Long = withIndex(idx) {
      // resolveFor would refuse the stale fingerprint after growth, so
      // read the vocab component directly — the gate the admission
      // pipeline uses once the owned corpus and index advance together
      graft.extensions.TextQueries
        .scoreAgainstVocab(probe, TextIndex.readVocab(spark, idx))
        .collect().map { case Row(_, _, oov: Long, _, _) => oov }.head
    }
    assert(oovOfProbe() === 1L, "novelword starts out-of-vocabulary")

    // batch A admits a doc carrying novelword — vocab grows in the txn
    val batchA = mkDocs(Seq((50L, "novelword appears here")))
    TextIndex.append(spark, batchA, idx, txn = Some(("lmgate", 1L)))
    assert(oovOfProbe() === 0L, "batch B sees batch A's token")
    val vocabAfter = TextIndex.readVocab(spark, idx)
      .collect().map { case Row(t: String, c: Long) => (t, c) }.toMap
    // replay of batch A is a no-op for the vocab too
    TextIndex.append(spark, batchA, idx, txn = Some(("lmgate", 1L)))
    val vocabReplay = TextIndex.readVocab(spark, idx)
      .collect().map { case Row(t: String, c: Long) => (t, c) }.toMap
    assert(vocabReplay === vocabAfter, "replayed append must not double-count")
    assert(vocabAfter("novelword") === 1L)

    // consolidation preserves the sums
    TextIndex.compact(spark, idx)
    val vocabCompact = TextIndex.readVocab(spark, idx)
      .collect().map { case Row(t: String, c: Long) => (t, c) }.toMap
    assert(vocabCompact === vocabAfter, "compact must preserve vocab sums")
  }

  test("stream form equals batch form row-for-row") {
    val owned = mkDocs((0L until 20L).map(i => (i, s"alpha beta gamma tok$i")))
    val ownedDir = tmpDir("graft-lmgate-stream-owned")
    owned.write.parquet(s"$ownedDir/documents.parquet")
    val ownedStored = spark.read.parquet(s"$ownedDir/documents.parquet")
    val srcDir = tmpDir("graft-lmgate-src")
    val batch = mkDocs(Seq((300L, "alpha beta"), (301L, "junk junkier junkiest")))
    batch.write.mode("overwrite").parquet(srcDir)
    val outDir = tmpDir("graft-lmgate-out")
    val q = StreamingLm.start(spark, srcDir, ownedStored, outDir,
      tmpDir("graft-lmgate-ckpt"))
    q.processAllAvailable(); q.stop()
    val streamed = spark.read.parquet(outDir).collect().toSeq.map(_.toSeq).sortBy(_.head.toString)
    val direct = StreamingLm.batchVerdicts(spark,
      spark.read.parquet(srcDir), ownedStored).collect().toSeq.map(_.toSeq).sortBy(_.head.toString)
    assert(streamed === direct)
    // the gate verdict: all-OOV junk is dropped, in-vocab text kept
    val kept = streamed.map(r => (r.head, r.last)).toMap
    assert(kept(300L) === 1L)
    assert(kept(301L) === 0L)
  }
}
