package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.extensions.{TextIndex, TextQueries}

/** The reference-LM quality gate, ONLINE — lm_crossval's scoring leg
  * applied at admission time, with the OWNED CORPUS as the reference:
  * every incoming batch is scored against the owned corpus's unigram
  * LM (Laplace smoothing + OOV counts) and gated on mean surprisal
  * and OOV rate. High mean surprisal or high OOV against a trusted
  * owned corpus marks wrong-language, encoding-damaged, or
  * rare-token-soup documents — the CCNet gate, corpus-relative.
  *
  * Scale contract: the LM is the TextIndex's round-7 `vocab/`
  * component, computed ONCE at ingest and extended exactly-once by
  * every admission append ([[TextIndex.append]] writes the batch's
  * count delta in the same (appId, batchId) transaction as the
  * signatures) — so the per-batch gate cost is O(batch tokens +
  * vocab), never O(owned corpus). Without a certified vocab-carrying
  * index the gate derives counts from the owned corpus directly —
  * certify-or-fallback, results identical (StreamingLmSpec pins it).
  *
  * The scoring arithmetic is [[TextQueries.scoreAgainstVocab]]
  * verbatim — integer micro-bit surprisal per vocabulary entry, exact
  * BIGINT document sums — so an online score equals the batch
  * lm_crossval-style score bit-for-bit.
  */
object StreamingLm {

  /** Tokenizer contract — lockstep with TextQueries/DedupQueries. */
  private val toksExpr = "filter(split(text, ' '), t -> t != '')"

  /** Default gate thresholds: mean surprisal ≤ 18 bits/token (the
    * rare-token-soup ceiling; a doc of all-unseen tokens against a
    * million-token reference scores ~20 bits) and OOV ≤ 30 %. */
  val DefaultMaxMeanMicro: Long = 18000000L
  val DefaultMaxOovPpm: Long = 300000L

  /** The owned corpus's reference vocabulary (token, cnt): served from
    * a certified, fingerprint-matched TextIndex that carries the
    * vocab component; derived from the corpus otherwise. Identical
    * counts either way — the index just moves the corpus-sized pass
    * to ingest. */
  def ownedVocab(spark: SparkSession, owned: DataFrame): DataFrame =
    TextIndex.resolveFor(spark, owned).filter(TextIndex.hasVocab(spark, _)) match {
      case Some(dir) => TextIndex.readVocab(spark, dir)
      case None => owned.select(explode(expr(toksExpr)).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
    }

  /** Score one batch against the owned-corpus LM. Output:
    * (doc_id, n_tokens, oov, sum_log2_micro, mean_log2_micro). */
  def batchScores(spark: SparkSession, batch: DataFrame, owned: DataFrame): DataFrame =
    TextQueries.scoreAgainstVocab(batch, ownedVocab(spark, owned))

  /** Scores + the gate verdict (`lm_kept`): mean surprisal and OOV
    * rate within bounds. */
  def batchVerdicts(spark: SparkSession, batch: DataFrame, owned: DataFrame,
                    maxMeanMicro: Long = DefaultMaxMeanMicro,
                    maxOovPpm: Long = DefaultMaxOovPpm): DataFrame =
    batchScores(spark, batch, owned)
      .withColumn("lm_kept",
        (col("mean_log2_micro") <= maxMeanMicro &&
          col("oov") * 1000000L <= lit(maxOovPpm) * col("n_tokens")).cast("long"))

  /** Online form: a file stream of documents-shaped batches, each
    * micro-batch scored against the CURRENT owned-corpus LM and its
    * verdicts appended to `outDir`. Stateless aside from the static
    * vocab side, so replay just rewrites identical verdict rows —
    * downstream consumers key on doc_id. */
  def start(spark: SparkSession, srcDir: String, owned: DataFrame, outDir: String,
            checkpoint: String,
            maxMeanMicro: Long = DefaultMaxMeanMicro,
            maxOovPpm: Long = DefaultMaxOovPpm): StreamingQuery = {
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batchVerdicts(batch.sparkSession, batch, owned, maxMeanMicro, maxOovPpm)
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
  }
}
