package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.extensions.TextIndex

/** Streaming maintenance of the persisted text-signature index: each
  * micro-batch of documents is MinHash/SimHash-signed and appended —
  * the ingest loop that keeps near-dup queries serving stored
  * signatures as the corpus grows (build once, stream appends,
  * `TextIndex.compact` periodically). Signatures are per-document
  * deterministic, so the streamed index is bit-identical to a batch
  * rebuild; the (checkpoint, batchId) transaction id makes replayed
  * micro-batches no-ops — the same exactly-once contract as
  * [[AnnIndexStream]].
  *
  * Source schema: (doc_id, text, ...) — same as the documents table.
  */
object TextIndexStream {

  def start(source: DataFrame, indexDir: String, checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          TextIndex.append(batch.sparkSession, batch, indexDir, txn = Some((checkpoint, batchId)))
      }
      .start()
}
