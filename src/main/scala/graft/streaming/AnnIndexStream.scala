package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.extensions.AnnIndex

/** Streaming maintenance of the persisted ANN index: each micro-batch
  * of embeddings is SRP-coded and assigned against the FROZEN
  * quantizer, then appended to the index — the production loop that
  * keeps ANN serving in step with corpus growth without per-query
  * recompute (build once at bootstrap, stream appends forever,
  * `AnnIndex.compact` periodically).
  *
  * Exactness is the batch-append guarantee (AnnIndexSpec): SRP codes
  * are per-vector deterministic and cells are frozen-quantizer
  * assignments, so the streamed index is bit-identical to a batch
  * rebuild over the same corpus with the same centroids. The index
  * must be BUILT before the stream starts; a crash that leaves it
  * uncertified fails the next micro-batch fast (restart after
  * `AnnIndex.build`) rather than appending onto an unserved index.
  *
  * foreachBatch is at-least-once (a crash after the index commit but
  * before the streaming checkpoint commit replays the micro-batch on
  * restart), so each append carries the (checkpoint, batchId)
  * transaction id and AnnIndex skips batches at or below its persisted
  * cursor — the standard idempotent-sink pattern, lifting the loop to
  * exactly-once. The appId is the checkpoint path: a NEW stream (fresh
  * checkpoint) restarts batch numbering without being mistaken for a
  * replay.
  *
  * Source schema: (vec_id, embedding, ...) — same as the embeddings
  * table.
  */
object AnnIndexStream {

  def start(source: DataFrame, indexDir: String, checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          AnnIndex.append(batch.sparkSession, batch, indexDir, txn = Some((checkpoint, batchId)))
      }
      .start()
}
