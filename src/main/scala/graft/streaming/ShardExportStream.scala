package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.extensions.ShardExport

/** Streaming training-shard export — the last stage of the online
  * pipeline (admit → clean → EXPORT): each micro-batch of kept
  * documents appends to the shard layout exactly once, riding
  * [[ShardExport.append]]'s cursor protocol with the same
  * (checkpoint, batchId) transaction id the index-maintenance streams
  * use ([[TextIndexStream]]/[[AnnIndexStream]]). A replayed
  * micro-batch is a no-op; a crash inside the append replays cleanly
  * (file moves are name-idempotent, manifest + cursor swap together).
  *
  * The loader side never sees a torn state: batch files appear only
  * under complete deterministic names, and the manifest always
  * describes a prefix of the applied batches.
  *
  * Source schema: documents-shaped (doc_id, text, lang, source,
  * n_chars). The target must be an existing [[ShardExport.write]]
  * layout.
  */
object ShardExportStream {

  def start(source: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          ShardExport.append(batch.sparkSession, batch, outDir,
            appId = checkpoint, batchId = batchId)
          () // foreachBatch wants Unit; append's Boolean is the replay flag
        }
      }
      .start()
}
