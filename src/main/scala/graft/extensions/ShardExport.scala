package graft.extensions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard exporter — the writer behind `shard_manifest`: ships
  * the corpus as hash-assigned parquet shards plus the manifest the
  * loader reads before the first byte of data, in ONE atomic swap (the
  * [[ArtifactSwap]] discipline the certified indexes use), so a crashed
  * export can never leave a half-written layout looking live and a
  * re-export is a no-op for readers until the final rename.
  *
  * Scale shape: the shard column is appended map-side and rows reach
  * their shard files via `sortWithinPartitions` + `partitionBy` — NO
  * shuffle. A `repartition(col("shard"))` would serialize each shard
  * into one task (a 6 TB task at 100 TB corpus / 16 shards); this shape
  * keeps parallelism = input tasks and open files per task ≤ N_SHARDS.
  */
object ShardExport {

  private val Name = "shards"

  /** Corpus with its shard assignment — the SAME expression
    * `shard_manifest` aggregates, so the manifest describes exactly the
    * layout this writes. */
  private[graft] def withShard(df: DataFrame): DataFrame =
    df.withColumn("shard", expr(TrainingQueries.shardExpr))

  /** Export `sfDir`'s documents as `outDir/shards/docs/shard=N/…` plus
    * `outDir/shards/manifest`, atomically swapped. */
  def write(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    ArtifactSwap.recover(spark, outDir, Name)
    ArtifactSwap.rewrite(spark, outDir, Name) { tmp =>
      withShard(spark.read.parquet(s"$sfDir/documents.parquet"))
        .sortWithinPartitions("shard")
        .write.partitionBy("shard").mode("overwrite").parquet(s"$tmp/docs")
      TrainingQueries.shardManifest.build(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/manifest")
    }
  }

  def readDocs(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/$Name/docs")

  def readManifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/$Name/manifest")
}
