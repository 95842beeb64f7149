package graft.extensions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shard-export scale smoke: a 200k-doc corpus (TextScaleSmoke's token
  * scheme, duplication-free — export cost is layout cost) through the
  * full export lifecycle: initial write, two incremental appends, a
  * replay, and a read-back audit. The numbers to watch:
  *
  *   - write() ≈ one corpus pass (no shuffle — sortWithinPartitions +
  *     partitionBy), so export cost tracks scan cost;
  *   - append() cost tracks the BATCH, not the corpus (the manifest
  *     merge reads 16 rows + the batch; the only corpus-sized work is
  *     the initial write);
  *   - a replayed append is O(metadata).
  *
  * Usage: runMain graft.extensions.ExportScaleSmoke [docs]
  */
object ExportScaleSmoke {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 200000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[xscale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-export-smoke").toString
    val toks = expr(
      """transform(sequence(0, 119), i ->
        |  concat('t', pmod(doc_id * 2654435761 + i * 40503, 1000000000000)))""".stripMargin)
    time(f"materialize $nDocs%,d docs × 120 tokens (parquet)") {
      spark.range(nDocs).select(col("id").as("doc_id"))
        .select(col("doc_id"), concat_ws(" ", toks).as("text"),
          lit("en").as("lang"), lit("src0").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.parquet(s"$dir/documents.parquet")
    }

    val out = java.nio.file.Files.createTempDirectory("graft-export-out").toString
    time(s"ShardExport.write ($nDocs docs, 16 shards, no shuffle)") {
      ShardExport.write(spark, dir, out)
    }
    assert(ShardExport.readDocs(spark, out).count() == nDocs)
    val man0 = ShardExport.readManifest(spark, out)
    assert(man0.agg(sum("n_docs")).collect()(0).getLong(0) == nDocs)
    val skews = man0.select("skew_pm").collect().map(_.getLong(0))
    println(s"[xscale] balance: skew_pm ${skews.min}..${skews.max} across 16 shards (1000 = exact)")
    assert(skews.min > 900 && skews.max < 1100, "md5 assignment must balance within ±10 %")

    val batchN = nDocs / 20
    def batch(off: Long) =
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 20 === 7).withColumn("doc_id", col("doc_id") + off)
    time(f"append batch 1 ($batchN%,d docs — cost tracks the batch)") {
      assert(ShardExport.append(spark, batch(10000000L), out, "xscale", 1L))
    }
    time(f"append batch 2 ($batchN%,d docs)") {
      assert(ShardExport.append(spark, batch(20000000L), out, "xscale", 2L))
    }
    time("replay of batch 2 (must be O(metadata))") {
      assert(!ShardExport.append(spark, batch(20000000L), out, "xscale", 2L))
    }
    val total = ShardExport.readDocs(spark, out).count()
    assert(total == nDocs + 2 * batchN, s"read-back $total")
    val man = ShardExport.readManifest(spark, out)
    assert(man.agg(sum("n_docs")).collect()(0).getLong(0) == total,
      "manifest counts every shipped row exactly once")
    println(s"[xscale] PASS: $total rows across 16 shards, manifest exact after 2 appends + replay")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.stop()
  }
}
