package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.extensions.ShardExport

/** The export last mile: the shipped layout must round-trip exactly,
  * the manifest must describe the bytes actually written (not a
  * parallel computation that could drift), and the swap discipline must
  * make a re-export atomic and crash debris recoverable.
  */
class ShardExportSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("exported shards round-trip the corpus exactly, shard = the manifest's expression") {
    val out = tmpDir("graft-shardexp")
    ShardExport.write(spark, sfDir, out)
    val back = ShardExport.readDocs(spark, out)
    // every row survives, no row invented
    assert(back.count() === docs.count())
    assert(back.select("doc_id").exceptAll(docs.select("doc_id")).isEmpty)
    assert(docs.select("doc_id").exceptAll(back.select("doc_id")).isEmpty)
    // the physical partition column equals the shard expression per row
    val mismatched = ShardExport.withShard(docs).select(col("doc_id"), col("shard").as("want"))
      .join(back.select(col("doc_id"), col("shard").cast("long").as("got")), "doc_id")
      .filter(col("want") =!= col("got"))
    assert(mismatched.isEmpty, "partition dir must equal the manifest's shard expression")
  }

  test("shipped manifest agrees with the shipped data, totals cover the corpus") {
    val out = tmpDir("graft-shardexp-m")
    ShardExport.write(spark, sfDir, out)
    val man = ShardExport.readManifest(spark, out)
    val fromData = ShardExport.readDocs(spark, out)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
        min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
    val diff = man.select("shard", "n_docs", "n_chars", "min_doc_id", "max_doc_id")
      .exceptAll(fromData.select("shard", "n_docs", "n_chars", "min_doc_id", "max_doc_id"))
    assert(diff.isEmpty, "manifest rows must match per-shard facts of the shipped files")
    // totals: every document accounted for exactly once
    assert(man.agg(sum("n_docs")).collect()(0).getLong(0) === docs.count())
    // skew column satisfies its definition: permille of the balanced share
    val sk = man.select("n_tokens", "skew_pm").collect()
    val tot = sk.map(_.getLong(0)).sum
    sk.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) * 1000 * 16 / tot)
    }
  }

  test("re-export swaps atomically; crash debris recovers on the next write") {
    val out = tmpDir("graft-shardexp-c")
    ShardExport.write(spark, sfDir, out)
    val before = ShardExport.readDocs(spark, out).count()
    // simulate a crashed export: a half-written tmp left behind
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$out/shards.compacting/docs"))
    ShardExport.write(spark, sfDir, out) // recover() + fresh swap
    assert(ShardExport.readDocs(spark, out).count() === before)
    assert(!fs.exists(new Path(s"$out/shards.compacting")) &&
      !fs.exists(new Path(s"$out/shards.old")), "no swap debris survives")
  }
}
