package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.extensions.TextIndex

/** Crash-point sweep for the shared artifact swap (ArtifactSwap, used
  * by AnnIndex.compact and TextIndex.compact): every intermediate state
  * a kill can leave behind must recover — on the next writer entry — to
  * a CERTIFIED artifact whose contents are either the pre-swap or the
  * post-swap copy, never a mixture, never missing.
  */
class ArtifactSwapSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def contents(dir: String): Set[Seq[Any]] =
    TextIndex.readSigs(spark, dir).collect().map(_.toSeq).toSet

  /** Build an index, stage the swap artifacts a compact would create,
    * then wreck it into `state` and verify recovery. */
  private def crashCase(tag: String)(wreck: (org.apache.hadoop.fs.FileSystem, String) => Unit): Unit = {
    val dir = tmpDir(s"graft-swap-$tag")
    TextIndex.build(spark, docs, dir)
    val before = contents(dir)
    val f = fs(dir)
    // materialize what compact's tmp write produces, without the swap
    TextIndex.readSigs(spark, dir).repartitionByRange(2, col("doc_id"))
      .write.parquet(s"$dir/sigs.compacting")
    graft.sources.TsdbStorage.markStatsOutOfSync(spark, dir) // compact dropped the marker
    wreck(f, dir)
    assert(!TextIndex.usable(spark, dir), s"$tag: mid-swap must not serve")
    // ANY writer entry recovers; fsck is the explicit repair tool
    assert(TextIndex.fsck(spark, dir) === Seq.empty, s"$tag: recovered artifact is intact")
    assert(TextIndex.usable(spark, dir), s"$tag: marker restored after recovery")
    assert(contents(dir) === before, s"$tag: contents are exactly one complete copy")
    assert(!f.exists(new Path(s"$dir/sigs.compacting")) && !f.exists(new Path(s"$dir/sigs.old")),
      s"$tag: no swap debris survives")
  }

  test("crash before the first rename: tmp written, live untouched") {
    crashCase("pre-rename") { (_, _) => () }
  }

  test("crash between renames: live missing, old holds the only copy") {
    crashCase("mid-swap") { (f, dir) =>
      assert(f.rename(new Path(s"$dir/sigs"), new Path(s"$dir/sigs.old")))
    }
  }

  test("crash after the second rename: compacted live, old not yet deleted") {
    crashCase("post-rename") { (f, dir) =>
      assert(f.rename(new Path(s"$dir/sigs"), new Path(s"$dir/sigs.old")))
      assert(f.rename(new Path(s"$dir/sigs.compacting"), new Path(s"$dir/sigs")))
    }
  }
}
