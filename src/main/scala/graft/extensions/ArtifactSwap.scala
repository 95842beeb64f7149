package graft.extensions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.TsdbStorage

/** The tmp-swap rewrite + crash recovery shared by the certified index
  * artifacts (AnnIndex codes, TextIndex sigs): one discipline, one
  * implementation.
  *
  * `<name>.old` / `<name>.compacting` exist ONLY during a rewrite swap,
  * and a rewrite starts from a certified artifact with a fully written
  * tmp before the first rename — so whichever complete copy survives a
  * crash is certified content and the marker can be restored:
  *   - old present, live missing  → crash between renames: old IS the
  *     artifact; rename it back.
  *   - old present, live present  → crash after the second rename: live
  *     is the rewritten copy; drop old.
  *   - only tmp present           → crash before/during the tmp write:
  *     live was never touched; drop tmp.
  * Recovery runs on WRITER entry points only (single-writer contract) —
  * readers must fall back while a swap is mid-flight, not mutate it.
  */
private[extensions] object ArtifactSwap {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def recover(spark: SparkSession, dir: String, name: String): Unit = {
    val f = fs(spark, dir)
    val live = new Path(s"$dir/$name")
    val tmp = new Path(s"$dir/$name.compacting")
    val old = new Path(s"$dir/$name.old")
    if (f.exists(old)) {
      if (!f.exists(live)) f.rename(old, live) else f.delete(old, true)
      f.delete(tmp, true)
      TsdbStorage.markStatsInSync(spark, dir)
    } else if (f.exists(tmp)) {
      f.delete(tmp, true)
      TsdbStorage.markStatsInSync(spark, dir)
    }
  }

  /** Marker-covered rewrite of `dir/name`: `write(tmpPath)` must fully
    * materialize the replacement before the swap runs. */
  def rewrite(spark: SparkSession, dir: String, name: String)(write: String => Unit): Unit = {
    val f = fs(spark, dir)
    val live = new Path(s"$dir/$name")
    val tmp = new Path(s"$dir/$name.compacting")
    val old = new Path(s"$dir/$name.old")
    TsdbStorage.markStatsOutOfSync(spark, dir)
    f.delete(tmp, true)
    f.delete(old, true)
    write(tmp.toString)
    // a FIRST write has no live copy to retire (ShardExport's initial
    // export); RawLocalFileSystem.rename throws on a missing source
    if (f.exists(live)) f.rename(live, old)
    f.rename(tmp, live)
    f.delete(old, true)
    TsdbStorage.markStatsInSync(spark, dir)
  }
}
