package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The fsck probe core, shared by every parquet artifact (data store,
  * stats index, scheme log, ANN index): verify footer, every row
  * group, and every page payload DECOMPRESSED for every column — a
  * head-only or header-only probe would miss in-page corruption; codec
  * framing and checksums fail on bit-flipped payloads. Value-level
  * re-decoding beyond decompression is not performed.
  *
  * Runs DISTRIBUTED: file paths are parallelized and each executor
  * task walks its files — O(#files / cluster-cores) wall-clock, not
  * O(#files) driver round-trips.
  */
object ParquetProbe {

  /** All .parquet files under `root` (recursive); empty if absent. */
  def listParquet(spark: SparkSession, root: Path): Seq[Path] = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer[Path]()
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) buf += f.getPath
    }
    buf.toSeq
  }

  /** Distributed full-decompression probe; returns the corrupt paths. */
  def probe(spark: SparkSession, paths: Seq[Path]): Seq[String] = {
    if (paths.isEmpty) return Seq.empty
    val files = paths.map(_.toString)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { paths =>
        val conf = confBc.value.value
        paths.filter { p =>
          try {
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(new Path(p), conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try {
              import scala.jdk.CollectionConverters._
              val cols = r.getFooter.getFileMetaData.getSchema.getColumns.asScala.toSeq
              var g = r.readNextRowGroup()
              while (g != null) {
                cols.foreach { cd =>
                  val pr = g.getPageReader(cd)
                  Option(pr.readDictionaryPage()).foreach(_.getBytes.toByteArray)
                  var remaining = pr.getTotalValueCount
                  while (remaining > 0) {
                    val page = pr.readPage()
                    remaining -= page.getValueCount
                    // force payload materialization → decompression runs
                    page match {
                      case p1: org.apache.parquet.column.page.DataPageV1 =>
                        p1.getBytes.toByteArray
                      case p2: org.apache.parquet.column.page.DataPageV2 =>
                        p2.getData.toByteArray
                      case _ => ()
                    }
                  }
                }
                g = r.readNextRowGroup()
              }
              false
            } finally r.close()
          } catch { case _: Throwable => true }
        }
      }
      .collect().toSeq.sorted
  }
}
