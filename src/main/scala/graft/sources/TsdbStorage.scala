package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical storage layout for the Meas store — the Spark-native
  * re-expression of the reference's page/WAL machinery (SURVEY.md §4.2).
  *
  * Layout contract:
  *  - files partitioned by `day(time)` → retention (eraseOld) is a
  *    partition DROP, never a rewrite [U: engines/engine.cpp — eraseOld];
  *  - within a partition, rows are hash-bucketed by series id and sorted
  *    by (id, time) → parquet row-group min/max stats give per-series
  *    chunk pruning, the analog of the reference's page footer index
  *    [U: storage/pages/page_manager.cpp — ChunkLink index];
  *  - value compression: parquet dictionary/ZSTD stands in for the
  *    reference's Gorilla codecs [U: compression/delta.cpp, xor.cpp] —
  *    same role, format-native.
  *
  * At 1000 executors none of this changes: the bucket count is the only
  * knob (≥ cluster cores; co-partitions series for merge-free reads).
  */
object TsdbStorage {

  /** O1 append: write a Meas batch in the clustered layout. ZSTD +
    * a bloom filter on `flag` stand in for the reference's Gorilla
    * codecs + per-chunk flag blooms [U: compression/, storage/chunk.h
    * — flag_bloom] — same pruning role, format-native. */
  def append(meas: DataFrame, path: String, buckets: Int = 32): Unit =
    meas
      .withColumn("day", to_date(col("time")))
      .repartition(buckets, pmod(hash(col("id")), lit(buckets)))
      .sortWithinPartitions("id", "time")
      .write.mode("append")
      .partitionBy("day")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#flag", "true")
      .parquet(path)

  /** Read the store back as a canonical Meas DataFrame. Day-partition
    * pruning applies automatically to time predicates on `day`. The
    * schema is supplied explicitly so an empty store (e.g. after
    * retention dropped every partition) reads as an empty DataFrame
    * instead of failing schema inference. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(org.apache.spark.sql.types.StructType(
        graft.core.Meas.schema.fields :+
          org.apache.spark.sql.types.StructField("day", org.apache.spark.sql.types.DateType)))
      .parquet(path)
      .drop("day")

  /** O11 eraseOld: drop whole day partitions strictly older than the
    * cutoff date. Pure metadata/filesystem operation — no data rewrite,
    * which is the only retention strategy that survives 100 TB. */
  def eraseOld(spark: SparkSession, path: String, cutoffDay: java.time.LocalDate): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val dropped = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("day=") &&
          java.time.LocalDate.parse(p.getName.stripPrefix("day=")).isBefore(cutoffDay)
      }
    dropped.foreach(fs.delete(_, true))
    dropped.map(_.getName)
  }

  /** O12 compact: rewrite the store keeping exactly one (the freshest,
    * by `seq`) row per (id, time). Partial-aggregating max_by — no
    * window, one shuffle on the dedup key. */
  def compacted(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .groupBy("id", "time")
      .agg(max_by(struct(col("value"), col("flag"), col("seq")), col("seq")).as("m"))
      .select(col("id"), col("time"), col("m.value").as("value"),
        col("m.flag").as("flag"), col("m.seq").as("seq"))

  /** Compact in place: rewrite into `path` atomically-enough for a
    * single-writer store (write tmp, swap). */
  def compactTo(spark: SparkSession, srcPath: String, dstPath: String, buckets: Int = 32): Unit =
    append(compacted(spark, srcPath), dstPath, buckets)
}
