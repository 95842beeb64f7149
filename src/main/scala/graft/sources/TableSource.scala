package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Format-agnostic table IO (§2.2 scans/sources/sinks: the reference
  * reads only its own page/WAL format; we expose the Spark source
  * surface uniformly). Explicit schema is REQUIRED for schemaful text
  * formats — schema inference is a full extra pass over the data and
  * is never acceptable at 100 TB.
  */
object TableSource {

  /** Read `path` as `format` (parquet | csv | json | orc). */
  def read(spark: SparkSession, path: String, format: String = "parquet",
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(format == "parquet" || schema.isDefined,
      s"$format requires an explicit schema (inference is a full extra scan)")
    val r = spark.read.format(format).options(options)
    schema.fold(r)(r.schema).load(path)
  }

  /** Write a result set as `format`, preserving column order. */
  def write(df: DataFrame, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): Unit =
    df.write.format(format).options(options).mode("overwrite").save(path)
}
