package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.QueryDef
import graft.extensions.{DedupQueries, MiscQueries, PipelineQueries, PqQueries, RetrievalQueries, SimilarityQueries, TemporalQueries, TextQueries, TrainingQueries}
import graft.operators.CoreQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every registered operator (SURVEY.md §2 inventory + the
  * §2.3 extension operators) into the driver-facing maps. Each module
  * contributes a `defs: Map[String, QueryDef]`; names must be unique.
  */
object SparkEntry {

  /** All registered queries across modules. */
  def all: Map[String, QueryDef] =
    CoreQueries.defs ++ TextQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ PqQueries.defs ++ MiscQueries.defs ++
      TrainingQueries.defs ++ TemporalQueries.defs ++ PipelineQueries.defs ++
      RetrievalQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.readInterval.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, v) => k -> v.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }
}
