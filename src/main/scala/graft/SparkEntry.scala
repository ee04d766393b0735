package graft

import graft.ops.VerifyQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real library surface lives in graft.build (index builder),
  * graft.search (BM25 engine), graft.ops (verification + pipeline ops). */
object SparkEntry {

  /** Flagship: build the inverted index over the sf0.001 documents table
    * and run a BM25 top-k term query through the engine. */
  def entry(spark: SparkSession): DataFrame =
    VerifyQueries.qTermTopk(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (engine ops in
    * VerifyQueries, training-data pipeline ops in PipelineQueries). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VerifyQueries.queries ++ ops.PipelineQueries.queries

  /** DuckDB-runnable oracle SQL per query (same tables, same column
    * names); non-SQL-expressible ops are intentionally absent (driver
    * falls back to a rows-only check). */
  def oracleSql: Map[String, String] =
    VerifyQueries.oracles ++ ops.PipelineQueries.oracles
}
