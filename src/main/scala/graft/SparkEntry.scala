package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each file under `graft.ops` owns one SURVEY §2 category and exposes
  * `ops` (the Spark builders) and `oracle` (the DuckDB SQL twins);
  * this object is just the concatenation.
  */
object SparkEntry {
  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0
    * (4 (returnflag, linestatus) groups exist at every scale factor). */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_hash_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.ops ++ Filters.ops ++ Aggregations.ops ++ Joins.ops ++
      Windows.ops ++ Sorts.ops ++ SetOps.ops ++ Scalars.ops ++ LlmPipeline.ops ++
      Streaming.ops ++ Extensions.ops ++ LlmExtras.ops ++ Reshape.ops ++
      Subqueries.ops ++ LlmCuration.ops

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scans.oracle ++ Filters.oracle ++ Aggregations.oracle ++ Joins.oracle ++
      Windows.oracle ++ Sorts.oracle ++ SetOps.oracle ++ Scalars.oracle ++ LlmPipeline.oracle ++
      Streaming.oracle ++ Extensions.oracle ++ LlmExtras.oracle ++ Reshape.oracle ++
      Subqueries.oracle ++ LlmCuration.oracle
}
