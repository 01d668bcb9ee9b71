package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AdvancedQueries, AnalyticsQueries, PipelineQueries, Relational, StreamingQueries, XmlQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented operator from SURVEY §2 (plus the
  * extended analytics surface) to a DataFrame program over the driver
  * testdata; `oracleSql` carries the DuckDB-equivalent SQL for the
  * hash-match correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01AggSum(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ XmlQueries.queries ++ StreamingQueries.queries ++
      AnalyticsQueries.queries ++ PipelineQueries.queries ++ AdvancedQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ XmlQueries.oracleSql ++ StreamingQueries.oracleSql ++
      AnalyticsQueries.oracleSql ++ PipelineQueries.oracleSql ++ AdvancedQueries.oracleSql
}
