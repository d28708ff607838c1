package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, EcommerceQueries, LlmQueries, QualityQueries}

/** Driver contract — see /root/repo/SURVEY.md §2/§5. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EcommerceQueries.q10StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EcommerceQueries.queries ++ LlmQueries.queries ++ AnalyticsQueries.queries ++
      QualityQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EcommerceQueries.oracleSql ++ LlmQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      QualityQueries.oracleSql
}
