package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.salesSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    StarQueries.all ++ AnalyticsQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ ExtraQueries.all ++ TpchQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    StarQueries.oracle ++ AnalyticsQueries.oracle ++ TextQueries.oracle ++
      SimilarityQueries.oracle ++ ExtraQueries.oracle ++ TpchQueries.oracle
}
