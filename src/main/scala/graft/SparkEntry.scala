package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.{AnalyticQueries, CoreQueries, ExtQueries, ExtQueries2, ExtQueries3, ExtQueries4, ExtQueries5, ExtQueries6, LlmQueries, TimeQueries}

/** Driver contract — one `queries` entry (+ `oracleSql` ANSI equivalent
  * where SQL-expressible) per operator from SURVEY.md §2.
  *
  * The catalog is split by surface:
  *  - [[graft.catalog.CoreQueries]] — relational core (reference R-ops +
  *    join/agg/window/setop/scalar breadth)
  *  - [[graft.catalog.TimeQueries]] — event-time windows, cube/grouping sets
  *  - [[graft.catalog.LlmQueries]]  — text analysis, dedup, similarity search
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ TimeQueries.queries ++ LlmQueries.queries ++
      ExtQueries.queries ++ ExtQueries2.queries ++ ExtQueries3.queries ++
      ExtQueries4.queries ++ ExtQueries5.queries ++ ExtQueries6.queries ++
      AnalyticQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ TimeQueries.oracleSql ++ LlmQueries.oracleSql ++
      ExtQueries.oracleSql ++ ExtQueries2.oracleSql ++ ExtQueries3.oracleSql ++
      ExtQueries4.oracleSql ++ ExtQueries5.oracleSql ++
      ExtQueries6.oracleSql ++ AnalyticQueries.oracleSql
}
