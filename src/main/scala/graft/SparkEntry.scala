package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.GraftQuery

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in `graft.queries.*` modules, each exposing
  * `all: Seq[GraftQuery]` (name + Spark impl + DuckDB oracle SQL).
  */
object SparkEntry {

  private def modules: Seq[GraftQuery] =
    graft.queries.Relational.all ++ graft.queries.ReferenceOps.all ++
      graft.queries.LlmOps.all ++ graft.queries.CurationOps.all ++
      graft.queries.AnalyticsOps.all ++ graft.queries.GraphMlOps.all ++
      graft.queries.StatsOps.all ++ graft.queries.MiningOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    modules.find(_.name == "q03_revenue_by_nation").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraftQuery.toQueryMap(modules)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GraftQuery.toOracleMap(modules)
}
