package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Q1 shape: six (returnflag, linestatus) groups exist at
    * every scale factor (q5's region filter collapses to one row at
    * sf0.001 — too close to the rows>0 edge). */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesLlm.queries ++ QueriesText.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesCore.oracles ++ QueriesLlm.oracles ++ QueriesText.oracles
}
