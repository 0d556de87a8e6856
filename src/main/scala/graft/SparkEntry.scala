package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Queries.all("q6_revenue_by_region")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.operators.Queries.all ++ graft.operators.TextQueries.all ++
      graft.operators.Queries2.all ++ graft.operators.Queries3.all ++
      graft.operators.Queries4.all ++ graft.operators.Queries5.all ++
      graft.operators.Queries6.all ++ graft.operators.Queries7.all ++
      graft.operators.Queries8.all ++ graft.operators.Queries9.all ++
      graft.operators.Queries10.all ++ graft.operators.Queries11.all ++
      graft.operators.Queries12.all ++ graft.operators.Queries13.all ++
      graft.operators.Queries14.all ++ graft.operators.Queries15.all ++
      graft.operators.Queries16.all ++ graft.operators.Queries17.all ++
      graft.operators.Queries18.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.operators.Queries.oracles ++ graft.operators.TextQueries.oracles ++
      graft.operators.Queries2.oracles ++ graft.operators.Queries3.oracles ++
      graft.operators.Queries4.oracles ++ graft.operators.Queries5.oracles ++
      graft.operators.Queries6.oracles ++ graft.operators.Queries7.oracles ++
      graft.operators.Queries8.oracles ++ graft.operators.Queries9.oracles ++
      graft.operators.Queries10.oracles ++ graft.operators.Queries11.oracles ++
      graft.operators.Queries12.oracles ++ graft.operators.Queries13.oracles ++
      graft.operators.Queries14.oracles ++ graft.operators.Queries15.oracles ++
      graft.operators.Queries16.oracles ++ graft.operators.Queries17.oracles ++
      graft.operators.Queries18.oracles
}
