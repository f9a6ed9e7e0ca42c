package graft

import graft.queries.{MLQueries, MiscQueries, TSAQueries, TabularQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory behind these queries. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the whole linear-model + clustering front: per-returnflag OLS via
    * one aggregate pass joined with the kmeans-assignment histogram. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    TabularQueries.queries("kmeans_assign")(spark, d)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TabularQueries.queries ++ TextQueries.queries ++ VectorQueries.queries ++
      TSAQueries.queries ++ MLQueries.queries ++ MiscQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for iterative/seeded ops (rows-only
    * check by design — see SURVEY.md §5). */
  def oracleSql: Map[String, String] =
    TabularQueries.oracles ++ TextQueries.oracles ++ VectorQueries.oracles ++
      TSAQueries.oracles ++ MiscQueries.oracles ++ MLQueries.oracles
}
