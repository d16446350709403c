package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2B for the declared query
  * inventory (Q-* ids map 1:1 to the keys below) and §7 for the build plan.
  *
  * `queries`  : named Spark-first implementations `(session, sfDir) => DataFrame`.
  * `oracleSql`: equivalent ANSI SQL for DuckDB over the same parquet tables;
  *              keys absent here are approximate/non-SQL ops the driver
  *              checks rows-only (each has a scalatest spec instead).
  */
object SparkEntry {

  private val areas: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Scans.queries, Scans.oracle),
    (Projections.queries, Projections.oracle),
    (Joins.queries, Joins.oracle),
    (Aggregations.queries, Aggregations.oracle),
    (Windows.queries, Windows.oracle),
    (Sorts.queries, Sorts.oracle),
    (SetOps.queries, SetOps.oracle),
    (Functions.queries, Functions.oracle),
    (CustomOps.queries, CustomOps.oracle),
    (LlmOps.queries, LlmOps.oracle),
    (StreamingQueries.queries, StreamingQueries.oracle),
    (Extras.queries, Extras.oracle),
    (SqlSurface.queries, SqlSurface.oracle),
    (Graph.queries, Graph.oracle),
    (Clustering.queries, Clustering.oracle),
    (Mining.queries, Mining.oracle)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5-shaped 6-table join + aggregate (Q-join-07). */
  def entry(spark: SparkSession): DataFrame =
    queries("Q-join-07")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    areas.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] =
    areas.map(_._2).reduce(_ ++ _)
}
