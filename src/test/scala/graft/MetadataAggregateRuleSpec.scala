package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.operators.TxTable
import graft.sources.GraftSource

/** The injected Catalyst rule: global count/min/max over a clean graft
  * relation folds from the commit log into a LocalRelation — zero files
  * opened — and every non-provable shape is left untouched. */
class MetadataAggregateRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  private def freshRoot(): String =
    Files.createTempDirectory("graft_rule").toString + "/t"

  private def seeded(): String = {
    import spark.implicits._
    val root = freshRoot()
    TxTable.create(
      (5L until 205L).map(k => (k, k.toInt, s"v$k")).toDF("k", "ki", "v")
        .repartitionByRange(3, col("k")),
      root, Some("k"), None, Seq("ki"))
    TxTable.append(spark, root,
      (300L until 350L).map(k => (k, k.toInt, s"v$k")).toDF("k", "ki", "v")
        .coalesce(1))
    root
  }

  private def foldedToLocal(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("FileScan")
  }

  test("count(*), min, max fold from the log into a LocalRelation") {
    import spark.implicits._
    val root = seeded()
    val q = GraftSource.scan(spark, root)
      .agg(count(lit(1)).as("n"), min("k").as("mn"), max("k").as("mx"),
        min("ki").as("mni"), max("ki").as("mxi"))
    assert(foldedToLocal(q), s"expected log fold:\n${q.queryExecution}")
    assert(q.as[(Long, Long, Long, Int, Int)].head() ==
      ((250L, 5L, 349L, 5, 349)))
  }

  test("unprovable shapes are left untouched and stay correct") {
    import spark.implicits._
    val root = seeded()
    val scan = GraftSource.scan(spark, root)
    // a filter blocks the rewrite (the log can't count a predicate)
    val filtered = scan.filter(col("k") > 100L).agg(count(lit(1)).as("n"))
    assert(!foldedToLocal(filtered))
    assert(filtered.as[Long].head() == 154L)
    // count(col) needs null counts the log doesn't have
    val countCol = scan.agg(count(col("v")).as("n"))
    assert(!foldedToLocal(countCol))
    assert(countCol.as[Long].head() == 250L)
    // min over a column without logged stats scans
    val noStats = scan.agg(min("v").as("m"))
    assert(!foldedToLocal(noStats))
    assert(noStats.as[String].head() == "v10")
    // grouping blocks the rewrite
    val grouped = scan.groupBy(col("k") % 2).agg(count(lit(1)))
    assert(!foldedToLocal(grouped))
  }

  test("fractional stats never fold (truncated axis) but integral via SQL does") {
    import spark.implicits._
    val root = freshRoot()
    TxTable.create(Seq((1L, 5.6), (2L, 5.9)).toDF("k", "x").coalesce(1),
      root, Some("k"), None, Seq("x"))
    val q = GraftSource.scan(spark, root).agg(min("x").as("m"))
    assert(!foldedToLocal(q))
    assert(q.as[Double].head() == 5.6)
    // and through plain SQL over a registered view
    GraftSource.scan(spark, root).createOrReplaceTempView("rule_sql_t")
    val viaSql = spark.sql("SELECT count(*) AS n, max(k) AS mx FROM rule_sql_t")
    assert(foldedToLocal(viaSql), s"SQL path missed:\n${viaSql.queryExecution}")
    assert(viaSql.as[(Long, Long)].head() == ((2L, 2L)))
  }

  test("all-NULL stats column folds min/max to NULL") {
    import spark.implicits._
    val root = freshRoot()
    TxTable.create(
      Seq((1L, None: Option[Long]), (2L, None)).toDF("k", "b").coalesce(1),
      root, Some("k"), None, Seq("b"))
    val q = GraftSource.scan(spark, root)
      .agg(min("b").as("mn"), max("b").as("mx"), count(lit(1)).as("n"))
    assert(foldedToLocal(q))
    val r = q.head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) == 2L)
  }
}
