package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{EngineSession, Tables}
import graft.operators.ZOrderLayout

/** Pins the z-order layout's data-skipping claim (SURVEY.md §9): with
  * row groups laid out as (x, y) tiles, a predicate on the SECOND
  * dimension — useless to a single-key sort — skips most row groups.
  *
  * Methodology: the same rows written twice into one file each with small
  * row groups (x-sorted vs z-clustered), read back with a pushed y-range
  * filter; the parquet scan's numOutputRows metric counts only rows in
  * row groups that survived min/max pruning (the vectorized reader does
  * no row-level filtering), so it IS the skipping measurement.
  */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  private val sf = "/root/testdata/sf0.001"

  /** rows emitted by the parquet scan (post row-group pruning). */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }

  test("z-value: interleaves bits (hand-computed fixtures)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrderLayout.zvalue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // interleave(x=3 (011), y=5 (101)) = y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 39
    assert(rows.toSeq == Seq(0L, 1L, 2L, 39L, 4294967295L))
  }

  test("n-dim z-value: bit b of dim d lands at b*n + d; SQL twin agrees") {
    import spark.implicits._
    val df = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (3L, 5L, 6L), (255L, 255L, 255L)).toDF("a", "b", "c")
    val got = df
      .select(ZOrderLayout.zvalueN(Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // n=3: a→positions 0,3,6,...; b→1,4,7,...; c→2,5,8,...
    // (a=3,b=5,c=6): a bits {0,1}→z{0,3}; b bits {0,2}→z{1,7}; c bits {1,2}→z{5,8}
    val expect35 = (1L << 0) | (1L << 3) | (1L << 1) | (1L << 7) | (1L << 5) | (1L << 8)
    assert(got == Seq(0L, 1L, 2L, 4L, expect35, (1L << 24) - 1))
    // the SQL rendering is the identical algebra
    val sqlGot = df.selectExpr(
      ZOrderLayout.zvalueNSql(Seq("a", "b", "c")) + " AS z")
      .collect().map(_.getLong(0)).toSeq
    assert(sqlGot == got)
    // 2-dim ladder and the n-dim chain agree on the shared 8-bit domain
    val two = Seq((3L, 5L), (200L, 7L), (255L, 255L)).toDF("x", "y")
    val ladder = two.select(
      ZOrderLayout.zvalue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val chain = two.select(
      ZOrderLayout.zvalueN(Seq(col("x"), col("y"))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(chain == ladder)
  }

  test("z-order layout: second-dimension predicate skips row groups") {
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").bitwiseAND(lit(65535L)).as("x"),
        col("l_partkey").bitwiseAND(lit(65535L)).as("y"),
        col("l_quantity"))
    val base = Files.createTempDirectory("graft_zorder").toString
    // tiny row groups (~100 rows, the parquet-mr flush-check floor) so the
    // 6k-row table gets ~60 of them — enough for tile stats to be tight
    val blk = 2 * 1024

    // layout A: single-key sort by x
    ZOrderLayout.withBlockSize(l, blk) {
      l.repartitionByRange(1, col("x")).sortWithinPartitions("x")
        .write.mode("overwrite").parquet(s"$base/linear")
    }
    // layout B: z-clustered on (x, y)
    ZOrderLayout.writeClustered(l, col("x"), col("y"), s"$base/zorder",
      numFiles = 1, blockSize = blk)

    def q(path: String): DataFrame =
      spark.read.parquet(path).filter(col("y") >= 10 && col("y") < 30)

    val (linearRows, zRows) = (scannedRows(q(s"$base/linear")), scannedRows(q(s"$base/zorder")))
    val expected = q(s"$base/linear").count()
    assert(q(s"$base/zorder").count() == expected, "layouts must hold identical data")
    // x-sorted layout: y-stats are wide in every row group -> reads ~all
    // rows; z layout: y-stats are tile-tight -> most row groups skipped
    assert(zRows < linearRows / 2,
      s"z-order should skip most row groups: z=$zRows linear=$linearRows")
  }

  test("z-order survives a SKEWED dimension (equal-frequency bucketing)") {
    // y is long-tail skewed: ~94% of rows land in y < 64 while the domain
    // stretches to ~6000. Equal-WIDTH bucketing would pack those rows
    // into the first of 256 buckets — one y-bucket value for most data,
    // so tiles can't subdivide y there and a dense-region predicate reads
    // ~everything. Quantile bucketing splits the dense region across
    // many buckets, so tiles stay row-balanced and tight on y even
    // inside the skew — which is where real predicates land.
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").bitwiseAND(lit(65535L)).as("x"),
        // quantity 1..50 (dense head), stretched tail for orderkey%16==0
        when(col("l_orderkey") % 16 === 0,
          col("l_quantity").cast("long") * 120)
          .otherwise(col("l_quantity").cast("long")).as("y"),
        col("l_quantity"))
    val base = Files.createTempDirectory("graft_zskew").toString
    val blk = 2 * 1024
    ZOrderLayout.writeClustered(l, col("x"), col("y"), s"$base/z",
      numFiles = 1, blockSize = blk)
    // a predicate INSIDE the dense head (y in [10, 20)) — ~1/5 of rows
    def q(path: String): DataFrame =
      spark.read.parquet(path).filter(col("y") >= 10 && col("y") < 20)
    val total = l.count()
    val scanned = scannedRows(q(s"$base/z"))
    assert(q(s"$base/z").count() == l.filter(col("y") >= 10 && col("y") < 20).count())
    assert(scanned * 2 < total,
      s"dense-head predicate should skip most row groups: scanned $scanned of $total")
  }
}
