package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.functions.{CosineSim, WeightedStats, WInput}
import graft.operators.AsOfJoin

/** Hand-computed fixtures for the custom operators (SURVEY.md §5.4). */
class CustomOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")
  import spark.implicits._

  test("CosineSim: identical vectors => 1.0; orthogonal => 0.0; zero => null") {
    CosineSim.register(spark)
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),   // parallel
      (Array(1f, 0f), Array(0f, 1f)),            // orthogonal
      (Array(0f, 0f), Array(1f, 1f))             // zero norm
    ).toDF("a", "b").select(expr("cosine_sim(a, b)").as("sim"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(rows(1).getDouble(0)) < 1e-12)
    assert(rows(2).isNullAt(0))
  }

  test("CosineSim: codegen and interpreted eval agree") {
    CosineSim.register(spark)
    val base = Seq((Array(0.3f, -1.2f, 2.5f, 0f), Array(-0.7f, 0.4f, 1.1f, 3f)))
      .toDF("a", "b")
    val viaCodegen = base.select(expr("cosine_sim(a, b)")).head.getDouble(0)
    // force interpreted path
    val e = CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.3f, -1.2f, 2.5f, 0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(-0.7f, 0.4f, 1.1f, 3f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    assert(viaCodegen == interpreted) // bit-identical, same op order
  }

  test("L2Distance: zero for identical, 5 for a 3-4 right triangle, null-safe") {
    graft.functions.L2Distance.register(spark)
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),   // identical => 0
      (Array(0f, 0f), Array(3f, 4f)),            // => 5
      (Array(0f, 0f), Array(0f, 0f))             // zero vectors => 0 (not null)
    ).toDF("a", "b").select(expr("l2_distance(a, b)").as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).getDouble(0) == 5.0)
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("L2Distance: codegen and interpreted eval agree") {
    graft.functions.L2Distance.register(spark)
    val base = Seq((Array(0.3f, -1.2f, 2.5f, 0f), Array(-0.7f, 0.4f, 1.1f, 3f)))
      .toDF("a", "b")
    val viaCodegen = base.select(expr("l2_distance(a, b)")).head.getDouble(0)
    val e = graft.functions.L2Distance(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.3f, -1.2f, 2.5f, 0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(-0.7f, 0.4f, 1.1f, 3f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    assert(viaCodegen == interpreted) // bit-identical, same op order
  }

  test("AsOfJoin.backward: picks latest right <= left, null when none") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 50L), (3L, "u2", 10L))
      .toDF("id", "k", "t")
    val right = Seq(("u1", 40L, "a"), ("u1", 100L, "b"), ("u1", 120L, "c"),
        ("u2", 50L, "d"))
      .toDF("k", "t", "v")
    val out = AsOfJoin.backward(left, right, on = "t", by = "k", payload = Seq("t", "v"))
      .select("id", "right_v").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) == "b")   // right at exactly t=100 matches (inclusive)
    assert(out(2L) == "a")   // latest <= 50 is t=40
    assert(out(3L) == null)  // u2 has no right row <= 10
  }

  test("AsOfJoin.forward: picks earliest right >= left, null when none") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 121L), (3L, "u2", 60L))
      .toDF("id", "k", "t")
    val right = Seq(("u1", 40L, "a"), ("u1", 100L, "b"), ("u1", 120L, "c"),
        ("u2", 50L, "d"))
      .toDF("k", "t", "v")
    val out = AsOfJoin.forward(left, right, on = "t", by = "k", payload = Seq("t", "v"))
      .select("id", "right_v").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) == "b")   // right at exactly t=100 matches (inclusive)
    assert(out(2L) == null)  // u1 has no right row >= 121
    assert(out(3L) == null)  // u2 has no right row >= 60
  }

  test("WeightedStats: matches closed-form on a small fixture") {
    val df = Seq(
      WInput(10.0, 1.0, 2.0), WInput(20.0, 3.0, 4.0), WInput(30.0, 1.0, 6.0))
      .toDF("x", "w", "v")
    val wstats = udaf(WeightedStats)
    val out = df.agg(wstats(col("x"), col("w"), col("v")).as("o"))
      .select("o.wmean", "o.var_v").head
    // wmean = (10*1 + 20*3 + 30*1) / 5 = 100/5 = 20
    assert(math.abs(out.getDouble(0) - 20.0) < 1e-12)
    // var_samp(2,4,6) = 4
    assert(math.abs(out.getDouble(1) - 4.0) < 1e-12)
  }

  test("WeightedStats: merge is order-independent across partitions") {
    val data = (1 to 1000).map(i => WInput(i.toDouble, (i % 7 + 1).toDouble, i * 0.001))
    val wstats = udaf(WeightedStats)
    val one = data.toDS.repartition(1)
      .agg(wstats(col("x"), col("w"), col("v")).as("o"))
      .select("o.wmean").head.getDouble(0)
    val many = data.toDS.repartition(13)
      .agg(wstats(col("x"), col("w"), col("v")).as("o"))
      .select("o.wmean").head.getDouble(0)
    assert(one == many) // decimal accumulation: bit-identical
  }
}
