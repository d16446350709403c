package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession

/** Sanity layer under the DuckDB oracle gate (SURVEY.md §5): every registered
  * query must run and return rows at sf0.001, every oracle key must point at
  * a registered query, and approximate ops stay within their error bounds.
  * Value-level correctness is the driver's DuckDB hash-compare (and
  * `tools/oracle_check.py` locally); this suite catches wiring breaks fast.
  */
class RegistrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")
  val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = q(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("Q-agg-04 HLL stays within 5% of exact distinct counts") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("Q-agg-04")(spark, sf)
      .select("l_returnflag", "approx_orders").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.core.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx=$a exact=$e")
    }
  }

  test("Q-agg-12 HLL sketches (per-year and union-merged) stay within 5% of exact") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("Q-agg-12")(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    // per-year rows carry their own exact count in the result
    for ((yr, r) <- rows if yr >= 0) {
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"year $yr: est=$est exact=$exact")
    }
    // merged row (yr = -1) is checked against a directly-computed global
    val globalExact = graft.core.Tables.orders(spark, sf)
      .agg(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    val merged = rows(-1L).getLong(1)
    assert(math.abs(merged - globalExact).toDouble / globalExact < 0.05,
      s"union: est=$merged exact=$globalExact")
  }

  test("Q-agg-07-approx stays within 2% of exact percentiles") {
    val approx = SparkEntry.queries("Q-agg-07-approx")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = SparkEntry.queries("Q-agg-07")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    for ((k, (e25, e50, e90)) <- exact) {
      val (a25, a50, a90) = approx(k)
      for ((a, e) <- Seq((a25, e25), (a50, e50), (a90, e90)))
        assert(math.abs(a - e) / e < 0.02, s"$k: approx=$a exact=$e")
    }
  }
}
