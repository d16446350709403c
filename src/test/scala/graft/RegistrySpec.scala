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

  // the multi-commit / multi-epoch queries cost ≥5 s each even at
  // sf0.001 (their price is commit/epoch count, not data); their
  // wiring is still exercised every round by the driver's Verify gate,
  // so the fastTest subset skips just these rows (~2 min of the suite)
  private val slowRows = Set(
    "Q-llm-56", "Q-llm-59", "Q-qual-11", "Q-qual-18", "Q-qual-20",
    "Q-qual-28", "Q-qual-29", "Q-qual-33", "Q-str-19", "Q-str-20",
    "Q-str-21", "Q-str-23", "Q-str-24", "Q-str-25", "Q-str-27",
    "Q-str-28")

  for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    def body(): Unit = {
      val df = q(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
    if (slowRows(name))
      test(s"$name runs and returns rows at sf0.001", SlowTest)(body())
    else test(s"$name runs and returns rows at sf0.001")(body())
  }

  // The sketch queries emit their error bounds as MEASURED booleans
  // (the oracle pins them as TRUE literals — the hash-match is the
  // quantitative check); these specs assert the same booleans directly
  // so a bound violation fails fast without the DuckDB harness.
  for ((name, boolCols) <- Seq(
      "Q-agg-04" -> Seq("hll_within_5pct", "p50_within_1pct"),
      "Q-agg-07-approx" ->
        Seq("p25_within_1pct", "p50_within_1pct", "p90_within_1pct"),
      "Q-agg-12" -> Seq("est_within_5pct"),
      "Q-llm-08" -> Seq("recall_ge_04")))
    test(s"$name within-bound booleans all hold at sf0.001") {
      val rows = SparkEntry.queries(name)(spark, sf)
        .select(boolCols.head, boolCols.tail: _*).collect()
      assert(rows.nonEmpty)
      for (r <- rows; i <- boolCols.indices)
        assert(r.getBoolean(i), s"$name ${boolCols(i)} violated: $r")
    }
}
