package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.queries.Windows

/** The Q-win-07 running-distinct cardinality guard: size(collect_set()
  * OVER) buffers the whole per-key set per row, so a high-cardinality
  * column must be REFUSED loudly (the latent-OOM path), while the
  * intended low-cardinality column passes through unchanged. */
class WindowsGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  private val sf = "/root/testdata/sf0.001"

  test("low-cardinality column (event_type) passes the guard and computes") {
    val df = Windows.runningDistinct(
      graft.core.Tables.events(spark, sf), "event_type")
    val rows = df.limit(5).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 1L))
  }

  test("high-cardinality column (event_id) is refused before the window plans") {
    val ex = intercept[IllegalArgumentException] {
      Windows.runningDistinct(
        graft.core.Tables.events(spark, sf), "event_id")
    }
    assert(ex.getMessage.contains("running-distinct guard"))
    assert(ex.getMessage.contains("HLL"))
  }

  test("guard threshold is honored (tight limit refuses even event_type)") {
    val ex = intercept[IllegalArgumentException] {
      Windows.runningDistinct(
        graft.core.Tables.events(spark, sf), "event_type", maxDistinct = 1)
    }
    assert(ex.getMessage.contains("running-distinct guard"))
  }
}
