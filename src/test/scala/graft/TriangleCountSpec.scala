package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.operators.TriangleCount
import graft.queries.Graph

/** Hub-split exact triangle counting (Q-graph-11's operator): the
  * chunked wedge re-key must be invisible in the counts — identical to
  * the unsplit oriented join at every cap — while actually engaging on
  * the power-law fixture's celebrity clique. */
class TriangleCountSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")
  import spark.implicits._

  private def census(edges: DataFrame, cap: Int): (Long, Long, Long, Long) = {
    val r = TriangleCount.run(edges, cap).collect().head
    (r.getAs[Long]("n_edges"), r.getAs[Long]("n_wedges"),
      r.getAs[Long]("n_triangles"), r.getAs[Long]("max_outdeg"))
  }

  test("closed forms: triangle, square, K5, star") {
    // oriented wedges = Σ C(outdeg, 2): the triangle orients 1→2, 2→3,
    // 1→3 (total order by (deg, id)) so only node 1 holds a wedge
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b"), 64) ==
      ((3L, 1L, 1L, 2L)))
    // square: one oriented wedge (node 1's {2,4}), 0 triangles
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    assert(census(sq, 64) == ((4L, 1L, 0L, 2L)))
    // K5: C(5,3)=10 triangles; oriented wedges = sum C(outdeg,2) = 10
    val k5 = (for { i <- 1 to 5; j <- (i + 1) to 5 }
      yield (i.toLong, j.toLong)).toDF("a", "b")
    assert(census(k5, 64) == ((10L, 10L, 10L, 4L)))
    // star has no wedges after orientation (all edges point at the hub)
    val star = (1L to 6L).map(l => (0L, l)).toDF("a", "b")
    assert(census(star, 64) == ((6L, 0L, 0L, 1L)))
  }

  // 30 s (4 full censuses); the pinned-census + closed-form cases stay fast
  test("hub splitting is exact: every cap yields identical counts, and cap < max_outdeg engages chunking",
      SlowTest) {
    val edges = Graph.powerLawEdges(spark, 1).cache()
    try {
      // unsplit reference: cap larger than any outdeg → single chunk
      val ref = census(edges, 1 << 20)
      assert(ref._4 == 119L, s"celebrity clique must dominate outdeg: $ref")
      // caps below 119 force multi-chunk re-keys (119/8 → 15 chunks on
      // the clique bottom); counts must not move
      for (cap <- Seq(8, 32, 64))
        assert(census(edges, cap) == ref, s"cap=$cap diverged from $ref")
    } finally edges.unpersist()
  }

  test("power-law fixture census matches the DuckDB-oracle closed numbers") {
    // pinned from the hash-matched CORRECTNESS run — a generator drift
    // (stride, fan, clique size) breaks here before it breaks the gate
    val r = TriangleCount.run(Graph.powerLawEdges(spark, 1), 64)
      .collect().head
    assert(r.getAs[Long]("n_nodes") == 8541L)
    assert(r.getAs[Long]("n_edges") == 20092L)
    assert(r.getAs[Long]("n_wedges") == 287641L)
    assert(r.getAs[Long]("n_triangles") == 287102L)
    assert(r.getAs[Long]("max_deg") == 2119L)
  }
}
