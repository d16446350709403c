package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.operators.LabelPropagation

/** Hand-computed LPA cases pinning the three semantics the oracle
  * hash-match depends on: plurality wins, ties break to the SMALLEST
  * label, and rounds are synchronous (round i reads only round i-1). */
class LabelPropagationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("plurality beats a smaller minority label") {
    // dst 9 hears label 5 twice (multi-edge) and label 1 once: count
    // wins over label order, so 9 adopts 5, not the smaller 1.
    val r = labels(Seq(5L -> 9L, 5L -> 9L, 1L -> 9L), 1)
    assert(r(9L) == 5L)
  }

  test("count ties break toward the smallest label") {
    val r = labels(Seq(7L -> 9L, 3L -> 9L), 1)
    assert(r(9L) == 3L)
  }

  test("disjoint symmetrized triangles converge to each component's min id") {
    def tri(a: Long, b: Long, c: Long) =
      Seq(a -> b, b -> a, b -> c, c -> b, a -> c, c -> a)
    val edges = tri(1, 2, 3) ++ tri(10, 11, 12)
    // Round 1 (synchronous: all votes carry self-labels): in a triangle
    // every node sees two count-1 labels, ties to the smaller — so node 1
    // holds 2, nodes 2 and 3 hold 1. Round 2 finishes the takeover.
    val r1 = labels(edges, 1)
    assert(r1(1L) == 2L && r1(2L) == 1L && r1(3L) == 1L)
    val r2 = labels(edges, 2)
    assert(Seq(1L, 2L, 3L).forall(r2(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(r2(_) == 10L))
  }

  test("directed graph: dst-only nodes are seeded, in-degree-0 nodes persist") {
    // 1 -> 2 -> 3 is a pure directed chain: node 1 has no in-edges (must
    // keep its self-label every round, and its votes must keep flowing),
    // node 3 is dst-only (must still appear, self-labeled at round 0).
    val r1 = labels(Seq(1L -> 2L, 2L -> 3L), 1)
    assert(r1 == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    // Synchronous round 2: 3 adopts 2's ROUND-1 label (1), not its seed.
    val r2 = labels(Seq(1L -> 2L, 2L -> 3L), 2)
    assert(r2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("result is invariant to input partitioning (pure integer argmax)") {
    val rnd = new scala.util.Random(13)
    val base = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = base ++ base.map(_.swap)
    val r1 = labels(Seq.empty ++ edges, 3)
    val r17Df = edges.toDF("src", "dst").repartition(17)
    val r17 = LabelPropagation.run(r17Df, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r17)
  }
}
