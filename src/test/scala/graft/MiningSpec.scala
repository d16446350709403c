package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.queries.{CustomOps, Extras, Graph, Mining}

/** Pins the mining operators' semantics beyond the oracle hash:
  * the decision tree (Q-llm-46) must actually LEARN its rule-derived
  * label, the PMI scorer (Q-llm-45) must order by true lift, and the
  * triangle counter (Q-graph-02) must satisfy the wedge/triangle
  * combinatorial invariants. */
class MiningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  private val sf = "/root/testdata/sf0.001"

  test("Q-llm-46 depth-2 tree recovers the label rule (accuracy >= 0.9)") {
    val rows = Mining.queries("Q-llm-46")(spark, sf).collect()
    val acc = rows.count(_.getBoolean(5)).toDouble / rows.length
    assert(rows.nonEmpty)
    assert(acc >= 0.9, s"held accuracy $acc — the 0-1-loss search should " +
      "recover a rule defined by two of its own quantized features")
    // all four leaves of a depth-2 tree are reachable on this corpus
    val leaves = rows.map(r => (r.getLong(2), r.getLong(3))).distinct
    assert(leaves.length >= 3, s"degenerate tree: leaves=$leaves")
  }

  test("Q-llm-45 scores are PMI-monotone and support-filtered") {
    val rows = Mining.queries("Q-llm-45")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cab, ca, cb, score) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(cab >= 5, "support filter")
      assert(cab <= math.min(ca, cb), "pair count bounded by word counts")
      assert(score >= 0)
    }
    val scores = rows.map(_.getLong(5))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "descending score order")
  }

  test("Q-graph-02 invariants: triangles <= wedges, wedges consistent") {
    val r = Graph.queries("Q-graph-02")(spark, sf).collect()(0)
    val (nodes, edges, wedges, tris) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nodes > 0 && edges > 0)
    assert(tris <= wedges, "every triangle closes exactly one wedge")
    assert(edges <= nodes.toLong * (nodes - 1) / 2)
  }

  test("Q-llm-48 binary-sign ANN: recall@10 vs exact cosine bounded") {
    val exact = CustomOps.queries("Q-llm-03")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bin = CustomOps.queries("Q-llm-48")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bin.size == exact.size)
    val recall = (bin & exact).size.toDouble / exact.size
    // 64 sign bits keep coarse direction; the exact re-rank of 50
    // recovers most of the exact top-10
    assert(recall >= 0.5, s"binary-sign recall@10 = $recall")
  }

  test("Q-mm-10 scene-cut: exactly the planted cut found, at its frame") {
    val rows = Extras.queries("Q-mm-10")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nCuts, cutAt) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(nCuts == 1L, s"asset $id: expected exactly one cut, got $nCuts")
      assert(cutAt == 2 + id % 3, s"asset $id: cut at $cutAt")
    }
  }

  test("Q-llm-49 late interaction: query-home docs rank top (self MaxSim = 1)") {
    val rows = Mining.queries("Q-llm-49")(spark, sf).collect()
    assert(rows.nonEmpty)
    // qvecs 0 and 1 live in docs 0 and 1; each contributes a MaxSim of
    // exactly 1.0 to its home doc, so docs 0/1 must hold the top ranks
    val top2 = rows.take(2).map(_.getLong(0)).toSet
    assert(top2 == Set(0L, 1L), s"top-2 docs were $top2")
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("Q-graph-05 k-core peeling: trajectory monotone non-increasing") {
    val rows = Graph.queries("Q-graph-05")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 5 && rows.head._1 == 0L)
    val ns = rows.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"peeling grew the graph: ${ns.toSeq}")
    assert(ns.head > 0)
  }

  test("Q-graph-03 BFS histogram: seeds at dist 0, monotone reachability") {
    val rows = Graph.queries("Q-graph-03")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(0) == 0L, "seed set present at distance 0")
    val dists = rows.map(_.getLong(0))
    assert(dists.sameElements(dists.sorted), "ordered by distance")
    assert(rows.forall(_.getLong(1) > 0))
  }
}
