package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.operators.PageRank

/** PageRank invariants on graphs with known fixed points. */
class PageRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("cycle graph: every node holds rank 1.0 at any iteration count") {
    val cycle = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    for (iters <- Seq(1, 5)) {
      val r = ranks(cycle, iters)
      assert(r.size == 4)
      r.values.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
    }
  }

  test("symmetrized star: hub rank matches the closed form and mass = |V|") {
    // hub 0 <-> leaves 1..4. Fixed point of h = 0.15 + 0.85*(4*l),
    // l = 0.15 + 0.85*h/4  =>  h = 88/37, l = 24.25/37 (mass h+4l = 5).
    val star = (1L to 4L).flatMap(l => Seq(0L -> l, l -> 0L))
    val r = ranks(star, 60) // geometric 0.85^k decay -> ~6e-5 left
    assert(math.abs(r(0L) - 88.0 / 37.0) < 1e-4)
    (1L to 4L).foreach(l => assert(math.abs(r(l) - 24.25 / 37.0) < 1e-4))
    assert(math.abs(r.values.sum - 5.0) < 1e-6) // mass is exact each round, not asymptotic
  }

  test("rank mass is conserved at |V| every iteration (no dangling nodes)") {
    // seeded pseudo-random symmetric graph on 50 nodes
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(200)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = (base ++ base.map(_.swap)).distinct
    val n = edges.map(_._1).distinct.size
    for (iters <- Seq(1, 4)) {
      val total = ranks(edges, iters).values.sum
      assert(math.abs(total - n) < 1e-6, s"mass $total != $n at $iters iters")
    }
  }

  test("result is invariant to input partitioning") {
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(150)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = (base ++ base.map(_.swap)).distinct
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df17 = edges.toDF("src", "dst").repartition(17)
    val r1 = PageRank.run(df1, 6).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val r17 = PageRank.run(df17, 6).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r1 == r17) // decimal sums make this EXACT, not approximate
  }
}
