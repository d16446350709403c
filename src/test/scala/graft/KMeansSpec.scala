package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{EngineSession, Tables}
import graft.operators.KMeans

/** Pins the trained-clustering contract: partitioning-independent
  * determinism (the fixed-point discipline), exhaustive assignment,
  * exact quantized distances, and the empty-cluster carry-forward
  * path that real data never exercises. */
class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  private val sf = "/root/testdata/sf0.001"

  test("deterministic across input partitioning; assignment exhaustive") {
    val emb = Tables.embeddings(spark, sf)
    val a = KMeans.run(emb.repartition(7), "vec_id", "embedding", 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = KMeans.run(emb.repartition(3), "vec_id", "embedding", 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b, "assignment must not depend on physical partitioning")
    assert(a.size == emb.count(), "every vector assigned exactly once")
    assert(a.map(_._2).forall(c => c >= 0 && c < 4))
    // Lloyd's on real data should actually use the model capacity
    assert(a.map(_._2).size > 1, "expected more than one populated cluster")
  }

  test("dist2 is the exact quantized squared L2 to the learned centroid") {
    import spark.implicits._
    // 1-d points; quantization goes through the FLOAT value's exact
    // double widening, so floor(x*1000) of 0.001f/0.002f is 1/2 but of
    // 0.010f/0.011f/0.012f is 9/10/12 — quantized clusters {0,1,2} and
    // {9,10,12}, centroids floor(3/3)=1 and floor(31/3)=10
    val pts = Seq(0L -> 0.000, 1L -> 0.001, 2L -> 0.002,
                  3L -> 0.010, 4L -> 0.011, 5L -> 0.012)
      .map { case (id, v) => (id, Seq(v.toFloat)) }
      .toDF("vec_id", "embedding")
    val out = KMeans.run(pts, "vec_id", "embedding", 2, 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == (0L, 1L) && out(1L) == (0L, 0L) && out(2L) == (0L, 1L))
    assert(out(3L) == (1L, 1L) && out(4L) == (1L, 0L) && out(5L) == (1L, 4L))
  }

  test("a cluster that loses every member keeps its previous centroid") {
    import spark.implicits._
    // seeds are ids 0 and 1 with IDENTICAL vectors: every point ties to
    // cluster 0 (lowest-id tie-break), cluster 1 is empty from round 1 —
    // the update must carry centroid 1 forward, not crash or shrink k
    val pts = (0L until 6L).map(id => (id, Seq(0.1f, 0.2f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.run(pts, "vec_id", "embedding", 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 6)
    assert(out.forall(_._2 == 0L), "ties must break to the lowest cluster")
    assert(out.forall(_._3 == 0L), "identical vectors sit on the centroid")
  }

  test("refinement: trained centroids fit at least as well as the seeds") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    def totalDist(iters: Int): Long =
      KMeans.run(emb, "vec_id", "embedding", 4, iters)
        .agg(sum("dist2")).collect()(0).getLong(0)
    assert(totalDist(6) < totalDist(0),
      "6 Lloyd rounds must tighten total within-cluster distance vs the raw seeds")
  }
}
