package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{EngineSession, Tables}
import graft.queries.Clustering

/** Pins the SemDeDup (Q-llm-44) contract on real data by recomputing
  * the whole policy brute-force from collected vectors: drop a vector
  * iff some lower-id cluster-mate sits inside cosine τ (τ² = 4/25 in
  * the integer algebra). Exact set equality against the distributed
  * pair-join result catches a broken join key, a flipped kept flag, or
  * a tie-break drift — anything short of both sides being wrong the
  * same way. Cleanness of the kept set follows from the policy. */
class SemDeDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  private val sf = "/root/testdata/sf0.001"

  // same τ²=4/25 rational as the query
  private def near(a: Array[Long], b: Array[Long]): Boolean = {
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot > 0 && 25L * dot * dot >= 4L * na * nb
  }

  test("kept flag equals the brute-force policy; drops exist; kept set clean") {
    val emb = Tables.embeddings(spark, sf)
    val verdict = Clustering.queries("Q-llm-44")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(verdict.map(_._1).distinct.length == emb.count(),
      "every vector gets exactly one verdict")

    val t = graft.operators.KMeans
      .trained(emb, "vec_id", "embedding", 8, 6, 1000)
      .collect()
      .map(r => (r.getLong(0), (r.getSeq[Long](1).toArray, r.getInt(2))))
      .toMap
    // the policy, brute force: lowest-id-wins within each cluster
    val expectDropped = t.keys.filter { id =>
      val (v, c) = t(id)
      t.exists { case (o, (ov, oc)) => o < id && oc == c && near(ov, v) }
    }.toSet

    val gotDropped = verdict.collect { case (id, _, false) => id }.toSet
    assert(gotDropped == expectDropped,
      s"policy drift: only-in-query=${gotDropped -- expectDropped}, " +
        s"only-in-bruteforce=${expectDropped -- gotDropped}")
    assert(gotDropped.nonEmpty, "sf0.001 contains semantic dups; none flagged")
    // cluster column in the verdict must be the trained assignment
    verdict.foreach { case (id, cl, _) => assert(cl == t(id)._2.toLong) }
    // kept set is clean: no near pair survives inside a cluster
    val kept = verdict.collect { case (id, _, true) => id }.sorted
    for (i <- kept.indices; j <- i + 1 until kept.length
         if t(kept(i))._2 == t(kept(j))._2)
      assert(!near(t(kept(i))._1, t(kept(j))._1),
        s"kept pair (${kept(i)}, ${kept(j)}) is still a near-dup")
  }
}
