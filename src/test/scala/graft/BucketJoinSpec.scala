package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.operators.BucketJoin

/** [[graft.operators.BucketJoin]] — the hot-bucket armor under every
  * blocked candidate join (Q-llm-02/16/24/44/58/63). The load-bearing
  * property is EXACTNESS: the chunked plans must emit the exact pair set
  * of the naive bucket join for ANY cap, including cap = 1 (maximal
  * chunking — every member its own chunk), so that no consumer's oracle
  * ever notices the armor.
  */
class BucketJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")
  import spark.implicits._

  /** Skewed fixture: bucket b holds (b*7 % 13) + extra members for b=0 —
    * one deliberately hot bucket among small ones, deterministic ids. */
  private def fixture(hot: Int) = {
    val rows = for {
      b <- 0 until 13
      k = (b * 7) % 13 + (if (b == 0) hot else 1)
      i <- 0 until k
    } yield (b.toLong, (b * 1000 + i).toLong, s"p$b-$i")
    rows.toDF("bucket", "id", "payload")
  }

  private def naivePairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.as("x").join(df.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("selfPairs == naive bucket self-join for caps 1, 3, 64 (hot bucket included)") {
    val df = fixture(hot = 40)
    val expect = naivePairs(df)
    for (cap <- Seq(1, 3, 64)) {
      val got = BucketJoin.selfPairs(df, Seq("bucket"), "id", cap)
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, s"cap=$cap: ${got.size} vs ${expect.size} pairs")
    }
  }

  test("selfPairs carries payload columns on both sides, a = lower id") {
    val df = fixture(hot = 8)
    val rows = BucketJoin.selfPairs(df, Seq("bucket"), "id", cap = 2)
      .select("a_bucket", "a_id", "a_payload", "b_id", "b_payload")
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(3), "a must be the lower-id side")
      assert(r.getString(2) == s"p${r.getLong(0)}-${r.getLong(1) % 1000}")
      assert(r.getString(4) == s"p${r.getLong(0)}-${r.getLong(3) % 1000}")
    }
  }

  test("bipartitePairs == naive bipartite bucket join for caps 1, 4 (hot on both sides)") {
    val df = fixture(hot = 30)
    val left = df.filter(col("id") % 3 === 0)
    val right = df.filter(col("id") % 3 =!= 0)
    val expect = left.as("x").join(right.as("y"),
        col("x.bucket") === col("y.bucket"))
      .select(col("x.id"), col("y.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (cap <- Seq(1, 4)) {
      val got = BucketJoin
        .bipartitePairs(df, col("id") % 3 === 0, Seq("bucket"), "id", cap)
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, s"cap=$cap: ${got.size} vs ${expect.size} pairs")
    }
  }

  test("starEdges: linear edge count, same components as the all-pairs candidate graph") {
    val df = fixture(hot = 40)
    val star = BucketJoin.starEdges(df, Seq("bucket"), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // O(k) per bucket: strictly fewer edges than members (distinct
    // across buckets can only shrink), every edge oriented min -> member
    val members = df.count()
    assert(star.length < members, s"${star.length} edges for $members members")
    star.foreach { case (a, b) => assert(a < b) }
    // identical connected components: union-find both graphs
    def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val ids = df.select("id").as[Long].collect()
      ids.map(i => i -> find(i)).toMap
    }
    val viaStar = components(star.toSeq)
    val viaPairs = components(naivePairs(df).toSeq)
    assert(viaStar == viaPairs,
      "star components must equal all-pairs candidate components")
  }
}
