package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession

/** GraftExtensions: the library's SparkSessionExtensions install path, and
  * batch==streaming equivalence inside Spark itself (SURVEY §5.2-3) — the
  * DuckDB oracle already checks both against SQL; this asserts the two
  * Spark execution modes agree with each other bit-for-bit.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("cosine_sim is available on a session built with GraftExtensions") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val sim = Seq((Array(1f, 0f), Array(1f, 0f))).toDF("a", "b")
        .selectExpr("cosine_sim(a, b) AS s").head.getDouble(0)
      assert(math.abs(sim - 1.0) < 1e-12)
      val dist = Seq((Array(0f, 0f), Array(3f, 4f))).toDF("a", "b")
        .selectExpr("l2_distance(a, b) AS d").head.getDouble(0)
      assert(dist == 5.0)
      val sig = Seq("x", "y", "x").toDF("sh")
        .selectExpr("minhash_sig(sh, 2) AS sig").head.getSeq[String](0)
      assert(sig.length == 2 && sig.forall(_.length == 32))
      // misuse must fail with the usage message, not an internal cast error
      def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
        .takeWhile(_ != null).map(m => String.valueOf(m.getMessage)).mkString(" | ")
      val badArity = intercept[Exception] {
        Seq("x").toDF("sh").selectExpr("minhash_sig(sh)").collect()
      }
      assert(chain(badArity).contains("minhash_sig(shingles, k)"))
      val badK = intercept[Exception] {
        Seq("x").toDF("sh").selectExpr("minhash_sig(sh, sh)").collect()
      }
      assert(chain(badK).contains("minhash_sig(shingles, k)"))
      val zeroK = intercept[Exception] {
        Seq("x").toDF("sh").selectExpr("minhash_sig(sh, 0)").collect()
      }
      assert(chain(zeroK).contains("must be positive"))
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("streaming tumbling-window replay == batch computation (Spark vs Spark)") {
    val spark = EngineSession.getOrCreate("graft-test")
    val sf = "/root/testdata/sf0.001"
    val streaming = SparkEntry.queries("Q-str-01")(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = graft.core.Tables.events(spark, sf)
      .groupBy(
        (floor(unix_timestamp(col("ts")) / 10) * 10).as("ws_sec"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Portable.r(
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 10)))
            .cast("double"), 2).as("val_sum"))
      .collect().map(_.toSeq).toSet
    assert(streaming == batch)
  }

  test("streaming dedup == batch distinct (Spark vs Spark)") {
    val spark = EngineSession.getOrCreate("graft-test")
    val sf = "/root/testdata/sf0.001"
    val streaming = SparkEntry.queries("Q-str-06")(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = graft.core.Tables.events(spark, sf)
      .select("user_id", "event_type").distinct()
      .collect().map(_.toSeq).toSet
    assert(streaming == batch)
  }
}
