package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{EngineSession, Tables}
import graft.operators.BucketJoin

/** A/B: NAIVE vs CHUNKED band-bucket candidate join on the real sf
  * corpus (round-10 ledger evidence) — the chunked re-key must cost ~0
  * where no bucket exceeds the cap (nc = 1 everywhere → replication
  * factor 1; the only addition is the bucket-size window pass). Both
  * forms produce the identical candidate set (BucketJoinSpec), so this
  * measures pure plan overhead, isolated from host drift by running in
  * ONE JVM back-to-back. Usage: runMain graft.tools.DedupAb [sfDir]. */
object DedupAb {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = EngineSession.getOrCreate("graft-ab")
    import graft.functions.TextFunctions.shingleRows
    graft.functions.MinHashSig.register(spark)

    def bands() = {
      val sh = shingleRows(Tables.documents(spark, d), "doc_id", "text", 3)
        .distinct()
      sh.groupBy("doc_id").agg(expr("minhash_sig(sh, 6)").as("sig"))
        .select(col("doc_id"), posexplode(col("sig")))
        .select(col("doc_id"), col("pos").as("band_id"), col("col").as("key"))
    }
    def naive(): Long = {
      val b = bands()
      b.as("x").join(b.as("y"),
          col("x.band_id") === col("y.band_id") &&
          col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct().count()
    }
    def chunked(): Long =
      BucketJoin.selfPairs(bands(), Seq("band_id", "key"), "doc_id", 256)
        .select(col("a_doc_id").as("a"), col("b_doc_id").as("b"))
        .distinct().count()

    def time(what: String)(body: => Long): Double = {
      val runs = (1 to 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); val n = body
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      val best = runs.map(_._1).min
      println(f"""{"form":"$what","minSec":$best%.3f,"rows":${runs.head._2}}""")
      best
    }
    naive(); chunked() // warm-up both paths
    val a = time("naive")(naive())
    val b = time("chunked")(chunked())
    println(f"""{"overhead":${b / a}%.3f}""")
    spark.stop()
  }
}
