package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{EngineSession, Tables}
import graft.operators.IvfIndex

/** Dev tool: per-query recall@10 of the IVF index vs the exact cosine
  * top-10, at each sfDir passed as an arg — the measurement behind
  * Q-llm-08's per-query recall bound (the literal the oracle pins must
  * sit under the worst per-query value across SFs, not the pooled mean).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = EngineSession.getOrCreate("graft-recall-probe")
    for (d <- args) {
      graft.functions.CosineSim.register(spark)
      val emb = Tables.embeddings(spark, d)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val ivf = IvfIndex.search(emb, qs, "vec_id", "embedding",
          "query_id", "q_emb", nlist = 16, nprobe = 8, k = 10)
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"))
      val scored = emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          expr("cosine_sim(q_emb, embedding)").as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
      val exact = scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10).select(col("query_id"), col("vec_id"))
      val hits = exact.join(ivf, Seq("query_id", "vec_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val out = (0L to 4L).map(q => s"$q:${hits.getOrElse(q, 0L)}/10")
      println(s"[recall] $d  ${out.mkString("  ")}")
    }
    spark.stop()
  }
}
