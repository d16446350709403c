package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSim

/** Random-hyperplane LSH approximate nearest neighbor over an embedding
  * column — the second ANN scale path beside [[IvfIndex]] (SURVEY.md north
  * star: "IVF or LSH-bucketed variant").
  *
  * Sign-of-projection LSH with `nTables` independent hash tables: in each
  * table, `nBits` fixed hyperplanes map every vector to an `nBits`-bit
  * bucket (bit i = sign of the dot with plane i, via the codegen
  * [[CosineSim]] — same sign as the raw dot). A query probes, per table,
  * its own bucket plus the `nBits` buckets at Hamming distance 1
  * (multi-probe); the per-table candidate lists are unioned and DEDUPED
  * BEFORE exact cosine scoring — one table of b bits catches a θ-degree
  * neighbor per bit with p = 1 - θ/π, so tables multiply recall
  * (1-(1-p₁)^L) while dedup keeps the expensive exact pass linear in
  * distinct candidates.
  *
  * Scale shape: bucketing is one shuffle-free map pass; the index is the
  * corpus replicated `nTables` times keyed by (table, bucket) — at 100 TB
  * it would be written partitioned by those keys so a probe reads only
  * matching files; probing is an equi-join; dedup is a groupBy on the
  * candidate pair; the final exact top-k gets a partial WindowGroupLimit.
  *
  * Determinism: planes come from a fixed-seed generator and are embedded as
  * *literals* in both the Spark plan and the DuckDB oracle SQL
  * ([[planesSqlValues]]), so the whole approximate result hash-matches.
  */
object LshIndex {

  /** Deterministic hyperplanes: `nTables*nBits` x `dim` floats in [-1, 1)
    * from a fixed-seed LCG; plane t*nBits+i is bit i of table t. */
  def planes(dim: Int, nBits: Int, nTables: Int, seed: Long = 42L): Array[Array[Float]] = {
    val r = new scala.util.Random(seed)
    Array.fill(nTables * nBits, dim)(r.nextFloat() * 2f - 1f)
  }

  /** Bucket id of table `t`: sum of (dot(vec, plane_{t*nBits+i}) >= 0) << i.
    * Per-plane reference form — [[graft.functions.SignBits]] is the fused
    * production path; LshIndexSpec pins their bucket equality. */
  def bucketCol(vec: Column, ps: Array[Array[Float]], nBits: Int, t: Int): Column =
    (0 until nBits).map { i =>
      when(call_udf("cosine_sim", vec, typedlit(ps(t * nBits + i).toSeq)) >= 0,
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** ANN search: corpus rows matching `qPred` become the query set.
    * Output: (query_id, <idCol>, sim, rk). */
  def search(
      emb: DataFrame, idCol: String, vecCol: String, qPred: Column,
      ps: Array[Array[Float]], nBits: Int, k: Int): DataFrame = {
    CosineSim.register(emb.sparkSession)
    graft.functions.SignBits.register(emb.sparkSession, ps, nBits)
    val nTables = ps.length / nBits
    // ONE vector traversal computes every table's bucket (the fused
    // SignBits codegen kernel) — the per-plane form cost nTables×nBits
    // full dot products per corpus row and (nBits+1)× that on the
    // multi-probe side
    // null-vector rows: sign_bits(null) is null, which would DROP the
    // corpus row at posexplode and null out probe buckets — coalesce to
    // the all-zero signature so nulls index/probe under bucket 0 in every
    // table, bit-identical to the per-plane form (whose when() fell
    // through to 0 when cosine_sim returned null)
    val sig = coalesce(call_udf("sign_bits", col(vecCol)),
      array_repeat(lit(0), lit(nTables)))
    // the index: corpus keyed by (table, bucket) — nTables rows per vector
    val corpus = emb
      .select(col(idCol), col(vecCol), posexplode(sig))
      .select(col(idCol), col(vecCol), col("pos").as("t"),
        col("col").as("bucket"))
    // per table: own bucket + every Hamming-1 neighbor — cheap bit ops
    // over the one materialized signature array
    val probeStructs = (0 until nTables).flatMap { t =>
      val own = element_at(col("__sig"), t + 1)
      struct(lit(t).as("t"), own.as("bucket")) +:
        (0 until nBits).map(j =>
          struct(lit(t).as("t"), own.bitwiseXOR(lit(1 << j)).as("bucket")))
    }
    val probes = emb.filter(qPred)
      .withColumn("__sig", sig)
      .select(col(idCol).as("query_id"),
        explode(array(probeStructs: _*)).as("tb"))
      .select(col("query_id"), col("tb.t"), col("tb.bucket"))
    // union candidates across tables, dedup BEFORE the exact scoring pass
    val cand = probes.join(corpus, Seq("t", "bucket"))
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol)).distinct()
    val qVecs = emb.filter(qPred).select(col(idCol).as("query_id"), col(vecCol).as("q_emb"))
    val wk = Window.partitionBy("query_id").orderBy(col("sim").desc, col(idCol))
    cand.join(qVecs, "query_id")
      .join(emb.select(col(idCol), col(vecCol)), idCol)
      .withColumn("sim", call_udf("cosine_sim", col("q_emb"), col(vecCol)))
      .withColumn("rk", row_number().over(wk).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(idCol), col("sim"), col("rk"))
  }

  /** The planes as a DuckDB `VALUES` list `(t, bit, pv FLOAT[])` — the same
    * float literals the Spark plan uses (Float.toString round-trips). */
  def planesSqlValues(ps: Array[Array[Float]], nBits: Int): String =
    ps.zipWithIndex.map { case (p, i) =>
      s"(${i / nBits}, ${i % nBits}, [${p.mkString(", ")}]::FLOAT[])"
    }.mkString(",\n             ")
}
