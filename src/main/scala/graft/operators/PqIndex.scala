package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN — the sixth similarity scale path (after
  * brute cosine/L2, IVF, hyperplane-LSH, int8 quantization, matryoshka
  * truncation): each vector is split into `m` subvectors, every subvector
  * replaced by the id of its nearest codeword from a per-subspace
  * codebook. A 64-float vector compresses to `m` small codes (32x at
  * m=8, k=16), and query distance is approximated by summing per-subspace
  * LOOKUP-TABLE distances (ADC) — the corpus is scanned without touching
  * a single original float.
  *
  * Everything is deterministic AND engine-portable (hash-matched by
  * Q-llm-37's DuckDB oracle): codebooks come from the IvfIndex strided
  * sample (no RNG, no Lloyd — stratified codewords), every distance is a
  * sequential double fold over the subvector (the CosineSim/list_sum
  * algebra, proven bit-identical), argmins and rank cuts tie-break on
  * ids, and ADC sums fold the per-subspace terms in subspace order.
  *
  * Scale shape: the codebook is m×k rows (broadcast); encoding is one
  * narrow map over the corpus (per row: m×k codeword comparisons);
  * search joins the m×k query lookup table against the code table on
  * (subspace, code) — an equi-join whose left side is tiny — then one
  * partial-top-k window. No shuffle ever carries a raw vector.
  */
object PqIndex {

  /** Sequential-double squared L2 between two float-array columns —
    * zip/fold in index order, matching DuckDB's
    * list_sum(list_transform(...)) term-for-term. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, t) => acc + t)

  /** Per-subspace codebook: codeword (sub, k) = the k-th strided vector's
    * sub-th slice (the IvfIndex sampling scheme applied per subspace). */
  def codebook(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, dim: Int): DataFrame = {
    val sub = dim / m
    val n = emb.count()
    val step = math.max(n / k, 1L)
    emb.filter(col(idCol) % step === 0 && col(idCol) / step < k)
      .select((col(idCol) / step).cast("int").as("code"), col(vecCol).as("v"))
      .select(col("code"), explode(sequence(lit(0), lit(m - 1))).as("sub"), col("v"))
      .select(col("sub"), col("code"),
        slice(col("v"), col("sub") * sub + lit(1), lit(sub)).as("codeword"))
  }

  /** Encode the corpus: (id, sub, code) — each subvector replaced by its
    * nearest codeword id (ties to the lowest code). */
  def encode(emb: DataFrame, cb: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int): DataFrame = {
    val sub = dim / m
    val exploded = emb
      .select(col(idCol), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col(vecCol).as("v"))
      .select(col(idCol), col("sub"),
        slice(col("v"), col("sub") * sub + lit(1), lit(sub)).as("subvec"))
    val w = Window.partitionBy(idCol, "sub")
      .orderBy(col("cw_dist"), col("code"))
    exploded.join(broadcast(cb), "sub")
      .withColumn("cw_dist", sqDist(col("subvec"), col("codeword")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("sub"), col("code"))
  }

  /** ADC search: approximate distances from the query→codeword lookup
    * table, `rerank` candidates re-scored exactly, top `k` returned.
    * Output: (qIdCol, idCol, dist, rk) with exact sequential-double L2
    * in `dist`. */
  def search(emb: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      m: Int, kCode: Int, dim: Int, rerank: Int, k: Int): DataFrame = {
    val sub = dim / m
    val cb = codebook(emb, idCol, vecCol, m, kCode, dim)
    val codes = encode(emb, cb, idCol, vecCol, m, dim)

    // query lookup table: squared distance to every codeword (m×k rows/query)
    val lut = queries
      .select(col(qIdCol), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col(qVecCol).as("qv"))
      .select(col(qIdCol), col("sub"),
        slice(col("qv"), col("sub") * sub + lit(1), lit(sub)).as("qsub"))
      .join(broadcast(cb), "sub")
      .withColumn("term", sqDist(col("qsub"), col("codeword")))
      .select(col(qIdCol), col("sub"), col("code"), col("term"))

    // ADC: fold the m per-subspace terms in subspace order (portable sum)
    val adc = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col(qIdCol) =!= col(idCol))
      .groupBy(qIdCol, idCol)
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("sub"), col("term")))),
          t => t.getField("term")),
        lit(0.0), (acc, t) => acc + t).as("adc"))
    val wc = Window.partitionBy(qIdCol).orderBy(col("adc"), col(idCol))
    val candidates = adc.withColumn("rn", row_number().over(wc))
      .filter(col("rn") <= rerank)
      .select(col(qIdCol), col(idCol))

    // exact re-rank of the survivors
    graft.functions.L2Distance.register(emb.sparkSession)
    val wk = Window.partitionBy(qIdCol).orderBy(col("dist"), col(idCol))
    candidates
      .join(emb.select(col(idCol), col(vecCol).as("cand_v")), idCol)
      .join(broadcast(queries.select(col(qIdCol), col(qVecCol).as("q_v"))), qIdCol)
      .withColumn("dist", expr("l2_distance(q_v, cand_v)"))
      .withColumn("rk", row_number().over(wk).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col(qIdCol), col(idCol), col("dist"), col("rk"))
  }
}
