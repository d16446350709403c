package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSim

/** IVF-Flat approximate nearest neighbor over an embedding column
  * (SURVEY.md north star: similarity-search scale path).
  *
  * Brute force compares every query against every vector — O(|Q|·|N|) at
  * 100 TB that's the whole corpus per query. IVF partitions the corpus into
  * `nlist` Voronoi cells; a query probes only its `nprobe` nearest cells, so
  * the scan shrinks by ~nprobe/nlist while recall stays high for clustered
  * data.
  *
  * Cluster mechanics (all shuffle-sane):
  *  - centroids: deterministic sample of the corpus (every k-th vector) —
  *    broadcast (nlist rows);
  *  - assignment: one map-side pass, each vector scored against the
  *    broadcast centroids via the codegen [[CosineSim]], argmax by ranking;
  *  - the cell id becomes the partition key: on a cluster you'd
  *    `.repartition(col("centroid_id"))` and persist bucketed-by-cell so a
  *    probe touches only matching files (partition pruning).
  */
object IvfIndex {

  /** Deterministic centroid sample: every (n/nlist)-th vector by id. */
  def centroids(emb: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame = {
    val n = emb.count()
    val step = math.max(n / nlist, 1L)
    emb.filter(col(idCol) % step === 0 && col(idCol) / step < nlist)
      .select((col(idCol) / step).cast("int").as("centroid_id"),
        col(vecCol).as("centroid_vec"))
  }

  /** Assign every vector to its nearest centroid. */
  def assign(emb: DataFrame, cents: DataFrame, idCol: String, vecCol: String): DataFrame = {
    CosineSim.register(emb.sparkSession)
    val scored = emb.crossJoin(broadcast(cents))
      .withColumn("sim_c", expr(s"cosine_sim($vecCol, centroid_vec)"))
    val w = Window.partitionBy(idCol).orderBy(col("sim_c").desc, col("centroid_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** ANN search: probe the `nprobe` nearest cells per query, exact top-k
    * within the probed cells. */
  def search(
      emb: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      nlist: Int, nprobe: Int, k: Int): DataFrame = {
    CosineSim.register(emb.sparkSession)
    val cents = centroids(emb, idCol, vecCol, nlist)
    val assigned = assign(emb, cents, idCol, vecCol)

    val wq = Window.partitionBy(qIdCol).orderBy(col("sim_c").desc, col("centroid_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("sim_c", expr(s"cosine_sim($qVecCol, centroid_vec)"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col(qIdCol), col(qVecCol), col("centroid_id"))

    val wk = Window.partitionBy(qIdCol).orderBy(col("sim").desc, col(idCol))
    probes.join(assigned, "centroid_id")
      .filter(col(qIdCol) =!= col(idCol))
      .withColumn("sim", expr(s"cosine_sim($qVecCol, $vecCol)"))
      .withColumn("rk", row_number().over(wk).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col(qIdCol), col(idCol), col("sim"), col("rk"))
  }
}
