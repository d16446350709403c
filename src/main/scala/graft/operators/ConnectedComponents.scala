package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the clustering
  * step a dedup pipeline needs between "near-dup PAIRS" (Q-llm-02's output)
  * and a keep/drop decision: duplicates are transitive, so pairs must be
  * folded into components and one representative kept per component.
  *
  * Algorithm: every node starts labeled with its own id; each round, a node
  * takes the min of its label and its neighbors' labels; converged when no
  * label changes. Rounds needed = component diameter (small for dup
  * clusters). Each round is one shuffled equi-join + groupBy — the same
  * driver-coordinated iterative shape GraphX/Pregel use, every step fully
  * distributed; nothing driver-side but the convergence counter.
  *
  * Deterministic: min-label is order-independent, so the result is a pure
  * function of the edge set (no RNG, no partition sensitivity) — which is
  * what lets a DuckDB recursive-closure oracle hash-match it.
  */
object ConnectedComponents {

  /** @param nodes one column `id`; @param edges columns `a`, `b`
    * (undirected, any orientation). Returns (id, label) with label = min
    * node id of the component. */
  def minLabel(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("a").as("x"), col("b").as("y"))
      .unionAll(edges.select(col("b").as("x"), col("a").as("y")))
      .persist()
    var labels = nodes.select(col("id"), col("id").as("label")).persist()
    labels.count()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val minNbr = sym
        .join(labels.select(col("id").as("y"), col("label").as("ly")), "y")
        .groupBy("x").agg(min("ly").as("ln"))
        .withColumnRenamed("x", "id")
      val next = labels.join(minNbr, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("ln"), col("label"))).as("label"))
        .persist()
      next.count()
      changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.label") =!= col("o.label")).count()
      labels.unpersist()
      labels = next
      i += 1
    }
    sym.unpersist()
    labels
  }
}
