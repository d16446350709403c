package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.queries.Portable

/** Iterative PageRank over an `(src, dst)` edge DataFrame.
  *
  * Scaled formulation (GraphX-style): every node starts at rank 1.0 and
  * each round computes `rank = 0.15 + 0.85 * sum(in-contributions)`, so
  * the total rank mass stays |V| and no global node count is needed —
  * one less full-graph aggregate per call, and contribution magnitudes
  * stay O(1) where the decimal(30,10) portable sum keeps ~1e-8 relative
  * resolution (a 1/N-normalized rank at 100 TB node counts would sit at
  * the decimal quantum).
  *
  * Scale shape (the part that must survive 1000 executors):
  *  - out-degree is computed once and attached to the edge table once;
  *    the result is hash-partitioned by `src` and persisted — every
  *    iteration's rank join reuses that partitioning, so each round is
  *    exactly two bounded exchanges: ranks by id (|V| rows) into the
  *    join, contributions by dst (partial-agg combined, |V| rows out).
  *    The edge table itself never moves after the setup shuffle.
  *  - each round's rank table is persisted and the previous round freed,
  *    truncating the recompute lineage the same way
  *    ConnectedComponents' distributed loop does.
  *
  * Numeric portability: per-dst contribution sums go through
  * `Portable.dsum` (exact decimal accumulation), and all scalar algebra
  * is plain IEEE doubles with literal constants — the identical op
  * sequence an unrolled SQL oracle performs, so fixed-iteration results
  * hash-match across engines (same trick as the BPE trainer).
  *
  * Assumes every node has at least one out-edge (true for any
  * symmetrized graph; callers with genuinely directed graphs should
  * pre-drop or self-loop dangling nodes — their mass otherwise leaks,
  * which is the standard simplified-PageRank behavior).
  */
object PageRank {

  def run(edges: DataFrame, iterations: Int): DataFrame = {
    val deg = edges.groupBy("src")
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val e = edges.join(deg, "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("rank", lit(1.0))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iterations) {
      // the quotient is floor-rounded to 9 decimals BEFORE the decimal
      // sum: power-of-two out-degrees put rank/outdeg exactly on the
      // decimal(30,10) half-quantum, where engines' cast rounding modes
      // (HALF_UP vs HALF_EVEN) legitimately disagree — a 9-decimal value
      // casts exactly, so no engine ever rounds
      val contrib = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"),
          Portable.r(col("rank") / col("outdeg"), 9).as("c"))
        .groupBy("dst")
        .agg(Portable.dsum(col("c")).as("c"))
      // localCheckpoint (eager) both materializes the round AND truncates
      // the logical plan — with persist alone Catalyst re-analyzes an
      // ever-deepening plan each round, which turns quadratic past ~10
      // iterations. (A multi-executor deployment with executor loss
      // concerns would use reliable checkpoint() to a checkpoint dir
      // instead; same lineage-truncation shape.)
      val next = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit(0.15) + lit(0.85) * coalesce(col("c"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
      prev.foreach(_.unpersist())
      prev = Some(next)
      ranks = next
    }
    e.unpersist()
    nodes.unpersist()
    ranks
  }

  /** PERSONALIZED PageRank: identical iteration shape, but teleport mass
    * lands only on the seed set (`seeds`: a 1-column `id` DataFrame) —
    * rank = 0.15·isSeed + 0.85·Σ in-contributions, started from the seed
    * indicator. Same two bounded exchanges per round, same decimal
    * portability; the seed flag joins once into the node table (a
    * broadcast at typical seed-set sizes) and rides every round as a
    * column, never re-joined. */
  def runPersonalized(edges: DataFrame, iterations: Int,
                      seeds: DataFrame): DataFrame = {
    val deg = edges.groupBy("src")
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val e = edges.join(deg, "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id")).distinct()
      .join(broadcast(seeds.select(col("id").as("sid"), lit(1.0).as("t"))),
        col("id") === col("sid"), "left")
      .select(col("id"), coalesce(col("t"), lit(0.0)).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("id"), col("t").as("rank"))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iterations) {
      val contrib = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"),
          Portable.r(col("rank") / col("outdeg"), 9).as("c"))
        .groupBy("dst")
        .agg(Portable.dsum(col("c")).as("c"))
      val next = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit(0.15) * col("t") +
            lit(0.85) * coalesce(col("c"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
      prev.foreach(_.unpersist())
      prev = Some(next)
      ranks = next
    }
    e.unpersist()
    nodes.unpersist()
    ranks
  }
}
