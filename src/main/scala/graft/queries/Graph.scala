package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.PageRank

/** Graph analytics over relations derived from the star schema.
  *
  * The reference's declared surface has no graph operators, but a
  * training-data pipeline grows them immediately (dedup clusters are
  * already ConnectedComponents / Q-llm-16); PageRank is the natural next
  * one — source-authority scoring for crawl corpora. The graph here is
  * the symmetrized customer–supplier trade graph (distinct pairs from
  * orders⋈lineitem, supplier ids offset into their own id space), so
  * every node has out-edges and the fixed-point is a pure function of
  * the relations.
  *
  * Correctness: fixed iteration counts + `Portable`-exact arithmetic
  * make the iterative result bit-identical to the DuckDB oracle's
  * unrolled-CTE chain — the same cross-engine discipline the BPE trainer
  * (Q-llm-38) established for iterative algorithms.
  */
object Graph {

  private val ITERS = 8

  /** DuckDB text of one unrolled PageRank round: `cur` from `prev`.
    * Mirrors graft.operators.PageRank.run exactly: per-dst contribution
    * sums in DECIMAL(30,10), teleport/damping as double literals. */
  private def prRound(prev: String, cur: String): String =
    s"""$cur AS (
          SELECT n.id, 0.15 + 0.85 * COALESCE(c.c, 0.0) AS rank
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS id,
                   CAST(sum(CAST(${Portable.rSql("r.rank / e.outdeg", 9)}
                            AS DECIMAL(30,10))) AS DOUBLE) AS c
            FROM edeg e JOIN $prev r ON e.src = r.id
            GROUP BY e.dst) c ON n.id = c.id)"""

  val queries: Map[String, Q] = Map(
    // ---- Q-graph-01: PageRank over the symmetrized customer–supplier
    // trade graph, 8 fixed iterations, scaled form (rank mass = |V|).
    // Plan shape: one setup shuffle attaches out-degrees and partitions
    // edges by src; each round is two |V|-bounded exchanges (operator
    // scaladoc). Edges never re-shuffle after setup.
    "Q-graph-01" -> { (s, d) =>
      val pairs = Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"),
          (col("l_suppkey") + lit(1000000L)).as("supp"))
        .distinct()
      val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
        .unionAll(pairs.select(col("supp").as("src"), col("cust").as("dst")))
      PageRank.run(edges, ITERS)
        .select(col("id").cast("long").as("id"),
          Portable.r(col("rank"), 9).as("rank"))
        .orderBy("id")
    }
  )

  val oracle: Map[String, String] = Map(
    "Q-graph-01" -> {
      val rounds = (1 to ITERS).map(i => prRound(s"r${i - 1}", s"r$i"))
        .mkString(",\n")
      s"""WITH pairs AS (
            SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          edges AS (
            SELECT cust AS src, supp AS dst FROM pairs
            UNION ALL
            SELECT supp AS src, cust AS dst FROM pairs),
          deg AS (SELECT src, count(*)::DOUBLE AS outdeg
                  FROM edges GROUP BY src),
          edeg AS (SELECT e.src, e.dst, d.outdeg
                   FROM edges e JOIN deg d ON e.src = d.src),
          nodes AS (SELECT src AS id FROM deg),
          r0 AS (SELECT id, 1.0 AS rank FROM nodes),
          $rounds
          SELECT id::BIGINT AS id, ${Portable.rSql("rank", 9)} AS rank
          FROM r$ITERS ORDER BY id"""
    }
  )
}
