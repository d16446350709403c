package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.KMeans

/** Trained clustering over the embeddings table.
  *
  * The reference's declared surface has no learned operators, but a
  * training-data pipeline needs clustering immediately: semantic-dedup
  * blocks, data-mix curation, and IVF cells are all k-means under the
  * hood (IvfIndex deliberately uses a one-shot sample; this is the
  * trained refinement). Correctness: fixed-point quantization + integer
  * algebra + fixed rounds make Lloyd's iterations bit-identical to a
  * DuckDB unrolled-CTE replay — the Q-graph-01/Q-llm-38 discipline
  * applied to the third classic trained model (after NB and LR).
  */
object Clustering {

  private val K = 8
  private val ITERS = 6
  private val SCALE = 1000

  /** DuckDB text of one unrolled Lloyd round: assignment against
    * c{t-1}, then the floor-div mean update into c{t}. Mirrors
    * graft.operators.KMeans.run exactly: integer squared distance,
    * lowest-cluster tie-break, empty clusters carry forward. */
  private def round(t: Int): String = {
    val prev = s"c${t - 1}"
    s"""dist$t AS (
          SELECT q.id, c.cl,
                 sum((q.qv - c.c) * (q.qv - c.c)) AS dist2
          FROM q JOIN $prev c ON q.d = c.d
          GROUP BY q.id, c.cl),
        a$t AS (
          SELECT id, cl FROM (
            SELECT id, cl,
                   row_number() OVER (PARTITION BY id
                                      ORDER BY dist2, cl) AS rn
            FROM dist$t) WHERE rn = 1),
        c$t AS (
          SELECT p.cl, p.d,
                 CASE WHEN s.n IS NULL THEN p.c
                      ELSE (s.s - ((s.s % s.n) + s.n) % s.n) // s.n
                 END AS c
          FROM $prev p LEFT JOIN (
            SELECT a.cl, q.d, sum(q.qv) AS s, count(*) AS n
            FROM a$t a JOIN q ON a.id = q.id
            GROUP BY a.cl, q.d) s
          ON p.cl = s.cl AND p.d = s.d)"""
  }

  val queries: Map[String, Q] = Map(
    // ---- Q-llm-43: trained k-means (Lloyd's) over the embeddings —
    // K centroids refined for ITERS rounds from the K lowest-id seeds,
    // final per-vector assignment + quantized squared distance. Plan
    // shape per round: map-side assignment against the broadcast model,
    // one (K × dim)-bounded partial-agg exchange for the update
    // (operator scaladoc); vectors never cross the wire.
    "Q-llm-43" -> { (s, d) =>
      KMeans.run(Tables.embeddings(s, d), "vec_id", "embedding", K, ITERS,
          SCALE)
        .orderBy("vec_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "Q-llm-43" -> {
      val rounds = (1 to ITERS).map(round).mkString(",\n")
      s"""WITH q AS (
            SELECT vec_id AS id,
                   unnest(generate_series(1, len(embedding))) - 1 AS d,
                   unnest(list_transform(generate_series(1, len(embedding)),
                     i -> CAST(floor(embedding[i]::DOUBLE * $SCALE)
                               AS BIGINT))) AS qv
            FROM embeddings),
          c0 AS (SELECT id AS cl, d, qv AS c FROM q WHERE id < $K),
          $rounds,
          fdist AS (
            SELECT q.id, c.cl,
                   sum((q.qv - c.c) * (q.qv - c.c)) AS dist2
            FROM q JOIN c$ITERS c ON q.d = c.d
            GROUP BY q.id, c.cl)
          SELECT id::BIGINT AS vec_id, cl::BIGINT AS cluster,
                 dist2::BIGINT AS dist2
          FROM (
            SELECT id, cl, dist2,
                   row_number() OVER (PARTITION BY id
                                      ORDER BY dist2, cl) AS rn
            FROM fdist) WHERE rn = 1
          ORDER BY vec_id"""
    }
  )
}
