package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Q-set-*: set operations (SURVEY.md §2B).
  *
  * UNION ALL is a zero-shuffle concat; UNION/INTERSECT/EXCEPT (+ALL) shuffle
  * on the full row to dedup/match — at scale prefer UNION ALL + explicit
  * aggregation when multiplicities are known.
  */
object SetOps {

  val queries: Map[String, Q] = Map(
    // ---- Q-set-01: UNION ALL vs UNION (distinct)
    "Q-set-01" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") > 150000).select(col("o_custkey").as("k"))
      val ur = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("k"))
      val all = hi.unionAll(ur).groupBy("k").agg(count(lit(1)).as("n_all"))
      val dis = hi.union(ur).distinct().select(col("k").as("k2"))
      all.join(dis, all("k") === dis("k2"))
        .select(col("k"), col("n_all"), lit(1L).as("n_distinct"))
        .orderBy("k")
    },

    // ---- Q-set-02: INTERSECT / EXCEPT with ALL variants
    "Q-set-02" -> { (s, d) =>
      val a = Tables.orders(s, d).filter(col("o_totalprice") < 100000)
        .select(col("o_custkey").as("k"))
      val b = Tables.events(s, d).select(col("user_id").as("k"))
      val tag = (df: org.apache.spark.sql.DataFrame, t: String) =>
        df.groupBy("k").agg(count(lit(1)).as("n")).withColumn("op", lit(t))
      tag(a.intersect(b), "intersect")
        .unionAll(tag(a.intersectAll(b), "intersect_all"))
        .unionAll(tag(a.except(b), "except"))
        .unionAll(tag(a.exceptAll(b), "except_all"))
        .select("op", "k", "n")
        .orderBy("op", "k")
    }
  )

  val oracle: Map[String, String] = Map(
    "Q-set-01" ->
      """WITH hi AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000),
              ur AS (SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
              uall AS (SELECT k, count(*)::BIGINT AS n_all
                       FROM (SELECT k FROM hi UNION ALL SELECT k FROM ur) GROUP BY k),
              udis AS (SELECT k AS k2 FROM hi UNION SELECT k FROM ur)
         SELECT k, n_all, 1::BIGINT AS n_distinct
         FROM uall JOIN udis ON k = k2 ORDER BY k""",
    "Q-set-02" ->
      """WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice < 100000),
              b AS (SELECT user_id AS k FROM events)
         SELECT 'intersect' AS op, k, count(*)::BIGINT AS n
           FROM (SELECT k FROM a INTERSECT SELECT k FROM b) GROUP BY k
         UNION ALL
         SELECT 'intersect_all', k, count(*)::BIGINT
           FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
         UNION ALL
         SELECT 'except', k, count(*)::BIGINT
           FROM (SELECT k FROM a EXCEPT SELECT k FROM b) GROUP BY k
         UNION ALL
         SELECT 'except_all', k, count(*)::BIGINT
           FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
         ORDER BY op, k"""
  )
}
