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
    },

    // ---- Q-set-03: UNION by NAME across drifted schemas — the two legs
    // have different column orders and one is missing a column
    // (allowMissingColumns fills null). Positional UNION would silently
    // mis-associate columns here; by-name union is the schema-evolution-
    // safe form a long-lived 100 TB pipeline needs.
    "Q-set-03" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val v1 = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val v2 = o.filter(col("o_orderstatus") === "O") // drifted order, no price
        .select(col("o_orderstatus"), col("o_orderkey"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          count(col("o_totalprice")).as("n_price"),
          Portable.r(Portable.dsum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("total"))
        .orderBy("o_orderstatus")
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
         ORDER BY op, k""",
    "Q-set-03" ->
      s"""WITH u AS (
           SELECT o_orderkey, o_totalprice, o_orderstatus
           FROM orders WHERE o_orderstatus = 'F'
           UNION ALL BY NAME
           SELECT o_orderstatus, o_orderkey
           FROM orders WHERE o_orderstatus = 'O')
         SELECT o_orderstatus, count(*)::BIGINT AS n,
                count(o_totalprice)::BIGINT AS n_price,
                ${Portable.rSql(Portable.dsumSql("coalesce(o_totalprice, 0.0)"), 2)} AS total
         FROM u GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  )
}
