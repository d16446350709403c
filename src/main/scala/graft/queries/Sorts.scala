package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Q-sort-*: sort / limit / top-k (SURVEY.md §2B).
  *
  * Scale notes: global `orderBy().limit(k)` plans as TakeOrderedAndProject —
  * each partition keeps its local top-k, only k rows per partition reach the
  * driver-side merge, so a 100 TB global top-100 moves ~100 rows per task,
  * not the table. Per-group top-k uses a ranking window: one shuffle on the
  * group key, heap-free, skew absorbed by AQE.
  */
object Sorts {

  val queries: Map[String, Q] = Map(
    // ---- Q-sort-01: multi-key sort with NULLS FIRST/LAST control
    "Q-sort-01" -> { (s, d) =>
      Tables.orders(s, d)
        .select(
          nullif(col("o_orderpriority"), lit("1-URGENT")).as("pri"),
          col("o_totalprice"), col("o_orderkey"))
        .orderBy(
          col("pri").asc_nulls_first,
          col("o_totalprice").desc_nulls_last,
          col("o_orderkey"))
    },

    // ---- Q-sort-02: global top-k (TakeOrderedAndProject)
    "Q-sort-02" -> { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // ---- Q-sort-03: per-group top-k via ranking window
    "Q-sort-03" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }
  )

  val oracle: Map[String, String] = Map(
    "Q-sort-01" ->
      """SELECT nullif(o_orderpriority, '1-URGENT') AS pri, o_totalprice, o_orderkey
         FROM orders
         ORDER BY pri ASC NULLS FIRST, o_totalprice DESC NULLS LAST, o_orderkey""",
    "Q-sort-02" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "Q-sort-03" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn"""
  )
}
