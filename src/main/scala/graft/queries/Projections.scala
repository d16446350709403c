package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Q-proj-* / Q-filt-*: projection, predicates, conditional logic
  * (SURVEY.md §2B). All pure narrow ops — no shuffle; Catalyst pushes the
  * predicates and the column set into the parquet scan (verified via
  * `.explain`: PushedFilters + pruned ReadSchema).
  */
object Projections {

  val queries: Map[String, Q] = Map(
    // ---- Q-proj-01: projection, aliasing, arithmetic
    "Q-proj-01" -> { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        Portable.r(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"),
        Portable.r(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 4).as("charge"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- Q-filt-01: conjunction/disjunction, BETWEEN, IN, LIKE, IS NOT NULL
    "Q-filt-01" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(
          col("o_orderstatus").isin("O", "F") &&
          col("o_totalprice").between(1000.0, 200000.0) &&
          (col("o_orderpriority").like("1%") ||
            col("o_orderdate") >= to_timestamp(lit("1999-01-01"))) &&
          col("o_custkey").isNotNull)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    },

    // ---- Q-filt-02: CASE WHEN / conditional projection
    "Q-filt-02" -> { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("qty_band"),
        when(col("l_returnflag") === "R", col("l_extendedprice"))
          .otherwise(lit(0.0)).as("returned_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }
  )

  val oracle: Map[String, String] = Map(
    "Q-proj-01" ->
      s"""SELECT l_orderkey, l_linenumber,
                ${Portable.rSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
                ${Portable.rSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 4)} AS charge
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "Q-filt-01" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
         FROM orders
         WHERE o_orderstatus IN ('O','F')
           AND o_totalprice BETWEEN 1000.0 AND 200000.0
           AND (o_orderpriority LIKE '1%' OR o_orderdate >= TIMESTAMP '1999-01-01')
           AND o_custkey IS NOT NULL
         ORDER BY o_orderkey""",
    "Q-filt-02" ->
      """SELECT l_orderkey, l_linenumber,
                CASE WHEN l_quantity < 10 THEN 'low'
                     WHEN l_quantity < 30 THEN 'mid'
                     ELSE 'high' END AS qty_band,
                CASE WHEN l_returnflag = 'R' THEN l_extendedprice
                     ELSE 0.0 END AS returned_price
         FROM lineitem ORDER BY l_orderkey, l_linenumber"""
  )
}
