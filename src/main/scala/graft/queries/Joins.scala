package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.RangeJoin

/** Q-join-*: the join surface (SURVEY.md §2B).
  *
  * Scale notes (100 TB posture):
  *  - fact-fact joins (orders x lineitem) shuffle on the join key — both
  *    sides hash-partition, sort-merge join, AQE re-plans on skew;
  *  - dimension joins (nation/region/supplier) are explicitly
  *    `broadcast()`-hinted: no shuffle of the fact side at all;
  *  - the range join goes through [[graft.operators.RangeJoin]] — an
  *    equi-join on a time band instead of a broadcast-nested-loop;
  *  - semi/anti joins use Spark's dedicated left_semi/left_anti types
  *    (no row duplication, no post-dedup).
  */
object Joins {

  val queries: Map[String, Q] = Map(
    // ---- Q-join-01: inner equi-join, fact x dimension-ish
    "Q-join-01" -> { (s, d) =>
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          Portable.r(Portable.dsum(col("o_totalprice")), 2).as("total"))
        .orderBy("c_mktsegment")
    },

    // ---- Q-join-02 (left): preserve unmatched customers
    "Q-join-02-left" -> { (s, d) =>
      val c = Tables.customer(s, d); val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          Portable.r(coalesce(Portable.dsum(col("o_totalprice")), lit(0.0)), 2).as("total"))
        .orderBy("c_custkey")
    },

    // ---- Q-join-02 (right): right outer — all customers kept from the
    // right side even with no matching order (mirror of -left, covering
    // the remaining outer-join type)
    "Q-join-02-right" -> { (s, d) =>
      val c = Tables.customer(s, d); val o = Tables.orders(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          Portable.r(coalesce(Portable.dsum(col("o_totalprice")), lit(0.0)), 2).as("total"))
        .orderBy("c_custkey")
    },

    // ---- Q-join-02 (full): full outer of two aggregates on distinct key domains
    "Q-join-02-full" -> { (s, d) =>
      val byCust = Tables.orders(s, d).groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n_orders"))
      val byUser = Tables.events(s, d).groupBy(col("user_id").as("k"))
        .agg(count(lit(1)).as("n_events"))
      byCust.join(byUser, Seq("k"), "full")
        .select(col("k"), col("n_orders"), col("n_events"))
        .orderBy("k")
    },

    // ---- Q-join-03: left-semi (EXISTS) + left-anti (NOT EXISTS)
    "Q-join-03" -> { (s, d) =>
      val c = Tables.customer(s, d); val o = Tables.orders(s, d)
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit(true).as("has_orders"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit(false).as("has_orders"))
      semi.unionAll(anti).orderBy("c_custkey")
    },

    // ---- Q-join-04: broadcast-hinted star join over two dims
    "Q-join-04" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d); val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), Portable.davg(col("c_acctbal"), 4).as("avg_bal"))
        .orderBy("r_name", "n_name")
    },

    // ---- Q-join-05: time-range self-join via banded equi-join (no BNLJ)
    "Q-join-05" -> { (s, d) =>
      val ev = Tables.events(s, d).select("ts", "user_id", "event_type")
      val joined = RangeJoin.timeBand(
        ev, ev, "ts", "ts", deltaSeconds = 300,
        extra = (a, b) => col("a_user_id") =!= col("b_user_id"))
      joined.groupBy(col("a_event_type").as("a_type"), col("b_event_type").as("b_type"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("a_type", "b_type")
    },

    // ---- Q-join-07: multi-way join (TPC-H Q5 shape, 6 tables)
    "Q-join-07" -> { (s, d) =>
      val c = Tables.customer(s, d); val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d); val sup = Tables.supplier(s, d)
      val n = Tables.nation(s, d); val r = Tables.region(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(sup),
          l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(o("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
                o("o_orderdate") <  to_timestamp(lit("1998-01-01")))
        .groupBy("n_name")
        .agg(
          Portable.r(Portable.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("n_name")
    },

    // ---- Q-join-14: explicit cross join (dim x dim only — a cross join's
    // output is |L|x|R|, so at scale it is only ever sane between
    // broadcastable dimensions; Catalyst plans this one as a
    // BroadcastNestedLoopJoin with both sides tiny)
    "Q-join-14" -> { (s, d) =>
      Tables.region(s, d).select(col("r_name"))
        .crossJoin(Tables.nation(s, d).select(col("n_name")))
        .orderBy("r_name", "n_name")
    },

    // ---- Q-join-17: NULL-safe equi-join (<=> / IS NOT DISTINCT FROM) —
    // NULL keys MATCH each other instead of silently dropping, the
    // semantics a sentinel-free dimension join needs. EqualNullSafe is a
    // hashable join key in Catalyst, so this plans as an ordinary
    // broadcast/shuffled hash join (no nested loop); NULL-keyed rows all
    // hash to one bucket — at scale a hot NULL key is the classic salting
    // candidate (Q-join-10).
    "Q-join-17" -> { (s, d) =>
      // ~1/10 of keys nulled on both sides, deterministically
      val ev = Tables.events(s, d).select(
        when(col("user_id") % 10 =!= 0, col("user_id") % 100).as("k"),
        col("value"))
      val cust = Tables.customer(s, d)
        .filter(col("c_custkey") < 100)
        .select(
          when(col("c_custkey") % 10 =!= 0, col("c_custkey")).as("k"),
          col("c_mktsegment"))
      ev.join(cust, ev("k") <=> cust("k"))
        .groupBy(col("c_mktsegment"), cust("k").as("k"))
        .agg(count(lit(1)).as("n"),
          Portable.r(Portable.dsum(col("value")), 2).as("val_sum"))
        .orderBy(col("c_mktsegment"), col("k").asc_nulls_last)
    },

    // ---- Q-join-18: EXISTENCE join — an IN-subquery in the PROJECTION
    // (not the filter) plans as Catalyst's ExistenceJoin variant: the
    // probe row survives either way and gains a boolean, so neither the
    // row-dropping semi join nor a row-multiplying outer join applies
    // (asserted in ExplainCheck). The enrich-with-existence shape behind
    // "has the customer ever ordered / ever returned".
    "Q-join-18" -> { (s, d) =>
      Tables.registerViews(s, d)
      s.sql(
        """SELECT c_custkey, c_mktsegment,
                  c_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_orderstatus = 'F') AS has_final,
                  c_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT') AS has_urgent
           FROM customer
           ORDER BY c_custkey""")
    },

    // ---- Q-join-19: POINT-IN-TIME (temporal) join — the feature-store
    // primitive: each purchase event enriched with the SCD2 state
    // version VALID AT event time (training-serving skew prevention:
    // features as they were, not as they are). The dim is the Q-qual-04
    // SCD2 build (per-user state intervals); the join carries the
    // user_id EQUI key, so it plans as a keyed hash/merge join with the
    // interval bounds as residual predicates — never an interval BNLJ;
    // per-user interval counts bound the match fan-in, and intervals
    // partition the timeline so each probe lands in exactly one version.
    "Q-join-19" -> { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, d)
      val scd = ev
        .withColumn("prev", lag("event_type", 1).over(wo))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to", lead("ts", 1).over(wo))
        .select(col("user_id").as("d_uid"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      probes.join(scd,
          probes("user_id") === scd("d_uid") &&
          scd("valid_from") <= probes("ts") &&
          (scd("valid_to").isNull || probes("ts") < scd("valid_to")))
        .select(col("event_id").cast("bigint").as("event_id"),
          col("user_id").cast("bigint").as("user_id"), col("state"))
        .orderBy("event_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "Q-join-19" ->
      """WITH ch AS (
           SELECT user_id, ts, event_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev
           FROM events),
         scd AS (
           SELECT user_id, state, valid_from,
                  lead(valid_from) OVER (PARTITION BY user_id
                    ORDER BY valid_from, event_id) AS valid_to
           FROM (SELECT user_id, event_type AS state, ts AS valid_from,
                        event_id
                 FROM ch WHERE prev IS NULL OR prev <> event_type)),
         p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase')
         SELECT p.event_id::BIGINT AS event_id, p.user_id::BIGINT AS user_id,
                s.state
         FROM p JOIN scd s ON p.user_id = s.user_id
           AND s.valid_from <= p.ts
           AND (s.valid_to IS NULL OR p.ts < s.valid_to)
         ORDER BY event_id""",
    "Q-join-18" ->
      """SELECT c_custkey, c_mktsegment,
                c_custkey IN (SELECT o_custkey FROM orders
                              WHERE o_orderstatus = 'F') AS has_final,
                c_custkey IN (SELECT o_custkey FROM orders
                              WHERE o_orderpriority = '1-URGENT') AS has_urgent
         FROM customer
         ORDER BY c_custkey""",
    "Q-join-17" ->
      s"""WITH ev AS (
           SELECT CASE WHEN user_id % 10 <> 0 THEN user_id % 100 END AS k, value
           FROM events),
         cust AS (
           SELECT CASE WHEN c_custkey % 10 <> 0 THEN c_custkey END AS k,
                  c_mktsegment
           FROM customer WHERE c_custkey < 100)
         SELECT c_mktsegment, cust.k AS k, count(*)::BIGINT AS n,
                ${Portable.rSql(Portable.dsumSql("value"), 2)} AS val_sum
         FROM ev JOIN cust ON ev.k IS NOT DISTINCT FROM cust.k
         GROUP BY c_mktsegment, cust.k
         ORDER BY c_mktsegment, k NULLS LAST""",
    "Q-join-14" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",
    "Q-join-01" ->
      """SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
                floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE) * 1e2 + 0.5) / 1e2 AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "Q-join-02-left" ->
      """SELECT c_custkey, count(o_orderkey)::BIGINT AS n_orders,
                floor(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 0.0) * 1e2 + 0.5) / 1e2 AS total
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "Q-join-02-right" ->
      """SELECT c_custkey, count(o_orderkey)::BIGINT AS n_orders,
                floor(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 0.0) * 1e2 + 0.5) / 1e2 AS total
         FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "Q-join-02-full" ->
      """SELECT coalesce(o.k, e.k) AS k, o.n_orders, e.n_events
         FROM (SELECT o_custkey AS k, count(*)::BIGINT AS n_orders
               FROM orders GROUP BY 1) o
         FULL JOIN (SELECT user_id AS k, count(*)::BIGINT AS n_events
               FROM events GROUP BY 1) e ON o.k = e.k
         ORDER BY k""",
    "Q-join-03" ->
      """SELECT c_custkey, TRUE AS has_orders FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT c_custkey, FALSE AS has_orders FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "Q-join-04" ->
      """SELECT r_name, n_name, count(*)::BIGINT AS n_cust,
                floor(CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4 AS avg_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "Q-join-05" ->
      """SELECT a.event_type AS a_type, b.event_type AS b_type,
                count(*)::BIGINT AS n_pairs
         FROM events a JOIN events b
           ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 300 SECOND
          AND a.user_id <> b.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "Q-join-07" ->
      """SELECT n_name,
                floor(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,10))) AS DOUBLE) * 1e2 + 0.5) / 1e2 AS revenue,
                count(*)::BIGINT AS n_lines
         FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1998-01-01'
         GROUP BY n_name ORDER BY n_name"""
  )
}
