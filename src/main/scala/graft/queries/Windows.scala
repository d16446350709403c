package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Q-win-*: window functions (SURVEY.md §2B).
  *
  * Scale notes: a window partitioned by a key shuffles once on that key and
  * sorts within partitions — same cost envelope as a groupBy + sort. The
  * running sums are computed over DECIMAL so the result is independent of
  * the engine's accumulation strategy (DuckDB uses segment trees; Spark
  * accumulates sequentially — double addition order would differ).
  * Every window ORDER BY carries a unique tiebreak column: ranking without
  * a total order is nondeterministic in any engine.
  */
object Windows {

  /** Running DISTINCT count — Spark has no COUNT(DISTINCT) OVER, so the
    * engine expresses it as size(collect_set() OVER) (exact,
    * order-insensitive). collect_set buffers the WHOLE per-key set on
    * every row, so pointing this at a high-cardinality column is a latent
    * executor OOM — the guard below turns that latent failure into a loud
    * one: a single cheap pass (approx_count_distinct, fixed-width sketch,
    * tiny shuffle) bounds the column's cardinality BEFORE the window is
    * planned, and past `maxDistinct` the engine refuses and names the
    * HLL-sketch window (Q-agg-12's algebra) as the scale path. The global
    * distinct count upper-bounds every per-key set size, so the guard is
    * conservative-safe at any partitioning. */
  def runningDistinct(events: org.apache.spark.sql.DataFrame,
                      valueCol: String,
                      maxDistinct: Long = 1024): org.apache.spark.sql.DataFrame = {
    val nd = events.agg(approx_count_distinct(col(valueCol)).as("nd"))
      .head().getLong(0)
    require(nd <= maxDistinct,
      s"running-distinct guard: column '$valueCol' has ~$nd distinct values " +
      s"(limit $maxDistinct). size(collect_set() OVER) buffers the full set " +
      "per row and would OOM at scale — use an HLL-sketch window " +
      "(Q-agg-12's algebra) for high-cardinality columns.")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(
      col("user_id"), col("event_id"),
      size(collect_set(col(valueCol)).over(w)).cast("bigint")
        .as("n_types_seen"))
      .orderBy("user_id", "event_id")
  }

  val queries: Map[String, Q] = Map(
    // ---- Q-win-07: running DISTINCT count over event types (≤5 distinct
    // here; the [[runningDistinct]] guard fails loudly past 1024 — spec
    // proves the no-OOM path on a high-cardinality column).
    "Q-win-07" -> { (s, d) =>
      runningDistinct(Tables.events(s, d), "event_type")
    },

    // ---- Q-win-01: ranking functions
    "Q-win-01" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("bigint").as("rn"),
        rank().over(Window.partitionBy("o_custkey").orderBy(col("o_orderpriority")))
          .cast("bigint").as("rk"),
        dense_rank().over(Window.partitionBy("o_custkey").orderBy(col("o_orderpriority")))
          .cast("bigint").as("drk"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        Portable.r(percent_rank().over(w), 6).as("pct_rank"),
        Portable.r(cume_dist().over(w), 6).as("cdist"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- Q-win-02: analytic functions (lag/lead/first/last)
    "Q-win-02" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("event_type")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_type"),
        last(col("event_type")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("latest_type"))
        .orderBy("user_id", "event_id")
    },

    // ---- Q-win-03: frame specs — ROWS running sum + RANGE 7-day window
    "Q-win-03" -> { (s, d) =>
      val dayIdx = datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
      val wRows = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wRange = Window.partitionBy("o_custkey").orderBy(dayIdx)
        .rangeBetween(-6, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        Portable.r(sum(col("o_totalprice").cast(DecimalType(30, 10)))
          .over(wRows).cast("double"), 2).as("running_total"),
        Portable.r(sum(col("o_totalprice").cast(DecimalType(30, 10)))
          .over(wRange).cast("double"), 2).as("weekly_total"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- Q-win-04: BATCH session windows (30 s gap) per user —
    // session_window works in batch groupBy too, where it plans as a plain
    // hash aggregation after a per-key sort (no state store). The streaming
    // twin is Q-str-03; this one has no watermark cutoff, so every session
    // (including each user's trailing one) is emitted.
    "Q-win-04" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 seconds"), col("user_id"))
        .agg(count(lit(1)).as("n"),
          Portable.r(Portable.dsum(col("value")), 2).as("val_sum"))
        .select(
          col("user_id"),
          unix_millis(col("session_window.start")).as("start_ms"),
          unix_millis(col("session_window.end")).as("end_ms"),
          col("n"), col("val_sum"))
        .orderBy("user_id", "start_ms")
    },

    // ---- Q-win-05: time-series gap-fill + forward fill. Per-user daily
    // sums are resampled onto a dense per-user date spine (sequence +
    // explode — partition-parallel, spine size bounded by each user's own
    // span) and gaps carry the last observed value forward
    // (last(ignoreNulls) over an unbounded-preceding frame). The oracle
    // renders the fill as DuckDB's ASOF LEFT JOIN — two independent
    // formulations of the same semantics.
    "Q-win-05" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(Portable.dsum(col("value")).as("v"))
      val spine = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val wFill = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          col("v").isNull.as("was_gap"),
          Portable.r(last(col("v"), ignoreNulls = true).over(wFill), 2).as("filled_v"))
        .orderBy("user_id", "day")
    },

    // ---- Q-win-06: nth_value + IGNORE NULLS navigation over a sparse
    // column (value nulled on every 5th event) with a full-partition frame
    "Q-win-06" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .withColumn("v", when(col("event_id") % 5 =!= 0, col("value")))
        .select(
          col("user_id"), col("event_id"), col("v"),
          nth_value(col("v"), 2).over(w).as("second_v"),
          first(col("v"), ignoreNulls = true).over(w).as("first_nn"),
          last(col("v"), ignoreNulls = true).over(w).as("last_nn"))
        .orderBy("user_id", "event_id")
    },

    // ---- Q-win-09: distribution ranks — percent_rank / cume_dist over
    // per-segment balance order, plus an offset-2 lag with a default.
    // The rank quotients are exact integer divisions over a total order
    // (unique tiebreak), so the doubles are bit-identical across engines.
    "Q-win-09" -> { (s, d) =>
      val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
      Tables.customer(s, d).select(
          col("c_custkey"), col("c_mktsegment"),
          Portable.r(percent_rank().over(w), 9).as("pct_rank"),
          Portable.r(cume_dist().over(w), 9).as("cume"),
          lag(col("c_acctbal"), 2, -1.0).over(w).as("lag2"))
        .orderBy("c_custkey")
    },

    // ---- Q-win-10: running median — the exact interpolated percentile
    // as a WINDOW aggregate over a trailing 9-row frame (robust rolling
    // center for anomaly baselines, complementing Q-win-08's
    // mean/stddev). Both engines interpolate a + (b-a)·frac over the
    // sorted frame, so the doubles agree; 6-dp portable rounding absorbs
    // nothing but is kept for family consistency.
    "Q-win-10" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-8, Window.currentRow)
      Tables.events(s, d).select(
          col("user_id"), col("event_id"),
          Portable.r(expr("percentile(value, 0.5)").over(w), 6).as("run_median"))
        .orderBy("user_id", "event_id")
    },

    // ---- Q-win-11: trailing frame EXCLUDING the current row
    // ([-3, -1] — the leakage-free rolling baseline: a forecast feature
    // must never see its own row). Decimal frame sums (Spark accumulates
    // sequentially, DuckDB uses segment trees — double order would
    // differ); the first row of each partition has an empty frame and
    // stays NULL on both engines.
    "Q-win-11" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, -1)
      Tables.events(s, d).select(
          col("user_id"), col("event_id"),
          Portable.r(
            sum(col("value").cast(DecimalType(30, 10))).over(w).cast("double")
              / count(lit(1)).over(w), 6).as("trail_mean"))
        .orderBy("user_id", "event_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "Q-win-09" ->
      s"""SELECT c_custkey, c_mktsegment,
                ${Portable.rSql("percent_rank() OVER w", 9)} AS pct_rank,
                ${Portable.rSql("cume_dist() OVER w", 9)} AS cume,
                lag(c_acctbal, 2, -1.0) OVER w AS lag2
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
         ORDER BY c_custkey""",
    "Q-win-11" ->
      s"""SELECT user_id, event_id,
                ${Portable.rSql(
                  "CAST(sum(CAST(value AS DECIMAL(30,10))) OVER w AS DOUBLE)" +
                  " / count(*) OVER w", 6)} AS trail_mean
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
         ORDER BY user_id, event_id""",
    "Q-win-10" ->
      s"""SELECT user_id, event_id,
                ${Portable.rSql("quantile_cont(value, 0.5) OVER w", 6)}
                  AS run_median
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",
    "Q-win-07" ->
      """SELECT user_id, event_id,
                count(DISTINCT event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                  AS n_types_seen
         FROM events ORDER BY user_id, event_id""",
    "Q-win-06" ->
      """SELECT user_id, event_id, v,
                nth_value(v, 2) OVER w AS second_v,
                first_value(v IGNORE NULLS) OVER w AS first_nn,
                last_value(v IGNORE NULLS) OVER w AS last_nn
         FROM (SELECT user_id, event_id, ts,
                      CASE WHEN event_id % 5 <> 0 THEN value END AS v
               FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY user_id, event_id""",
    "Q-win-01" ->
      """SELECT o_custkey, o_orderkey,
                (row_number() OVER w)::BIGINT AS rn,
                (rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority))::BIGINT AS rk,
                (dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority))::BIGINT AS drk,
                (ntile(4) OVER w)::BIGINT AS quartile,
                floor((percent_rank() OVER w) * 1e6 + 0.5) / 1e6 AS pct_rank,
                floor((cume_dist() OVER w) * 1e6 + 0.5) / 1e6 AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "Q-win-02" ->
      """SELECT user_id, event_id,
                lag(value, 1) OVER w AS prev_value,
                lead(value, 1) OVER w AS next_value,
                first_value(event_type) OVER
                  (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type,
                last_value(event_type) OVER
                  (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS latest_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, event_id""",
    "Q-win-03" ->
      s"""SELECT o_custkey, o_orderkey,
                ${Portable.rSql(
                  "CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) OVER " +
                  "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
                  "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)", 2)} AS running_total,
                ${Portable.rSql(
                  "CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) OVER " +
                  "(PARTITION BY o_custkey ORDER BY datediff('day', DATE '1970-01-01', o_orderdate) " +
                  "RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)", 2)} AS weekly_total
         FROM orders
         ORDER BY o_custkey, o_orderkey""",
    "Q-win-04" ->
      s"""WITH marked AS (
           SELECT user_id, ts, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 30 THEN 1 ELSE 0 END AS new_s
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         islands AS (
           SELECT user_id, ts, value,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM marked)
         SELECT user_id,
                epoch_ms(min(ts)) AS start_ms,
                epoch_ms(max(ts)) + 30000 AS end_ms,
                count(*)::BIGINT AS n,
                ${Portable.rSql(Portable.dsumSql("value"), 2)} AS val_sum
         FROM islands GROUP BY user_id, island
         ORDER BY user_id, start_ms""",
    "Q-win-05" ->
      s"""WITH daily AS (
           SELECT user_id, ts::DATE AS day, ${Portable.dsumSql("value")} AS v
           FROM events GROUP BY 1, 2),
         spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1
                   FROM daily GROUP BY user_id),
         spine AS (
           SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
           FROM spans),
         j AS (
           SELECT s.user_id, s.day, d.v
           FROM spine s LEFT JOIN daily d USING (user_id, day))
         SELECT j.user_id, j.day, (j.v IS NULL) AS was_gap,
                ${Portable.rSql("f.v", 2)} AS filled_v
         FROM j ASOF LEFT JOIN daily f
           ON j.user_id = f.user_id AND j.day >= f.day
         ORDER BY j.user_id, j.day"""
  )
}
