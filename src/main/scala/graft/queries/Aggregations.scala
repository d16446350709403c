package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Q-agg-*: aggregation surface (SURVEY.md §2B).
  *
  * All group-bys rely on Spark's automatic partial (map-side) + final
  * aggregation — at 100 TB the partial agg collapses each input partition to
  * |groups| rows before the shuffle, so shuffle volume is bounded by group
  * cardinality, not input size. `count(DISTINCT)` expands to the standard
  * two-shuffle expand+agg plan; HLL (`approx_count_distinct`) is the
  * single-shuffle scale path (Q-agg-04).
  */
object Aggregations {

  val queries: Map[String, Q] = Map(
    // ---- Q-agg-01: TPC-H Q1 shape — multi-aggregate hash group-by
    "Q-agg-01" -> { (s, d) =>
      val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Portable.r(Portable.dsum(col("l_quantity")), 2).as("sum_qty"),
          Portable.r(Portable.dsum(col("l_extendedprice")), 2).as("sum_base"),
          Portable.r(Portable.dsum(disc), 2).as("sum_disc"),
          Portable.r(Portable.dsum(disc * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          Portable.davg(col("l_quantity"), 6).as("avg_qty"),
          Portable.davg(col("l_extendedprice"), 4).as("avg_price"),
          Portable.davg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- Q-agg-02: global (no-group) aggregate incl. exact count distinct
    "Q-agg-02" -> { (s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        Portable.r(Portable.dsum(col("l_quantity")), 2).as("total_qty"),
        Portable.r(min(col("l_extendedprice")), 4).as("min_price"),
        Portable.r(max(col("l_extendedprice")), 4).as("max_price"))
    },

    // ---- Q-agg-03: ROLLUP with GROUPING()
    "Q-agg-03" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("bigint").as("g_rf"),
          grouping(col("l_linestatus")).cast("bigint").as("g_ls"),
          count(lit(1)).as("n"), Portable.r(Portable.dsum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("g_rf"), col("g_ls"), col("n"), col("qty"))
        .orderBy("g_rf", "g_ls", "rf", "ls")
    },

    // ---- Q-agg-03 (cube): CUBE over two dims
    "Q-agg-03-cube" -> { (s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping(col("o_orderstatus")).cast("bigint").as("g_st"),
          grouping(col("o_orderpriority")).cast("bigint").as("g_pri"),
          count(lit(1)).as("n"), Portable.r(Portable.dsum(col("o_totalprice")), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("g_st"), col("g_pri"), col("n"), col("total"))
        .orderBy("g_st", "g_pri", "st", "pri")
    },

    // ---- Q-agg-04: approx distinct (HLL) — the 100 TB path for distinct
    // counts (single shuffle, bounded sketch; the scale plan is the
    // sketch columns ALONE). Rendered hash-matchable: the sketches are
    // deterministic (hash-based, no RNG), so the query emits the exact
    // values plus measured within-bound BOOLEANS, and the oracle
    // recomputes the exact side in SQL with the bounds as TRUE literals —
    // a hash mismatch IS a violated error bound (rsd=0.02 -> 5% = 2.5σ;
    // accuracy=10000 -> rank error 1e-4 ≪ 1% of the median).
    "Q-agg-04" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("p50a"),
          expr("percentile(l_extendedprice, 0.5)").as("p50e"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_orders"), col("n"),
          (abs(col("approx_orders") - col("exact_orders")) <=
            col("exact_orders") * lit(0.05)).as("hll_within_5pct"),
          (abs(col("p50a") - col("p50e")) <= col("p50e") * lit(0.01))
            .as("p50_within_1pct"))
        .orderBy("l_returnflag")
    },

    // ---- Q-agg-05: HAVING / post-aggregation filter
    "Q-agg-05" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), Portable.r(Portable.dsum(col("o_totalprice")), 2).as("total"))
        .filter(col("n") >= 12)
        .orderBy("o_custkey")
    },

    // ---- Q-agg-07: exact percentiles (interpolated) per group
    "Q-agg-07" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          Portable.r(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          Portable.r(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          Portable.r(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"))
        .orderBy("l_returnflag")
    },

    // ---- Q-agg-07-approx: percentile_approx twin of Q-agg-07 — the
    // 100 TB path for quantiles (one pass, bounded sketch per group,
    // mergeable across partitions; the exact percentile buffers every
    // value — the sketch columns alone are the scale plan). Rendered
    // hash-matchable like Q-agg-04: exact quantiles (oracle recomputes
    // them as quantile_cont) + measured within-1% booleans whose oracle
    // side is TRUE literals, so a mismatch is a violated sketch bound.
    "Q-agg-07-approx" -> { (s, d) =>
      def ok(a: String, e: String) =
        abs(col(a) - col(e)) <= col(e) * lit(0.01)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile_approx(l_extendedprice, 0.25, 10000)").as("a25"),
          expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("a50"),
          expr("percentile_approx(l_extendedprice, 0.9, 10000)").as("a90"),
          expr("percentile(l_extendedprice, 0.25)").as("e25"),
          expr("percentile(l_extendedprice, 0.5)").as("e50"),
          expr("percentile(l_extendedprice, 0.9)").as("e90"))
        .select(col("l_returnflag"),
          Portable.r(col("e25"), 4).as("p25"),
          Portable.r(col("e50"), 4).as("p50"),
          Portable.r(col("e90"), 4).as("p90"),
          ok("a25", "e25").as("p25_within_1pct"),
          ok("a50", "e50").as("p50_within_1pct"),
          ok("a90", "e90").as("p90_within_1pct"))
        .orderBy("l_returnflag")
    },

    // ---- Q-agg-stats: moments & correlation (numerically matched by rounding)
    "Q-agg-stats" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          Portable.r(var_samp(col("l_quantity")), 6).as("var_qty"),
          Portable.r(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          Portable.r(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          Portable.r(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))
        .orderBy("l_linestatus")
    },

    // ---- Q-agg-10: ordered-set & regression family — sorted listagg,
    // deterministic mode (tie-broken by value, via window over sub-counts —
    // the bare `mode()` builtin is tie-nondeterministic across engines),
    // interpolated median, and least-squares slope/intercept computed from
    // DECIMAL-exact moment sums (l_quantity is integral and prices carry 2
    // decimals, so n·Σxy − ΣxΣy is bit-portable before the one double
    // division; the builtin regr_* aggregates use running-moment updates
    // whose accumulation order is engine-dependent)
    "Q-agg-10" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
      val counts = l.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("l_linestatus").asc)
      val mode = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_linestatus").as("mode_status"))
      val agg = l.groupBy("l_returnflag").agg(
        array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
        Portable.r(median(col("l_quantity")), 6).as("median_qty"),
        count(lit(1)).as("n"),
        Portable.dsum(col("l_quantity")).as("sx"),
        Portable.dsum(col("l_extendedprice")).as("sy"),
        Portable.dsum(col("l_quantity") * col("l_extendedprice")).as("sxy"),
        Portable.dsum(col("l_quantity") * col("l_quantity")).as("sxx"))
      agg
        .select(col("l_returnflag"), col("statuses"), col("median_qty"), col("n"),
          Portable.r((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
          Portable.r((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("n"), 4)
            .as("icept"))
        .join(mode, "l_returnflag")
        .select(col("l_returnflag"), col("statuses"), col("mode_status"),
          col("median_qty"), col("slope"), col("icept"), col("n"))
        .orderBy("l_returnflag")
    },

    // ---- Q-agg-11: argument aggregates + boolean/conditional aggregates —
    // max_by/min_by (argmax over a UNIQUE ordering key, so no tie
    // nondeterminism), count_if, bool_and/bool_or, and a FILTER-style
    // conditional decimal sum. All single-pass partial aggregates: shuffle
    // volume stays |groups| x fixed-width buffers at any input size.
    "Q-agg-11" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          max_by(col("o_custkey"), col("o_orderkey")).as("cust_last"),
          min_by(col("o_custkey"), col("o_orderkey")).as("cust_first"),
          count_if(col("o_totalprice") > 200000).as("n_big"),
          bool_and(col("o_totalprice") > 0).as("all_pos"),
          bool_or(col("o_orderstatus") === "F").as("any_f"),
          Portable.r(Portable.dsum(
            when(col("o_orderstatus") === "F", col("o_totalprice"))
              .otherwise(lit(0.0))), 2).as("f_total"))
        .orderBy("o_orderpriority")
    },

    // ---- Q-agg-12: mergeable HLL sketches (Datasketches) — the 100 TB
    // re-aggregation pattern: partial sketches built per group
    // (hll_sketch_agg), then MERGED across groups (hll_union_agg) without
    // touching raw data again. This is what lets a warehouse keep per-day
    // sketch tables and answer "distinct over any date range" with a
    // union of fixed-size buffers instead of a rescan. Rendered
    // hash-matchable (sketches are deterministic): exact distinct counts
    // + measured within-5% booleans; the oracle recomputes the exact side
    // (incl. the merged row's whole-table distinct — the quantity a
    // sketch union estimates) with TRUE literals for the bounds.
    "Q-agg-12" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val perYear = o
        .groupBy(year(col("o_orderdate")).cast("bigint").as("yr"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
          countDistinct(col("o_custkey")).as("exact_cust"))
      val years = perYear.select(col("yr"), col("exact_cust"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_cust")) <=
          col("exact_cust") * lit(0.05)).as("est_within_5pct"))
      val merged = perYear
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .crossJoin(o.agg(countDistinct(col("o_custkey")).as("exact_cust")))
        .select(lit(-1L).as("yr"), col("exact_cust"),
          (abs(col("est") - col("exact_cust")) <=
            col("exact_cust") * lit(0.05)).as("est_within_5pct"))
      years.unionAll(merged).orderBy("yr")
    },

    // ---- Q-agg-14: EXACT distinct via mergeable bitmaps — the
    // re-aggregatable exact twin of Q-agg-12's HLL: keys bucket into
    // fixed-width bitmaps (bitmap_construct_agg), bitmaps OR-merge across
    // partitions/partial states, and the final count is a popcount sum.
    // At 100 TB this is the pattern for exact distinct counts that must
    // re-aggregate across pre-computed partitions (HLL when ~1% error is
    // fine, bitmaps when it is not). Exact => hash-matched against plain
    // count(DISTINCT).
    "Q-agg-14" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          expr("bitmap_bucket_number(l_orderkey)").as("bucket"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_orderkey))").as("bm"))
        .groupBy("l_returnflag")
        .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
        .orderBy("l_returnflag")
    },

    // ---- Q-agg-13: histogram via width_bucket — equi-width bucketing as
    // a pure scalar function ahead of an ordinary partial-agg groupBy (the
    // scalable histogram: shuffle carries |buckets| rows). The oracle
    // replicates Spark's bucket arithmetic verbatim — floor((x - lo) /
    // ((hi - lo) / n)) + 1 — identical IEEE ops on identical doubles.
    "Q-agg-13" -> { (s, d) =>
      Tables.orders(s, d)
        .withColumn("bucket",
          width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0), lit(12L)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          Portable.r(min(col("o_totalprice")), 2).as("lo"),
          Portable.r(max(col("o_totalprice")), 2).as("hi"))
        .orderBy("bucket")
    },

    // ---- Q-agg-15: correlation / covariance family from DECIMAL-exact
    // moment sums (extends Q-agg-10's regression pattern): the builtin
    // corr/covar_* aggregates use running-moment updates whose
    // accumulation order is engine- and partitioning-dependent, so both
    // engines instead derive the statistics from the identical exact
    // moments. Single-pass partial agg; five fixed-width buffers per
    // group at any scale.
    "Q-agg-15" -> { (s, d) =>
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      val m = Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        Portable.dsum(x).as("sx"), Portable.dsum(y).as("sy"),
        Portable.dsum(x * y).as("sxy"),
        Portable.dsum(x * x).as("sxx"), Portable.dsum(y * y).as("syy"))
      val covP = (col("sxy") - col("sx") * col("sy") / col("n")) / col("n")
      val covS = (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1.0)
      val corr = (col("n") * col("sxy") - col("sx") * col("sy")) /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
             (col("n") * col("syy") - col("sy") * col("sy")))
      m.select(col("l_returnflag"),
          col("n").cast("bigint").as("n"),
          Portable.r(covP, 4).as("covar_pop"),
          Portable.r(covS, 4).as("covar_samp"),
          Portable.r(corr, 6).as("corr"),
          Portable.r(corr * corr, 6).as("r2"))
        .orderBy("l_returnflag")
    },

    // ---- Q-agg-17: grouping_id over CUBE — the single-integer encoding
    // of which grouping-set a row belongs to (Spark grouping_id() ==
    // DuckDB GROUPING(a, b): first column = MSB in both), the key a
    // downstream consumer uses to route subtotal rows.
    "Q-agg-17" -> { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("bigint").as("gid"),
          count(lit(1)).as("n"),
          Portable.r(Portable.dsum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_last,
          col("l_linestatus").asc_nulls_last)
    },

    // ---- Q-agg-16: approx_top_k heavy hitters (Datasketches frequent
    // items) — two paths that must agree: DIRECT (one aggregate over the
    // scan) and MERGED (per-p_size partial sketches accumulated, then
    // combined and estimated — the sketch-table pattern: keep per-partition
    // sketches, answer "top sellers over any partition set" without
    // rescans). maxItemsTracked (1024) exceeds the brand cardinality at
    // every SF, so the sketch is in its exact regime and both paths
    // hash-match the plain count ranking; ranks are re-derived from
    // (count DESC, item) because intra-sketch tie order is not contractual.
    "Q-agg-16" -> { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("graft_part_topk")
      val direct = s.sql(
        """SELECT 'direct' AS src, t.item AS p_brand, t.count AS n
           FROM (SELECT explode(approx_top_k(p_brand, 10, 1024)) AS t
                 FROM graft_part_topk)""")
      val merged = s.sql(
        """SELECT 'merged' AS src, t.item AS p_brand, t.count AS n
           FROM (SELECT explode(approx_top_k_estimate(
                          approx_top_k_combine(sk, 1024), 10)) AS t
                 FROM (SELECT approx_top_k_accumulate(p_brand, 1024) AS sk
                       FROM graft_part_topk GROUP BY p_size))""")
      val w = Window.partitionBy("src")
        .orderBy(col("n").desc, col("p_brand"))
      direct.unionAll(merged)
        .withColumn("rnk", row_number().over(w).cast("bigint"))
        .filter(col("rnk") <= 5)
        .select(col("src"), col("rnk"), col("p_brand"), col("n").cast("bigint").as("n"))
        .orderBy("src", "rnk")
    },

    // ---- Q-agg-18: skewness / excess kurtosis from DECIMAL-exact raw
    // moments (closes the shape-statistics family after Q-agg-15's
    // corr/covar): the builtin skewness/kurtosis aggregates use
    // order-dependent running central moments, so both engines derive
    // g1 = m3 / (m2*sqrt(m2)) and g2 = m4 / m2^2 - 3 from identical exact
    // sums of x..x^4 (sqrt is IEEE-correctly-rounded — bit-identical
    // across engines, unlike pow). One partial-agg pass, five fixed-width
    // buffers per group at any scale.
    "Q-agg-18" -> { (s, d) =>
      val x = col("l_quantity")
      val m = Tables.lineitem(s, d).groupBy("l_linestatus").agg(
        count(lit(1)).cast("double").as("n"),
        Portable.dsum(x).as("s1"),
        Portable.dsum(x * x).as("s2"),
        Portable.dsum(x * x * x).as("s3"),
        Portable.dsum(x * x * x * x).as("s4"))
      val m1 = col("s1") / col("n")
      val m2 = col("s2") / col("n") - m1 * m1
      val m3 = col("s3") / col("n") - lit(3.0) * m1 * col("s2") / col("n") +
        lit(2.0) * m1 * m1 * m1
      val m4 = col("s4") / col("n") - lit(4.0) * m1 * col("s3") / col("n") +
        lit(6.0) * m1 * m1 * col("s2") / col("n") - lit(3.0) * m1 * m1 * m1 * m1
      m.select(col("l_linestatus"),
          col("n").cast("bigint").as("n"),
          Portable.r(sqrt(m2), 6).as("stddev_pop"),
          Portable.r(m3 / (m2 * sqrt(m2)), 6).as("skew"),
          Portable.r(m4 / (m2 * m2) - lit(3.0), 6).as("kurt"))
        .orderBy("l_linestatus")
    },

    // ---- Q-agg-19: PIVOT + UNPIVOT through the SQL parser path (the
    // clause twins of Q-agg-08/09's DataFrame pivot/unpivot): a CTE
    // pivots per-status decimal sums wide, the outer UNPIVOT folds them
    // back long — the round-trip lands on a plain GROUP BY, which is
    // exactly what the oracle runs (DuckDB's PIVOT dialect differs, so
    // the statement is not shared verbatim; the SEMANTICS are).
    "Q-agg-19" -> { (s, d) =>
      Tables.registerViews(s, d)
      s.sql(
        """WITH p AS (
             SELECT * FROM (SELECT l_returnflag, l_linestatus,
                                   CAST(l_quantity AS DECIMAL(30,10)) AS q
                            FROM lineitem)
             PIVOT (sum(q) FOR l_linestatus IN ('O' AS o_qty, 'F' AS f_qty)))
           SELECT l_returnflag, status,
                  floor(CAST(qty AS DOUBLE) * 1e2 + 0.5) / 1e2 AS qty
           FROM p UNPIVOT (qty FOR status IN (o_qty, f_qty))
           ORDER BY l_returnflag, status""")
    }
  )

  val oracle: Map[String, String] = Map(
    "Q-agg-17" ->
      s"""SELECT l_returnflag, l_linestatus,
                GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
                count(*)::BIGINT AS n,
                ${Portable.rSql(Portable.dsumSql("l_quantity"), 2)} AS qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""",
    "Q-agg-16" ->
      """WITH exact AS (
           SELECT p_brand, count(*)::BIGINT AS n,
                  row_number() OVER (ORDER BY count(*) DESC, p_brand) AS rnk
           FROM part GROUP BY p_brand)
         SELECT src, rnk::BIGINT AS rnk, p_brand, n
         FROM exact CROSS JOIN (VALUES ('direct'), ('merged')) AS s(src)
         WHERE rnk <= 5 ORDER BY src, rnk""",
    "Q-agg-15" ->
      s"""WITH m AS (
           SELECT l_returnflag,
                  count(*)::DOUBLE AS n,
                  ${Portable.dsumSql("l_quantity")} AS sx,
                  ${Portable.dsumSql("l_extendedprice")} AS sy,
                  ${Portable.dsumSql("l_quantity * l_extendedprice")} AS sxy,
                  ${Portable.dsumSql("l_quantity * l_quantity")} AS sxx,
                  ${Portable.dsumSql("l_extendedprice * l_extendedprice")} AS syy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n::BIGINT AS n,
                ${Portable.rSql("(sxy - sx * sy / n) / n", 4)} AS covar_pop,
                ${Portable.rSql("(sxy - sx * sy / n) / (n - 1.0)", 4)} AS covar_samp,
                ${Portable.rSql(
                  "(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))", 6)}
                  AS corr,
                ${Portable.rSql(
                  "((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))) * " +
                  "((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))", 6)}
                  AS r2
         FROM m ORDER BY l_returnflag""",
    "Q-agg-14" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey)::BIGINT AS n_distinct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "Q-agg-13" ->
      s"""SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                     WHEN o_totalprice >= 600000.0 THEN 13
                     ELSE floor((o_totalprice - 0.0) / ((600000.0 - 0.0) / 12))::BIGINT + 1
                END AS bucket,
                count(*)::BIGINT AS n,
                ${Portable.rSql("min(o_totalprice)", 2)} AS lo,
                ${Portable.rSql("max(o_totalprice)", 2)} AS hi
         FROM orders GROUP BY bucket ORDER BY bucket""",
    "Q-agg-11" ->
      s"""SELECT o_orderpriority,
                arg_max(o_custkey, o_orderkey) AS cust_last,
                arg_min(o_custkey, o_orderkey) AS cust_first,
                count(*) FILTER (WHERE o_totalprice > 200000)::BIGINT AS n_big,
                bool_and(o_totalprice > 0) AS all_pos,
                bool_or(o_orderstatus = 'F') AS any_f,
                ${Portable.rSql(Portable.dsumSql(
                  "CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END"), 2)}
                  AS f_total
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "Q-agg-10" ->
      """WITH counts AS (
           SELECT l_returnflag, l_linestatus, count(*) AS cnt
           FROM lineitem GROUP BY 1, 2),
         m AS (
           SELECT l_returnflag, l_linestatus AS mode_status,
                  row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY cnt DESC, l_linestatus) AS rn
           FROM counts),
         a AS (
           SELECT l_returnflag,
                  array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
                  floor(quantile_cont(l_quantity, 0.5) * 1e6 + 0.5) / 1e6 AS median_qty,
                  count(*) AS n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sx,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) AS sy,
                  CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) AS sxy,
                  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sxx
           FROM lineitem GROUP BY 1)
         SELECT a.l_returnflag, statuses, mode_status, median_qty,
                floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1e6 + 0.5) / 1e6 AS slope,
                floor(((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n) * 1e4 + 0.5) / 1e4 AS icept,
                n::BIGINT AS n
         FROM a JOIN m ON a.l_returnflag = m.l_returnflag AND m.rn = 1
         ORDER BY a.l_returnflag""",
    "Q-agg-01" ->
      """SELECT l_returnflag, l_linestatus,
                floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS sum_qty,
                floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS sum_base,
                floor((CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS sum_disc,
                floor((CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS sum_charge,
                floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS avg_qty,
                floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / count(*)) * 1e4 + 0.5) / 1e4 AS avg_price,
                floor((CAST(sum(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS avg_disc,
                count(*)::BIGINT AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "Q-agg-02" ->
      """SELECT count(*)::BIGINT AS n_rows,
                count(DISTINCT l_orderkey)::BIGINT AS n_orders,
                count(DISTINCT l_partkey)::BIGINT AS n_parts,
                floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS total_qty,
                floor((min(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS min_price,
                floor((max(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS max_price
         FROM lineitem""",
    "Q-agg-03" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
                coalesce(l_linestatus, 'ALL') AS ls,
                grouping(l_returnflag)::BIGINT AS g_rf,
                grouping(l_linestatus)::BIGINT AS g_ls,
                count(*)::BIGINT AS n, floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, rf, ls""",
    "Q-agg-03-cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
                coalesce(o_orderpriority, 'ALL') AS pri,
                grouping(o_orderstatus)::BIGINT AS g_st,
                grouping(o_orderpriority)::BIGINT AS g_pri,
                count(*)::BIGINT AS n, floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS total
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY g_st, g_pri, st, pri""",
    "Q-agg-05" ->
      """SELECT o_custkey, count(*)::BIGINT AS n,
                floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS total
         FROM orders GROUP BY o_custkey HAVING count(*) >= 12
         ORDER BY o_custkey""",
    "Q-agg-07" ->
      """SELECT l_returnflag,
                floor((quantile_cont(l_extendedprice, 0.25)) * 1e4 + 0.5) / 1e4 AS p25,
                floor((quantile_cont(l_extendedprice, 0.5)) * 1e4 + 0.5) / 1e4 AS p50,
                floor((quantile_cont(l_extendedprice, 0.9)) * 1e4 + 0.5) / 1e4 AS p90
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // the sketch bounds are TRUE literals on the oracle side: the Spark
    // query MEASURES them, so a hash mismatch = a violated error bound
    "Q-agg-04" ->
      """SELECT l_returnflag,
                count(DISTINCT l_orderkey)::BIGINT AS exact_orders,
                count(*)::BIGINT AS n,
                TRUE AS hll_within_5pct, TRUE AS p50_within_1pct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "Q-agg-07-approx" ->
      """SELECT l_returnflag,
                floor((quantile_cont(l_extendedprice, 0.25)) * 1e4 + 0.5) / 1e4 AS p25,
                floor((quantile_cont(l_extendedprice, 0.5)) * 1e4 + 0.5) / 1e4 AS p50,
                floor((quantile_cont(l_extendedprice, 0.9)) * 1e4 + 0.5) / 1e4 AS p90,
                TRUE AS p25_within_1pct, TRUE AS p50_within_1pct,
                TRUE AS p90_within_1pct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "Q-agg-12" ->
      """WITH y AS (SELECT year(o_orderdate)::BIGINT AS yr,
                           count(DISTINCT o_custkey)::BIGINT AS exact_cust
                    FROM orders GROUP BY 1),
              m AS (SELECT CAST(-1 AS BIGINT) AS yr,
                           count(DISTINCT o_custkey)::BIGINT AS exact_cust
                    FROM orders)
         SELECT yr, exact_cust, TRUE AS est_within_5pct
         FROM (SELECT * FROM y UNION ALL SELECT * FROM m) u ORDER BY yr""",
    "Q-agg-stats" ->
      """SELECT l_linestatus,
                floor((var_samp(l_quantity)) * 1e6 + 0.5) / 1e6 AS var_qty,
                floor((stddev_samp(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS sd_price,
                floor((corr(l_quantity, l_extendedprice)) * 1e6 + 0.5) / 1e6 AS corr_qty_price,
                floor((covar_samp(l_quantity, l_discount)) * 1e6 + 0.5) / 1e6 AS covar_qty_disc
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "Q-agg-18" -> {
      val m1 = "(s1/n)"
      val m2 = s"(s2/n - $m1*$m1)"
      val m3 = s"(s3/n - 3.0 * $m1 * s2 / n + 2.0 * $m1 * $m1 * $m1)"
      val m4 = s"(s4/n - 4.0 * $m1 * s3 / n + 6.0 * $m1 * $m1 * s2 / n" +
        s" - 3.0 * $m1 * $m1 * $m1 * $m1)"
      s"""WITH m AS (
           SELECT l_linestatus,
                  count(*)::DOUBLE AS n,
                  ${Portable.dsumSql("l_quantity")} AS s1,
                  ${Portable.dsumSql("l_quantity * l_quantity")} AS s2,
                  ${Portable.dsumSql("l_quantity * l_quantity * l_quantity")} AS s3,
                  ${Portable.dsumSql(
                    "l_quantity * l_quantity * l_quantity * l_quantity")} AS s4
           FROM lineitem GROUP BY l_linestatus)
         SELECT l_linestatus, n::BIGINT AS n,
                ${Portable.rSql(s"sqrt($m2)", 6)} AS stddev_pop,
                ${Portable.rSql(s"$m3 / ($m2 * sqrt($m2))", 6)} AS skew,
                ${Portable.rSql(s"$m4 / ($m2 * $m2) - 3.0", 6)} AS kurt
         FROM m ORDER BY l_linestatus"""
    },
    "Q-agg-19" ->
      """SELECT l_returnflag,
                CASE l_linestatus WHEN 'O' THEN 'o_qty' ELSE 'f_qty' END AS status,
                floor(CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)
                  * 1e2 + 0.5) / 1e2 AS qty
         FROM lineitem
         GROUP BY 1, 2 ORDER BY l_returnflag, status"""
  )
}
