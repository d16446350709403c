package graft.queries

import graft.core.Tables

/** Q-sql-*: the SQL entry path — classic TPC-H-shaped analytics expressed
  * as `spark.sql(...)` text over registered views, not the DataFrame API.
  *
  * This is deliberate surface coverage: a user of the reference-class
  * engine writes SQL as often as code, and the SQL path exercises the full
  * parser → analyzer → Catalyst pipeline (the DataFrame queries enter
  * below the parser). The text is dialect-portable, so the DuckDB oracle
  * runs the IDENTICAL statement — parity is tested at the language level,
  * not just the result level.
  *
  * Scale notes: each query is the canonical warehouse pattern Catalyst
  * optimizes well — selective dim filter + fact join (broadcast at these
  * dim sizes, shuffle join with runtime filters at 100 TB), partial
  * aggregation before every exchange, and top-k that plans as
  * TakeOrderedAndProject (k rows per partition cross the wire, never the
  * full sort).
  */
object SqlSurface {

  // Sums run through DECIMAL(30,10) (Portable.dsum algebra) so the result
  // is summation-order-independent and floor-rounding is bit-portable.
  private def rev(expr: String): String =
    s"floor(CAST(sum(CAST(($expr) AS DECIMAL(30,10))) AS DOUBLE) * 1e2 + 0.5) / 1e2"

  /** TPC-H Q3 shape: shipping-priority top-10 — selective segment filter,
    * two fact joins, grouped revenue, deterministic top-k. */
  private val sql01: String =
    s"""SELECT l_orderkey,
               ${rev("l_extendedprice * (1 - l_discount)")} AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10"""

  /** TPC-H Q10 shape: returned-item revenue per customer with dim lookup. */
  private val sql02: String =
    s"""SELECT c_custkey, c_name, n_name,
               ${rev("l_extendedprice * (1 - l_discount)")} AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20"""

  /** TPC-H Q18 shape: large-volume orders — IN-subquery over a grouped
    * HAVING (l_quantity is integral in the testdata, so the double sums
    * compared against the threshold are exact on both engines). */
  private val sql03: String =
    s"""SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
               ${rev("l_quantity")} AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING sum(l_quantity) > 120)
        GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100"""

  /** Explicit GROUPING SETS (beyond Q-agg-03's ROLLUP/CUBE): four chosen
    * sets, plans as one Expand + single aggregation. NULL group keys are
    * coalesced to 'ALL' so ordering never touches engine null-order
    * defaults (the Q-agg-03 convention). */
  private val sql04: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
               CAST(count(*) AS BIGINT) AS n,
               ${rev("l_quantity")} AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        ORDER BY g_rf, g_ls, rf, ls"""

  /** TPC-H Q4 shape: order-priority checking — EXISTS decorrelates to a
    * left-semi join (no row multiplication from multi-lineitem orders). */
  private val sql05: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  /** TPC-H Q6 shape: revenue-change forecast — pure scan + filter + one
    * global aggregate; the whole plan is a single codegen'd stage over a
    * pushed-down parquet scan. */
  private val sql06: String =
    s"""SELECT ${rev("l_extendedprice * l_discount")} AS revenue,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24"""

  /** TPC-H Q14 shape: promo revenue share — conditional aggregation over
    * a fact-dim join; the CASE folds into the partial aggregate so the
    * join output never rematerializes per-branch. */
  private val sql07: String =
    s"""SELECT floor(100.0 * promo / total * 1e4 + 0.5) / 1e4 AS promo_share,
               CAST(n AS BIGINT) AS n
        FROM (SELECT
                ${rev("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS promo,
                ${rev("l_extendedprice * (1 - l_discount)")} AS total,
                count(*) AS n
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00')"""

  /** TPC-H Q15 shape: top supplier by windowed revenue — a CTE reused
    * twice (join source + scalar MAX subquery); Catalyst plans the scalar
    * subquery as an independent stage and broadcasts the one-row result.
    * Revenue goes through the portable decimal+floor algebra, so the
    * equality against MAX compares identical doubles on both engines. */
  private val sql08: String =
    s"""WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 ${rev("l_extendedprice * (1 - l_discount)")} AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_rev
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT max(total_rev) FROM revenue)
        ORDER BY s_suppkey"""

  /** TPC-H Q21 shape: sole-failing-supplier detection — single-scan form.
    *
    * The textbook EXISTS + NOT EXISTS pair (kept below as Q-sql-09-exists
    * for parser coverage) decorrelates to a semi join AND an anti join,
    * each shuffling the fact: three fact scans, two fact-sized exchanges.
    * This form derives both predicates from ONE `GROUP BY l_orderkey`:
    *   EXISTS  (other supplier in order)          ⇔ n_supp  >= 2
    *   NOT EXISTS (other FAILING supplier)        ⇔ n_fail  =  1
    *     (given l1 itself failed, so the fail set is exactly {l1.suppkey})
    * One fact aggregation + one join back to the R-filtered fact = one
    * fact shuffle instead of two. 'failed' rendered as l_returnflag = 'R'
    * since the testdata has no receipt/commit dates. */
  private val sql09: String =
    """WITH per_pair AS (
         SELECT l_orderkey AS po_orderkey, l_suppkey,
                max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS failed
         FROM lineitem
         GROUP BY 1, 2),
       per_order AS (
         SELECT po_orderkey,
                count(*) AS n_supp,
                sum(failed) AS n_fail
         FROM per_pair
         GROUP BY 1)
       SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
       FROM supplier
       JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
       JOIN orders ON o_orderkey = l1.l_orderkey
       JOIN per_order ON po_orderkey = l1.l_orderkey
       WHERE o_orderstatus = 'F'
         AND l1.l_returnflag = 'R'
         AND n_supp >= 2
         AND n_fail = 1
       GROUP BY s_name
       ORDER BY numwait DESC, s_name"""

  /** The original EXISTS + NOT EXISTS rendering of Q21, retained to keep
    * the parser/decorrelation surface covered (semi + anti join against
    * one correlated table). Result is pinned identical to Q-sql-09. */
  private val sql09Exists: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
       FROM supplier
       JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
       JOIN orders ON o_orderkey = l1.l_orderkey
       WHERE o_orderstatus = 'F'
         AND l1.l_returnflag = 'R'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_returnflag = 'R')
       GROUP BY s_name
       ORDER BY numwait DESC, s_name"""

  /** TPC-H Q22 shape: above-average-balance customers with no urgent
    * orders — an uncorrelated scalar AVG subquery (order-independent via
    * the decimal-sum rendering) plus a NOT EXISTS anti-join, grouped by
    * nation. */
  private val sql10: String =
    """SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
              floor(CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) * 1e2 + 0.5) / 1e2
                AS totacctbal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE)
                                 / count(*)
                          FROM customer WHERE c_acctbal > 0)
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderpriority = '1-URGENT')
       GROUP BY n_name
       ORDER BY n_name"""

  /** TPC-H Q17 shape: small-quantity revenue — correlated scalar AVG
    * subquery per part, decorrelated by Catalyst into an aggregate +
    * join (l_quantity is integral in the testdata, so the avg is
    * order-independent double arithmetic on both engines). */
  private val sql11: String =
    s"""SELECT ${rev("l_extendedprice")} AS small_qty_rev,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""

  /** NOT IN with null-aware anti-join semantics — the three-valued-logic
    * trap pinned as a contract: against a null-free subquery NOT IN is a
    * plain anti join (n_clean > 0); if the subquery can produce even one
    * NULL, `x NOT IN (...)` is never TRUE and the count is exactly 0.
    * Spark plans the second as a null-aware anti join. */
  private val sql12: String =
    """SELECT
         CAST((SELECT count(*) FROM customer
               WHERE c_custkey NOT IN
                     (SELECT o_custkey FROM orders
                      WHERE o_orderpriority = '1-URGENT')) AS BIGINT) AS n_clean,
         CAST((SELECT count(*) FROM customer
               WHERE c_custkey NOT IN
                     (SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                                  ELSE o_custkey END
                      FROM orders
                      WHERE o_orderpriority = '1-URGENT')) AS BIGINT) AS n_with_null"""

  /** Window functions through the SQL path — ranked top-3 orders per
    * customer plus a running decimal-exact spend, both over explicit
    * WINDOW clauses; the rank filter decorrelates to a partial
    * WindowGroupLimit exactly like the DataFrame path's Q-sort-03. */
  private val sql13: String =
    """SELECT o_custkey, o_orderkey, rn, running_spend
       FROM (SELECT o_custkey, o_orderkey,
                    CAST(row_number() OVER
                      (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
                    floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) OVER
                      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE) * 1e2 + 0.5) / 1e2 AS running_spend
             FROM orders)
       WHERE rn <= 3
       ORDER BY o_custkey, rn"""

  /** TPC-H Q7 shape: bilateral shipping volume — the two-role dimension
    * pattern (nation joined TWICE under different aliases, supplier side
    * and customer side), a symmetric pair predicate, and per-year grouped
    * revenue. Catalyst broadcasts both nation aliases independently; at
    * 100 TB the fact side shuffles once for the orders join and the
    * nation pair filter prunes before any aggregation. */
  private val sql14: String =
    s"""SELECT supp_nation, cust_nation, l_year,
               ${rev("volume")} AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     year(l_shipdate) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM supplier
              JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
                 OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')) v
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year"""

  /** TPC-H Q19 shape: disjunctive multi-clause join predicate — three OR'd
    * conjunctions each mixing join-side (part) and fact-side (lineitem)
    * ranges. The optimizer test: Catalyst extracts the common
    * `p_partkey = l_partkey` equi-key so the join stays hash-based, and
    * pushes the per-side disjunction residuals (`p_brand/p_size` to the
    * part scan, `l_quantity` to the fact scan) instead of evaluating the
    * whole OR post-join. */
  private val sql15: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_items,
               ${rev("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 5 AND 25)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 15 AND 35)
           OR (p_type = 'ECONOMY' AND p_size BETWEEN 20 AND 45
               AND l_quantity >= 30)"""

  /** TPC-H Q2 shape: correlated MIN subquery — each part's cheapest
    * lineitem(s), with supplier/nation dim lookups. Catalyst decorrelates
    * the scalar subquery into a grouped-min join against the same fact
    * (one extra partial-agg shuffle, never a per-row rescan). The price
    * equality is on STORED doubles (no arithmetic), so it is exact on
    * both engines; (l_orderkey, l_linenumber) keeps rows unique. */
  private val sql16: String =
    s"""SELECT p_partkey, p_brand, s_name, n_name, l_extendedprice,
               l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_size <= 5
          AND l_extendedprice = (SELECT min(l2.l_extendedprice)
                                 FROM lineitem l2
                                 WHERE l2.l_partkey = p_partkey)
        ORDER BY p_partkey, l_orderkey, l_linenumber"""

  /** TPC-H Q8 shape: market share — one nation's volume fraction within a
    * region per order year. The share is a quotient of two DECIMAL-exact
    * conditional sums (both engines divide the identical doubles). */
  private val sql17: String =
    s"""SELECT CAST(o_year AS BIGINT) AS o_year,
               floor((CAST(sum(CASE WHEN nation = 'NATION_2' THEN vol_d
                                    ELSE CAST(0 AS DECIMAL(30,10)) END) AS DOUBLE)
                      / CAST(sum(vol_d) AS DOUBLE)) * 1e6 + 0.5) / 1e6
                 AS mkt_share
        FROM (SELECT year(o_orderdate) AS o_year,
                     CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))
                       AS vol_d,
                     n_name AS nation
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA') all_volume
        GROUP BY o_year
        ORDER BY o_year"""

  /** TPC-H Q12 shape: late-shipment priority counts — both output columns
    * are conditional aggregates folded into ONE partial agg over the
    * joined fact (no second pass per priority class). The testdata has no
    * l_shipmode, so the grouping key is l_linestatus and "late" is
    * ship ≥ order + 30 days. */
  private val sql18: String =
    s"""SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_prio,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_prio
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
        GROUP BY l_linestatus
        ORDER BY l_linestatus"""

  /** TPC-H Q13 shape: customer order-count distribution — LEFT OUTER join
    * with an extra ON-clause predicate (customers with zero qualifying
    * orders must survive with count 0), then a second aggregation over
    * the counts. Two partial-agg shuffles, both keyed by
    * already-aggregated cardinalities. */
  private val sql19: String =
    s"""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC"""

  /** TPC-H Q16 shape: supplier-count per part attribute with a NOT IN
    * exclusion — the subquery is provably null-free (s_suppkey is a key),
    * so the NOT IN plans as a simple anti join (contrast Q-sql-12, which
    * pins the three-valued-logic path), and count(DISTINCT) expands to
    * the standard two-phase distinct aggregate. */
  private val sql20: String =
    s"""SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_type NOT LIKE 'SM%'
          AND p_size IN (1, 4, 7, 10, 15, 22, 25, 40)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_name LIKE '%8')
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** TPC-H Q9 shape: product-type profit by nation and year — the widest
    * fact expansion in the suite (lineitem × part × supplier × nation),
    * profit computed per line then rolled up by (nation, year). The
    * testdata has no partsupp, so supply cost is proxied by
    * p_retailprice × quantity × 0.8. Dims broadcast; the only shuffle is
    * the final (nation, year) partial agg. */
  private val sql21: String =
    s"""SELECT n_name AS nation, CAST(o_year AS BIGINT) AS o_year,
               ${rev("amount")} AS sum_profit
        FROM (SELECT n_name, year(o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount)
                       - p_retailprice * l_quantity * 0.8 AS amount
              FROM lineitem
              JOIN part     ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN nation   ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%a%') profit
        GROUP BY n_name, o_year
        ORDER BY nation, o_year"""

  /** TPC-H Q11 shape: important-stock HAVING against a GLOBAL scalar
    * subquery — per-nation inventory value kept only if it exceeds a
    * fraction of the grand total. The scalar subquery plans as an
    * independent one-row aggregate broadcast into the HAVING predicate
    * (the whole fact is scanned twice; at 100 TB the two passes share the
    * pushed scan shape). Thresholds compare DECIMAL-exact sums. */
  private val sql22: String =
    s"""SELECT n_name, ${rev("l_extendedprice * l_quantity")} AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY n_name
        HAVING sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,10)))
             > (SELECT sum(CAST(l_extendedprice * l_quantity
                               AS DECIMAL(30,10))) * 0.05
                FROM lineitem)
        ORDER BY value DESC, n_name"""

  /** TPC-H Q20 shape: nested semi-join chain with a grouped-threshold
    * qualifier — suppliers who shipped more than TWICE the fair
    * per-supplier share of some 'PROMO' part they carry (fair share =
    * part total / distinct suppliers, so the predicate stays selective
    * at every scale factor — a fixed fraction would empty out as the
    * supplier pool grows). The per-(part, supplier) and per-part sums
    * decorrelate to two grouped aggregates over the same pushed scan;
    * the outer IN becomes a semi join, so no row ever multiplies. */
  private val sql23: String =
    s"""SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT ps.l_suppkey
          FROM (SELECT l_suppkey, l_partkey,
                       sum(CAST(l_quantity AS DECIMAL(30,10))) AS supp_qty
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_type = 'PROMO'
                GROUP BY l_suppkey, l_partkey) ps
          JOIN (SELECT l_partkey AS t_partkey,
                       sum(CAST(l_quantity AS DECIMAL(30,10))) AS total_qty,
                       count(DISTINCT l_suppkey) AS n_supp
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_type = 'PROMO'
                GROUP BY l_partkey) tot
            ON ps.l_partkey = tot.t_partkey
          WHERE CAST(ps.supp_qty AS DOUBLE)
              > CAST(tot.total_qty AS DOUBLE) / tot.n_supp * 2)
        ORDER BY s_name"""

  /** Join-strategy HINT through the SQL path: `/*+ MERGE(nation) */`
    * forces a sort-merge join where Catalyst would default to broadcast —
    * the escape hatch for when the optimizer's size estimate is wrong
    * (e.g. a "small" dim that explodes after a generator). The hint rides
    * a standard comment, so the oracle runs the IDENTICAL text and simply
    * ignores it; ExplainCheck pins that the hint actually flipped the
    * strategy. */
  private val sql24: String =
    s"""SELECT /*+ MERGE(nation) */ n_name,
               CAST(count(*) AS BIGINT) AS n_custs,
               ${rev("c_acctbal")} AS bal_sum
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name"""

  /** Recursive CTE (Spark 4's WITH RECURSIVE): walk the implicit binary
    * tree over customer keys (children of k are 2k and 2k+1) from the
    * root down, and profile each level. Recursion is the one SQL shape
    * the rest of the surface can't express without a driver loop; here
    * the engine's own fixpoint operator runs it — each step joins the
    * PREVIOUS LEVEL (a shrinking, broadcastable set) against the dim, so
    * depth = log2(|customer|) iterations, never row-at-a-time. The
    * identical text runs on DuckDB (both follow the SQL:1999 UNION ALL
    * recursion semantics). */
  private val sql25: String =
    """WITH RECURSIVE tree(k, depth) AS (
         SELECT CAST(c_custkey AS BIGINT), CAST(0 AS BIGINT)
         FROM customer WHERE c_custkey = 1
         UNION ALL
         SELECT CAST(c.c_custkey AS BIGINT), t.depth + 1
         FROM customer c JOIN tree t
           ON c.c_custkey = t.k * 2 OR c.c_custkey = t.k * 2 + 1)
       SELECT depth, CAST(count(*) AS BIGINT) AS n,
              CAST(min(k) AS BIGINT) AS first_k,
              CAST(max(k) AS BIGINT) AS last_k
       FROM tree GROUP BY depth ORDER BY depth"""

  /** Named-WINDOW-clause parity (SQL:2003 WINDOW): one spec shared by a
    * running total, a row number, and a 3-row moving average. Window
    * sums run through DECIMAL(30,10) — DuckDB evaluates sliding frames
    * with a segment tree, so double accumulation ORDER differs from
    * Spark's running scan; exact decimal is associative and order-free. */
  private val sql26: String =
    """SELECT CAST(user_id AS BIGINT) AS user_id,
              CAST(event_id AS BIGINT) AS event_id,
              floor(CAST(sum(CAST(value AS DECIMAL(30,10))) OVER w AS DOUBLE)
                    * 1e4 + 0.5) / 1e4 AS run_sum,
              CAST(row_number() OVER w AS BIGINT) AS rn,
              floor(CAST(sum(CAST(value AS DECIMAL(30,10))) OVER w3 AS DOUBLE)
                    / CAST(count(*) OVER w3 AS DOUBLE) * 1e4 + 0.5) / 1e4
                AS avg3
       FROM events
       WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
              w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       ORDER BY user_id, rn"""

  private val texts: Map[String, String] = Map(
    "Q-sql-01" -> sql01,
    "Q-sql-02" -> sql02,
    "Q-sql-03" -> sql03,
    "Q-sql-04" -> sql04,
    "Q-sql-05" -> sql05,
    "Q-sql-06" -> sql06,
    "Q-sql-07" -> sql07,
    "Q-sql-08" -> sql08,
    "Q-sql-09" -> sql09,
    "Q-sql-09-exists" -> sql09Exists,
    "Q-sql-10" -> sql10,
    "Q-sql-11" -> sql11,
    "Q-sql-12" -> sql12,
    "Q-sql-13" -> sql13,
    "Q-sql-14" -> sql14,
    "Q-sql-15" -> sql15,
    "Q-sql-16" -> sql16,
    "Q-sql-17" -> sql17,
    "Q-sql-18" -> sql18,
    "Q-sql-19" -> sql19,
    "Q-sql-20" -> sql20,
    "Q-sql-21" -> sql21,
    "Q-sql-22" -> sql22,
    "Q-sql-23" -> sql23,
    "Q-sql-24" -> sql24,
    "Q-sql-25" -> sql25,
    "Q-sql-26" -> sql26)

  val queries: Map[String, Q] = texts.map { case (name, text) =>
    val q: Q = (s, d) => { Tables.registerViews(s, d); s.sql(text) }
    name -> q
  }

  // the oracle runs the very same statement text
  val oracle: Map[String, String] = texts
}
