package graft.queries

/** Third TPC-DS-shape battery (reference corpus:
  * flink-end-to-end-tests/flink-tpcds-test, runner
  * TpcdsTestProgram.java:49) — optimizer idioms still uncovered after
  * TpcDsShapes/TpcDsShapes2: a cross join of independent scalar-count
  * subqueries (Q88's 8-box time-band matrix), a ratio of two scalar
  * counts (Q90 am/pm), EXISTS + NOT EXISTS on the same correlation key
  * (Q35/Q69 cohort minus exclusion), the null-filtered LEFT JOIN
  * "sales without returns" (Q78 — Catalyst should plan an anti join),
  * a FULL OUTER overlap count of two channel sets (Q97), window
  * deviation-from-group-average with LAG (Q47/Q57's monthly-trend
  * outliers), and the SUM(CASE) quarter pivot (Q66's shipping-mode /
  * month matrix). One ANSI SQL text per query runs verbatim on BOTH
  * Spark and the DuckDB oracle.
  *
  * Determinism: double aggregation goes through exact DECIMAL casts
  * (Catalog.dsum discipline); integer CASE-sums are cast to BIGINT in
  * the shared text (DuckDB SUM(int) yields HUGEINT — the q_agg_q12
  * lesson).
  */
object TpcDsShapes3 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // Q88 shape: independent filtered COUNT boxes cross-joined into one
  // row — each box is its own scan+agg subtree; the join is a cartesian
  // of four 1-row results (broadcast, no shuffle explosion).
  private val scalarCountsSql =
    """SELECT * FROM
      | (SELECT COUNT(1) AS h1 FROM lineitem
      |  WHERE l_quantity BETWEEN 1 AND 10 AND l_discount < 0.05) a,
      | (SELECT COUNT(1) AS h2 FROM lineitem
      |  WHERE l_quantity BETWEEN 11 AND 20 AND l_discount < 0.05) b,
      | (SELECT COUNT(1) AS h3 FROM lineitem
      |  WHERE l_quantity BETWEEN 21 AND 30 AND l_discount >= 0.05) c,
      | (SELECT COUNT(1) AS h4 FROM lineitem
      |  WHERE l_quantity BETWEEN 31 AND 40 AND l_discount >= 0.05) d"""
      .stripMargin

  // Q90 shape: ratio of two scalar counts (am/pm) — two aggregated
  // single-row subqueries divided in the outer projection.
  private val countRatioSql =
    """SELECT CAST(am.cnt AS DOUBLE) / pm.cnt AS am_pm_ratio FROM
      | (SELECT COUNT(1) AS cnt FROM orders
      |  WHERE EXTRACT(MONTH FROM o_orderdate) <= 6) am,
      | (SELECT COUNT(1) AS cnt FROM orders
      |  WHERE EXTRACT(MONTH FROM o_orderdate) > 6) pm""".stripMargin

  // Q35/Q69 shape: EXISTS and NOT EXISTS against the same correlation
  // key — a semi join AND an anti join on one attribute, fused by
  // decorrelation.
  private val existsNotExistsSql =
    """SELECT c_mktsegment, COUNT(1) AS cnt FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // Q78 shape: "sales without returns" — LEFT JOIN to the returns set,
  // keep only null matches (the null-filtered outer join Catalyst
  // rewrites to an anti join), then aggregate per year.
  private val noReturnsSql =
    """WITH ret AS (
      |  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
      |SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, COUNT(1) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders LEFT JOIN ret ON l_orderkey = o_orderkey
      |WHERE l_orderkey IS NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // Q97 shape: FULL OUTER JOIN of two distinct-key channel sets,
  // classifying each key as channel-1-only / channel-2-only / both.
  private val fullOuterChannelsSql =
    """WITH ch1 AS (
      |  SELECT DISTINCT o_custkey AS k FROM orders
      |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
      |ch2 AS (
      |  SELECT DISTINCT o_custkey AS k FROM orders
      |  WHERE o_totalprice > 150000.0)
      |SELECT
      |  CAST(SUM(CASE WHEN ch1.k IS NOT NULL AND ch2.k IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS only1,
      |  CAST(SUM(CASE WHEN ch1.k IS NULL AND ch2.k IS NOT NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS only2,
      |  CAST(SUM(CASE WHEN ch1.k IS NOT NULL AND ch2.k IS NOT NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS both_ch
      |FROM ch1 FULL OUTER JOIN ch2 ON ch1.k = ch2.k""".stripMargin

  // Q47/Q57 shape: monthly revenue vs the year's per-group average —
  // windowed average + LAG over an aggregated CTE, selecting months
  // deviating > 30% from their year average. The window average is an
  // exact decimal sum over already-exact month values, so the deviation
  // threshold can't flip at ulp level on either engine.
  private val windowDeviationSql =
    """WITH v AS (
      |  SELECT c_nationkey AS nk, EXTRACT(YEAR FROM o_orderdate) AS yr,
      |    EXTRACT(MONTH FROM o_orderdate) AS mon,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2, 3),
      |w AS (
      |  SELECT nk, yr, mon, rev,
      |    CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER (PARTITION BY nk, yr)
      |      AS DOUBLE) / COUNT(1) OVER (PARTITION BY nk, yr) AS avg_rev,
      |    LAG(rev) OVER (PARTITION BY nk ORDER BY yr, mon) AS prev_rev
      |  FROM v)
      |SELECT nk, yr, mon, rev, avg_rev, prev_rev FROM w
      |WHERE avg_rev > 0 AND ABS(rev - avg_rev) / avg_rev > 0.3
      |  AND prev_rev IS NOT NULL
      |ORDER BY nk, yr, mon""".stripMargin

  // Q66 shape: SUM(CASE) pivot — one scan emitting a quarter × revenue
  // matrix per group (the classic manual PIVOT both planners fuse into
  // a single aggregate).
  private val casePivotSql = {
    def q(lo: Int, hi: Int, as: String) =
      s"""  CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate)
         |    BETWEEN $lo AND $hi THEN CAST(o_totalprice AS DECIMAL(18,2))
         |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS $as"""
        .stripMargin
    s"""SELECT c_nationkey AS nk,
       |${q(1, 3, "q1_rev")},
       |${q(4, 6, "q2_rev")},
       |${q(7, 9, "q3_rev")},
       |${q(10, 12, "q4_rev")}
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  private def sqlQuery(name: String, sql: String,
      tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql))

  val queries: Seq[Query] = Seq(
    sqlQuery("q_ds_scalar_counts", scalarCountsSql, "lineitem"),
    sqlQuery("q_ds_count_ratio", countRatioSql, "orders"),
    sqlQuery("q_ds_exists_not_exists", existsNotExistsSql,
      "customer", "orders"),
    sqlQuery("q_ds_no_returns", noReturnsSql, "orders", "lineitem"),
    sqlQuery("q_ds_full_outer_channels", fullOuterChannelsSql, "orders"),
    sqlQuery("q_ds_window_deviation", windowDeviationSql,
      "customer", "orders"),
    sqlQuery("q_ds_case_pivot", casePivotSql, "customer", "orders"))
}
