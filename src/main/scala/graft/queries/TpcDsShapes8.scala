package graft.queries

/** Eighth TPC-DS-shape battery (reference corpus:
  * flink-end-to-end-tests/flink-tpcds-test) — four more distinctive
  * idioms on the TPC-H-ish fixtures: GROUPING()-driven rank within
  * ROLLUP levels (Q70/Q36), the dimension-filtered CTE self-joined
  * across consecutive years (Q64's sale/resale comparison), the
  * multi-warehouse EXISTS chain over a self-join inequality (Q95), and
  * the consecutive-month variance-pair join in exact integer moments
  * (Q39). One ANSI SQL text per query, run verbatim on BOTH Spark and
  * the DuckDB oracle; every re-aggregated value passes through
  * DECIMAL(18,2) and drops to DOUBLE only at the end or for division.
  */
object TpcDsShapes8 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // Q70/Q36 shape: ROLLUP with GROUPING() exposing the subtotal level,
  // then RANK() partitioned by (level, level-scoped key) — the
  // "lochierarchy" report: per-segment rows ranked within their nation,
  // nation subtotals ranked against each other, one grand total.
  private val groupingRankSql =
    """WITH results AS (
      |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal,
      |    CAST(GROUPING(c_nationkey) + GROUPING(c_mktsegment) AS BIGINT)
      |      AS lochierarchy
      |  FROM customer
      |  GROUP BY ROLLUP(c_nationkey, c_mktsegment))
      |SELECT lochierarchy, nk, seg, bal,
      |  RANK() OVER (
      |    PARTITION BY lochierarchy,
      |      CASE WHEN lochierarchy = 0 THEN nk END
      |    ORDER BY bal DESC) AS rk
      |FROM results
      |ORDER BY lochierarchy DESC, nk NULLS FIRST, seg NULLS FIRST, rk""".stripMargin

  // Q64 shape: a sales CTE built from a multi-dimension join with
  // selective filters, then self-joined on (brand, year+1) to surface
  // year-over-year collapses — the sale/resale comparison pattern. The
  // idiom: ONE CTE, TWO instances, join keys offset in time, band
  // predicate across the instances.
  private val resaleDropSql =
    """WITH sales AS (
      |  SELECT p_brand AS brand,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
      |    COUNT(1) AS n,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
      |      AS DECIMAL(18,2)) AS rev
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  WHERE p_size < 20 AND s_nationkey < 10
      |  GROUP BY 1, 2)
      |SELECT a.brand, a.yr AS yr1, b.yr AS yr2,
      |  CAST(a.rev AS DOUBLE) AS rev1, CAST(b.rev AS DOUBLE) AS rev2,
      |  a.n AS n1, b.n AS n2
      |FROM sales a JOIN sales b
      |  ON a.brand = b.brand AND b.yr = a.yr + 1
      |WHERE CAST(b.rev AS DOUBLE) <= CAST(a.rev AS DOUBLE) * 0.8
      |ORDER BY a.brand, a.yr""".stripMargin

  // Q95 shape: orders shipped by MULTIPLE suppliers (distinct self-join
  // inequality on the fact) that were never returned — EXISTS over the
  // derived multi-supplier set plus NOT EXISTS over returns, reduced to
  // one summary row. Catalyst plans the chain as semi + anti joins.
  private val multiSupplierSql =
    """WITH multi_supp AS (
      |  SELECT DISTINCT l1.l_orderkey AS ok
      |  FROM lineitem l1 JOIN lineitem l2
      |    ON l1.l_orderkey = l2.l_orderkey
      |   AND l1.l_suppkey <> l2.l_suppkey)
      |SELECT COUNT(1) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price
      |FROM orders
      |WHERE o_orderpriority = '1-URGENT'
      |  AND EXISTS (SELECT 1 FROM multi_supp m WHERE m.ok = o_orderkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l
      |        WHERE l.l_orderkey = o_orderkey
      |          AND l.l_returnflag = 'R')""".stripMargin

  // Q39 shape: per-(supplier, month) demand variability in EXACT integer
  // moments (n, Σx, Σx² as decimals; CV² = n·Σx²/Σx² − 1 computed in one
  // double step), consecutive months paired by a self-join — the
  // "volatile in March AND April" report.
  private val varianceChainSql =
    """WITH moments AS (
      |  SELECT l_suppkey AS sk,
      |    CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mo,
      |    COUNT(1) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
      |      AS DECIMAL(18,2)) AS s1,
      |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,2)))
      |      AS DECIMAL(18,2)) AS s2
      |  FROM lineitem
      |  WHERE EXTRACT(YEAR FROM l_shipdate) = 1995 AND l_suppkey < 60
      |  GROUP BY 1, 2),
      |cv AS (
      |  SELECT sk, mo, n,
      |    CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
      |      / (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) - 1.0 AS cv2
      |  FROM moments WHERE CAST(s1 AS DOUBLE) > 0)
      |SELECT a.sk, a.mo AS mo1, b.mo AS mo2,
      |  a.cv2 AS cv2_m1, b.cv2 AS cv2_m2
      |FROM cv a JOIN cv b ON a.sk = b.sk AND b.mo = a.mo + 1
      |WHERE a.cv2 > 0.3 AND b.cv2 > 0.3
      |ORDER BY a.sk, a.mo""".stripMargin

  private def sqlQuery(name: String, sql: String,
      tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql))

  val queries: Seq[Query] = Seq(
    sqlQuery("q_ds_grouping_rank", groupingRankSql, "customer"),
    sqlQuery("q_ds_resale_drop", resaleDropSql,
      "lineitem", "part", "supplier"),
    sqlQuery("q_ds_multi_supplier", multiSupplierSql, "lineitem", "orders"),
    sqlQuery("q_ds_variance_chain", varianceChainSql, "lineitem"))
}
