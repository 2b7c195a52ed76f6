package graft.queries

/** Sixth TPC-DS-shape battery (reference corpus:
  * flink-end-to-end-tests/flink-tpcds-test) — three more distinctive
  * idioms: returns-adjusted re-aggregation through a COALESCE left join
  * (Q93's net-quantity computation), the multi-statistic cohort report
  * gated by EXISTS (Q35's avg/max/sum stack per demographic), and the
  * NULL-key channel union (Q76's counts of fact rows with a missing
  * dimension key, tagged per channel). One ANSI SQL text per query, run
  * verbatim on BOTH Spark and the DuckDB oracle.
  */
object TpcDsShapes6 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // Q93 shape: net quantity after returns — a synthetic "returns" side
  // (high-tax lines stand in for the returns table) left-joined back to
  // the fact, COALESCE picking adjusted-or-original, then re-aggregated.
  // The idiom: aggregate AFTER a null-producing join, not before.
  private val returnsAdjustSql =
    """WITH returns AS (
      |  SELECT l_orderkey AS r_ok, l_linenumber AS r_ln,
      |    l_quantity * 0.5 AS returned_qty
      |  FROM lineitem WHERE l_tax > 0.05)
      |SELECT l_suppkey AS sk,
      |  CAST(SUM(CAST(COALESCE(l_quantity - returned_qty, l_quantity)
      |    AS DECIMAL(18,2))) AS DOUBLE) AS net_qty
      |FROM lineitem LEFT JOIN returns
      |  ON l_orderkey = r_ok AND l_linenumber = r_ln
      |GROUP BY l_suppkey
      |ORDER BY sk""".stripMargin

  // Q35 shape: multi-statistic cohort report — customers gated by an
  // EXISTS, then a stacked avg/max/min/sum profile per nation cohort.
  private val cohortStatsSql =
    """SELECT c_nationkey AS nk, COUNT(1) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
      |  CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal,
      |  CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_bal,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1)
      |    AS avg_bal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY nk""".stripMargin

  // Q76 shape: NULL-key channel union — per channel, count fact rows
  // whose dimension key is "missing" (synthesized per channel from a
  // deterministic predicate), UNION ALL tagged, then one aggregation
  // over (channel, year).
  private val nullChannelUnionSql =
    """WITH u AS (
      |  SELECT 'web' AS channel, EXTRACT(YEAR FROM o_orderdate) AS yr,
      |    o_totalprice AS price
      |  FROM orders WHERE o_custkey % 7 = 0
      |  UNION ALL
      |  SELECT 'store' AS channel, EXTRACT(YEAR FROM o_orderdate) AS yr,
      |    o_totalprice AS price
      |  FROM orders WHERE o_custkey % 11 = 0)
      |SELECT channel, CAST(yr AS BIGINT) AS yr, COUNT(1) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM u GROUP BY channel, yr
      |ORDER BY channel, yr""".stripMargin

  private def sqlQuery(name: String, sql: String,
      tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql))

  val queries: Seq[Query] = Seq(
    sqlQuery("q_ds_returns_adjust", returnsAdjustSql, "lineitem"),
    sqlQuery("q_ds_cohort_stats", cohortStatsSql, "customer", "orders"),
    sqlQuery("q_ds_null_channel_union", nullChannelUnionSql, "orders"))
}
