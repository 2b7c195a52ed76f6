package graft.queries

/** Second TPC-DS-shape battery — the distinctive optimizer idioms of the
  * reference's TPC-DS e2e corpus (flink-end-to-end-tests/flink-tpcds-test,
  * runner TpcdsTestProgram.java:49) not yet covered by Relational1-3 /
  * TpcDsShapes: a correlated per-group average threshold (Q1), INTERSECT
  * of multi-channel actor sets (Q38/Q87), an EXCEPT chain over composite
  * keys (Q87), correlated EXISTS under a disjunction (Q10), repeated-CTE
  * period-over-period self-comparison (Q2/Q59), count-HAVING-BETWEEN
  * cohorts (Q34), and a frequent-items × big-spenders double semi-join
  * (Q23). Fixtures are the TPC-H-ish tables; each query is ONE ANSI SQL
  * text executed verbatim by BOTH Spark (through Catalyst's decorrelation
  * / set-op planning) and the DuckDB oracle, so the check pins the full
  * SQL surface, not a hand-translated twin.
  *
  * Determinism: every double aggregate goes through the exact
  * DECIMAL-cast formulation (see Catalog.dsum) inline in the shared text,
  * so partial-agg order can't flip a threshold comparison at ulp level.
  */
object TpcDsShapes2 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // TPC-DS Q1 shape: actors whose measure exceeds 1.2× the average of
  // their group — correlated scalar subquery, decorrelated by Catalyst
  // into a join against the per-group aggregate.
  private val corrAvgSql =
    """WITH ctr AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM customer JOIN orders ON o_custkey = c_custkey
      |  GROUP BY c_custkey, c_nationkey)
      |SELECT c_custkey, total FROM ctr ctr1
      |WHERE total > (
      |  SELECT CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) * 1.2
      |  FROM ctr ctr2 WHERE ctr2.c_nationkey = ctr1.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  // TPC-DS Q38 shape: customers active in ALL THREE channels —
  // INTERSECT chain, then a dimension join + rollup count.
  private val intersectChannelsSql =
    """WITH hot AS (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
      |  INTERSECT
      |  SELECT o_custkey FROM orders
      |  WHERE EXTRACT(YEAR FROM o_orderdate) <= 1995)
      |SELECT c_mktsegment, COUNT(1) AS n
      |FROM customer JOIN hot ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // TPC-DS Q87 shape: EXCEPT chain over a composite (actor, period) key —
  // customer-years with orders but never an urgent/high or >300k one.
  private val exceptChannelsSql =
    """WITH quiet AS (
      |  SELECT o_custkey, EXTRACT(YEAR FROM o_orderdate) AS yr FROM orders
      |  EXCEPT
      |  SELECT o_custkey, EXTRACT(YEAR FROM o_orderdate) FROM orders
      |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  EXCEPT
      |  SELECT o_custkey, EXTRACT(YEAR FROM o_orderdate) FROM orders
      |  WHERE o_totalprice > 300000.0)
      |SELECT yr, COUNT(1) AS n FROM quiet
      |GROUP BY yr ORDER BY yr""".stripMargin

  // TPC-DS Q10 shape: correlated EXISTS under a disjunction — customers
  // with an urgent order AND (a big order OR a returned item). The OR of
  // two correlated EXISTS is the decorrelation case Q10 is famous for.
  private val existsUnionSql =
    """SELECT c_mktsegment, COUNT(1) AS cnt
      |FROM customer
      |WHERE EXISTS (
      |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderpriority = '1-URGENT')
      |  AND (EXISTS (
      |      SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |      AND o_totalprice > 150000.0)
      |    OR EXISTS (
      |      SELECT 1 FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |      WHERE o_custkey = c_custkey AND l_returnflag = 'R'))
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // TPC-DS Q2/Q59 shape: one CTE consumed twice, self-joined on the
  // period key to compare consecutive years — the repeated-CTE
  // period-over-period idiom.
  private val yoySelfJoinSql =
    """WITH rev AS (
      |  SELECT c_nationkey AS nk, EXTRACT(YEAR FROM o_orderdate) AS yr,
      |    EXTRACT(MONTH FROM o_orderdate) AS mon,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2, 3)
      |SELECT a.nk, a.mon, a.rev AS rev1, b.rev AS rev2,
      |  a.rev / b.rev AS yoy
      |FROM rev a JOIN rev b ON a.nk = b.nk AND a.mon = b.mon
      |WHERE a.yr = 1995 AND b.yr = 1996
      |ORDER BY a.nk, a.mon""".stripMargin

  // TPC-DS Q34 shape: count-HAVING-BETWEEN cohort — orders whose item
  // count falls in a band, surfaced with the customer dimension.
  private val cohortHavingSql =
    """WITH cnt AS (
      |  SELECT o_orderkey, o_custkey, COUNT(1) AS n_items
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  GROUP BY o_orderkey, o_custkey
      |  HAVING COUNT(1) BETWEEN 6 AND 7)
      |SELECT c_name, o_orderkey, n_items
      |FROM cnt JOIN customer ON o_custkey = c_custkey
      |ORDER BY c_name, o_orderkey""".stripMargin

  // TPC-DS Q23 shape: frequent items × big spenders — two independent
  // HAVING-filtered CTEs funneled through IN-subqueries (→ semi-joins)
  // into one fact aggregation.
  private val frequentItemsSql =
    """WITH freq AS (
      |  SELECT l_partkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY l_partkey, EXTRACT(YEAR FROM o_orderdate)
      |  HAVING COUNT(1) > 3),
      |big_cust AS (
      |  SELECT o_custkey FROM orders GROUP BY o_custkey
      |  HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    > 500000.0)
      |SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_partkey IN (SELECT l_partkey FROM freq)
      |  AND o_custkey IN (SELECT o_custkey FROM big_cust)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private def sqlQuery(name: String, sql: String,
      tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql))

  val queries: Seq[Query] = Seq(
    sqlQuery("q_ds_corr_avg", corrAvgSql, "customer", "orders"),
    sqlQuery("q_ds_intersect_channels", intersectChannelsSql,
      "customer", "orders"),
    sqlQuery("q_ds_except_channels", exceptChannelsSql, "orders"),
    sqlQuery("q_ds_exists_union", existsUnionSql,
      "customer", "orders", "lineitem"),
    sqlQuery("q_ds_yoy_self_join", yoySelfJoinSql, "customer", "orders"),
    sqlQuery("q_ds_cohort_having", cohortHavingSql,
      "customer", "orders", "lineitem"),
    sqlQuery("q_ds_frequent_items", frequentItemsSql,
      "orders", "lineitem"))
}
