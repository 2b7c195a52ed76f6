package graft.queries

/** Eleventh TPC-DS-shape battery (reference corpus:
  * flink-end-to-end-tests/flink-tpcds-test, runner
  * TpcdsTestProgram.java:49) — idioms still uncovered after
  * TpcDsShapes..TpcDsShapes10: the shipping-lag BUCKET MATRIX (Q62/Q99's
  * CASE-band counts per group-pair — many disjoint count columns off one
  * scan, where Q93's late_ship tests a single band predicate), the
  * ratio-to-report window share (Q98/Q12/Q20's revenue share within a
  * class via a partition-total window sum), the attribute-alternation
  * EXISTS (Q41's self-join on product name whose inner predicate is an
  * OR forest of conjunctive attribute bands), and membership
  * DISJUNCTION (Q45's `literal-set OR IN-subquery` filter, which cannot
  * decorrelate to a plain semi join — the planner must keep both
  * branches and union/existence-join them). One ANSI SQL text per query
  * runs verbatim on BOTH Spark and the DuckDB oracle.
  *
  * Determinism: double aggregation goes through exact DECIMAL casts
  * (Catalog.dsum discipline); the window share divides two
  * decimal-exact values as doubles and rounds to 6.
  */
object TpcDsShapes11 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // Q62/Q99 shape: order-to-ship latency bucketed into disjoint bands,
  // counted per (priority, returnflag) — five CASE-SUM count columns
  // over one fact scan + one dim join; the matrix report every shipping
  // dashboard runs. One two-phase agg, counts are integer-exact.
  private val shipLagMatrixSql = {
    // CAST ... AS BIGINT is the house discipline for shared-SQL
    // SUM(CASE...): DuckDB sums integers into HUGEINT, Spark into
    // BIGINT, and the driver hash is type-sensitive.
    def band(cond: String, as: String) =
      s"  CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS $as"
    s"""SELECT o_orderpriority, l_returnflag,
       |${band("l_shipdate <= o_orderdate + INTERVAL 30 DAY", "d30")},
       |${band("l_shipdate > o_orderdate + INTERVAL 30 DAY AND l_shipdate <= o_orderdate + INTERVAL 60 DAY", "d60")},
       |${band("l_shipdate > o_orderdate + INTERVAL 60 DAY AND l_shipdate <= o_orderdate + INTERVAL 90 DAY", "d90")},
       |${band("l_shipdate > o_orderdate + INTERVAL 90 DAY AND l_shipdate <= o_orderdate + INTERVAL 120 DAY", "d120")},
       |${band("l_shipdate > o_orderdate + INTERVAL 120 DAY", "dmore")}
       |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       |GROUP BY o_orderpriority, l_returnflag
       |ORDER BY o_orderpriority, l_returnflag""".stripMargin
  }

  // Q98/Q12/Q20 shape: ratio-to-report — each item's revenue share of
  // its class total, the partition-total window over an aggregate. The
  // window SUM runs over the DECIMAL aggregate (exact, order-
  // independent), so the share is identical on both engines; a double
  // window sum would drift at the ulp with summation order.
  private val revenueShareSql =
    """WITH itemrev AS (
      |  SELECT p_type AS class, l_partkey AS pk,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_size <= 10
      |  GROUP BY p_type, l_partkey)
      |SELECT class, pk, CAST(r AS DOUBLE) AS itemrev,
      |  ROUND(CAST(r AS DOUBLE) * 100.0
      |    / CAST(SUM(r) OVER (PARTITION BY class) AS DOUBLE), 6) AS share
      |FROM itemrev
      |ORDER BY class, pk""".stripMargin

  // Q41 shape: DISTINCT product names admitted by an EXISTS self-join
  // on the name whose inner predicate is an OR forest of conjunctive
  // attribute bands (brand-set × size-band × price-band alternations).
  // Tests CNF/DNF handling: the equi key (p_name) must still extract
  // into the join while the alternation stays a residual.
  private val attrAlternationSql =
    """SELECT DISTINCT p1.p_name
      |FROM part p1
      |WHERE p1.p_size BETWEEN 1 AND 25
      |  AND EXISTS (
      |    SELECT 1 FROM part p2
      |    WHERE p2.p_name = p1.p_name
      |      AND ((p2.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      |            AND p2.p_size BETWEEN 1 AND 10
      |            AND p2.p_retailprice < 1200.0)
      |        OR (p2.p_brand IN ('Brand#4', 'Brand#5', 'Brand#6')
      |            AND p2.p_size BETWEEN 5 AND 20
      |            AND p2.p_retailprice >= 800.0)
      |        OR (p2.p_type IN ('PROMO', 'ECONOMY')
      |            AND p2.p_size BETWEEN 15 AND 40)))
      |ORDER BY p_name""".stripMargin

  // Q45 shape: a filter that ORs a literal-set membership with an
  // IN-subquery membership — the disjunction blocks the plain
  // semi-join rewrite, so the planner must evaluate the subquery as an
  // existence join and keep both branches of the OR.
  private val orMembershipSql =
    """SELECT c_mktsegment, COUNT(1) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM customer
      |WHERE c_nationkey IN (1, 3, 5)
      |   OR c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_totalprice > 250000.0)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  private def sqlQuery(name: String, sql: String,
      tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql))

  val queries: Seq[Query] = Seq(
    sqlQuery("q_ds_ship_lag_matrix", shipLagMatrixSql,
      "lineitem", "orders"),
    sqlQuery("q_ds_revenue_share", revenueShareSql, "lineitem", "part"),
    sqlQuery("q_ds_attr_alternation", attrAlternationSql, "part"),
    sqlQuery("q_ds_or_membership", orMembershipSql,
      "customer", "orders"))
}
