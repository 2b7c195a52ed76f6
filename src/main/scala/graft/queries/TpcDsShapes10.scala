package graft.queries

/** Tenth TPC-DS-shape battery (reference corpus:
  * flink-end-to-end-tests/flink-tpcds-test, runner
  * TpcdsTestProgram.java:49) — optimizer idioms still uncovered after
  * TpcDsShapes..TpcDsShapes9: a CASE whose branches are independent
  * scalar aggregate subqueries (Q9's bucket report), a per-trip
  * aggregate joined back to the customer with a correlated EXISTS
  * carrying a dimension INEQUALITY (Q46/Q68's "bought outside their own
  * city" trips), the two-level "items below their group's average
  * revenue" aggregate-join (Q65), and a join whose residual predicate
  * is a DISJUNCTION of conjunctive band constraints across two dims
  * (Q13). One ANSI SQL text per query runs verbatim on BOTH Spark and
  * the DuckDB oracle.
  *
  * Determinism: double aggregation goes through exact DECIMAL casts
  * (Catalog.dsum discipline) so summation order can't flip values at
  * ulp level on either engine; averages are exact decimal sums divided
  * by counts.
  */
object TpcDsShapes10 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // Q9 shape: CASE WHEN (scalar COUNT subquery) > bound THEN (scalar
  // AVG subquery) ELSE (scalar AVG subquery) END, repeated per quantity
  // bucket — six independent single-row aggregate subtrees feeding one
  // projected row. Catalyst plans each as its own scalar subquery and
  // joins 1-row results; nothing shuffles more than the scans.
  private val caseScalarSql = {
    def bucket(lo: Int, hi: Int, bound: Int, as: String) =
      s"""  CASE WHEN (SELECT COUNT(1) FROM lineitem
         |        WHERE l_quantity BETWEEN $lo AND $hi) > $bound
         |    THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
         |            AS DOUBLE) / COUNT(1) FROM lineitem
         |          WHERE l_quantity BETWEEN $lo AND $hi)
         |    ELSE (SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,4)))
         |            AS DOUBLE) / COUNT(1) FROM lineitem
         |          WHERE l_quantity BETWEEN $lo AND $hi)
         |  END AS $as""".stripMargin
    s"""SELECT
       |${bucket(1, 10, 5000, "b1")},
       |${bucket(11, 20, 5000, "b2")},
       |${bucket(21, 30, 500000, "b3")},
       |${bucket(31, 40, 500000, "b4")},
       |${bucket(41, 50, 5000, "b5")}
       |FROM region WHERE r_regionkey = 0""".stripMargin
  }

  // Q46/Q68 shape: per-order "trip" aggregate (one row per order),
  // joined back to the customer dim for display, filtered by a
  // correlated EXISTS whose inner join carries an INEQUALITY against
  // the outer dim (any line of the order shipped by a supplier from a
  // nation other than the customer's own). Decorrelation must thread
  // c_nationkey through the semi join on o_orderkey.
  private val tripMismatchSql =
    """WITH trip AS (
      |  SELECT o_orderkey AS ok, o_custkey AS ck,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS amt,
      |    COUNT(1) AS n_items
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  GROUP BY o_orderkey, o_custkey)
      |SELECT c_name, ok, n_items, amt
      |FROM trip JOIN customer ON c_custkey = ck
      |WHERE n_items >= 6
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              JOIN supplier s ON s.s_suppkey = l2.l_suppkey
      |              WHERE l2.l_orderkey = ok
      |                AND s.s_nationkey <> c_nationkey)
      |ORDER BY c_name, ok""".stripMargin

  // Q65 shape: items whose revenue within a "store" (supplier nation)
  // is at most half that store's average item revenue — per-(store,
  // item) aggregate, per-store average of those aggregates, join and
  // band filter. Revenues are exact decimal sums cast to DOUBLE, so the
  // 0.5× threshold compares identical values on both engines. The rev
  // CTE is referenced twice; its two planned subtrees are canonically
  // identical, so AQE materializes one shuffle stage and feeds the
  // second consumer a ReusedExchange — the fact scan runs ONCE at
  // runtime (pinned in PlanSpec).
  private val belowAvgItemsSql =
    """WITH rev AS (
      |  SELECT s_nationkey AS nk, l_partkey AS pk,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS r
      |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |  GROUP BY 1, 2),
      |avgrev AS (
      |  SELECT nk,
      |    CAST(SUM(CAST(r AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) AS ar
      |  FROM rev GROUP BY nk)
      |SELECT rev.nk AS nk, pk, r, ar
      |FROM rev JOIN avgrev ON rev.nk = avgrev.nk
      |WHERE r <= 0.5 * ar
      |ORDER BY nk, pk""".stripMargin

  // Q13 shape: a join whose residual is a DISJUNCTION of conjunctive
  // band constraints spanning both sides (segment × price-band OR'd
  // three ways) — the equi key still extracts, the OR stays a residual
  // filter, and the aggregate above it is a plain two-phase agg.
  private val disjunctiveBandsSql =
    """SELECT o_orderpriority,
      |  COUNT(1) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total
      |FROM orders JOIN customer ON c_custkey = o_custkey
      |WHERE (c_mktsegment = 'BUILDING'
      |        AND o_totalprice BETWEEN 1000.0 AND 100000.0)
      |   OR (c_mktsegment = 'AUTOMOBILE'
      |        AND o_totalprice BETWEEN 50000.0 AND 200000.0)
      |   OR (c_mktsegment = 'MACHINERY'
      |        AND o_totalprice > 150000.0)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  private def sqlQuery(name: String, sql: String,
      tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql))

  val queries: Seq[Query] = Seq(
    sqlQuery("q_ds_case_scalar", caseScalarSql, "lineitem", "region"),
    sqlQuery("q_ds_trip_mismatch", tripMismatchSql,
      "orders", "lineitem", "customer", "supplier"),
    sqlQuery("q_ds_below_avg_items", belowAvgItemsSql,
      "lineitem", "supplier"),
    sqlQuery("q_ds_disjunctive_bands", disjunctiveBandsSql,
      "orders", "customer"))
}
