package graft.queries

/** Twelfth TPC-DS-shape battery (reference corpus:
  * flink-end-to-end-tests/flink-tpcds-test, runner
  * TpcdsTestProgram.java:49) — the catalog's last uncited fact-chain
  * idiom: Q25/Q29's THREE-legged lifecycle join, where the same
  * (customer, item) pair is followed through a purchase that was
  * returned and a strictly-later re-purchase. The distinctive planner
  * work: two instances of the fact table and two instances of the
  * orders dim in ONE query, chained on a composite (custkey, partkey)
  * key with a non-equi temporal predicate (o2.date > o1.date) that must
  * stay residual on the equi join, then a dim-decorated two-phase agg.
  * One ANSI SQL text runs verbatim on BOTH Spark and the DuckDB oracle.
  *
  * Determinism: quantities pass through exact DECIMAL(18,2) sums
  * (Catalog.dsum discipline) before the final DOUBLE cast; counts are
  * integer-exact.
  */
object TpcDsShapes12 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // Q25/Q29 shape: returned purchase (l1, flagged 'R') re-bought later
  // by the same customer (l2 via o2, same partkey, later orderdate,
  // kept this time). At scale both fact legs shuffle on their join
  // keys and the date predicate stays a post-join residual; the
  // customer/part dims are broadcast. Chains multiply per re-purchase
  // (Q29 semantics — each qualifying re-buy is a row of evidence).
  private val returnRebuySql =
    """SELECT c_mktsegment, p_type, COUNT(1) AS n_chains,
      |  CAST(SUM(CAST(l1.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    AS ret_qty,
      |  CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    AS rebuy_qty
      |FROM lineitem l1
      |JOIN orders o1 ON o1.o_orderkey = l1.l_orderkey
      |JOIN lineitem l2 ON l2.l_partkey = l1.l_partkey
      |JOIN orders o2 ON o2.o_orderkey = l2.l_orderkey
      |             AND o2.o_custkey = o1.o_custkey
      |             AND o2.o_orderdate > o1.o_orderdate
      |JOIN customer ON c_custkey = o1.o_custkey
      |JOIN part ON p_partkey = l1.l_partkey
      |WHERE l1.l_returnflag = 'R' AND l2.l_returnflag <> 'R'
      |GROUP BY c_mktsegment, p_type
      |ORDER BY c_mktsegment, p_type""".stripMargin

  private def sqlQuery(name: String, sql: String,
      tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql))

  val queries: Seq[Query] = Seq(
    sqlQuery("q_ds_return_rebuy", returnRebuySql,
      "lineitem", "orders", "customer", "part"))
}
