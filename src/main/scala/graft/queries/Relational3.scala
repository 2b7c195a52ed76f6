package graft.queries

import org.apache.spark.sql.functions._

import Catalog.{dsum4, sqls, t}

/** Third relational battery — completes the TPC-H query-shape corpus the
  * reference's batch SQL runtime ships e2e tests for
  * (flink-end-to-end-tests/flink-tpch-test, query dir with 22 .sql files).
  * With these, all 22 shapes are represented: correlated scalar MIN over a
  * derived supplier bridge (Q2), single-table predicate aggregation (Q6),
  * market-share ratio over an 8-table star join (Q8), profit rollup with
  * LIKE-filtered dimension (Q9), value-concentration HAVING against a
  * scalar subquery (Q11), outer-join count distribution (Q13), view +
  * scalar-MAX top supplier (Q15), correlated per-part AVG threshold (Q17),
  * nested IN + HAVING supplier filter (Q20), and the EXISTS / NOT EXISTS
  * double self-join (Q21).
  *
  * The fixtures have no partsupp table and no commit/receipt dates, so
  * Q2/Q11/Q20 derive the part–supplier bridge from `SELECT DISTINCT
  * l_partkey, l_suppkey FROM lineitem`, Q9 prices supply cost as a fixed
  * fraction of p_retailprice, and Q21's "late" predicate uses l_shipdate;
  * join/subquery topology — what the optimizer is actually exercised on —
  * is unchanged.
  *
  * Money sums go through the deterministic scaled formulations
  * ([[Catalog.dsum4]] / `sqls.dsum4`) so Spark's partial-agg order and
  * DuckDB's sequential order produce bit-identical doubles.
  */
object Relational3 {

  // Shared SQL texts (identical on Spark and the DuckDB oracle).

  private val q2Sql =
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM part, ps, supplier, nation, region
      |WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE' AND p_size = 5
      |  AND s_acctbal = (
      |    SELECT MIN(s2.s_acctbal)
      |    FROM ps ps2, supplier s2, nation n2, region r2
      |    WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  private val q11Sql =
    s"""SELECT l_partkey AS ps_partkey,
       |  ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} AS value
       |FROM lineitem, supplier, nation
       |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
       |GROUP BY l_partkey
       |HAVING ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} > (
       |  SELECT 1.5 * ${sqls.dsum4("v")} / COUNT(1) FROM (
       |    SELECT ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} AS v
       |    FROM lineitem, supplier, nation
       |    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
       |    GROUP BY l_partkey))
       |ORDER BY value DESC, ps_partkey""".stripMargin

  private val q13Sql =
    """SELECT c_count, COUNT(1) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  private val q15Sql =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate < TIMESTAMP '1997-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier, revenue
       |WHERE s_suppkey = supplier_no
       |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  private val q17Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
      |  AND l_quantity < (
      |    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  private val q20Sql =
    """SELECT s_name, s_acctbal, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'small%' AND l_shipdate >= TIMESTAMP '1998-01-01'
      |  GROUP BY l_suppkey
      |  HAVING SUM(l_quantity) > 50.0)
      |ORDER BY s_name""".stripMargin

  private val q21Sql =
    """SELECT s_name, COUNT(1) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND n_nationkey = s_nationkey
      |  AND l1.l_shipdate > TIMESTAMP '2000-06-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > TIMESTAMP '2000-06-01')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  val queries: Seq[Query] = Seq(

    // TPC-H Q2 shape: min-cost supplier per part — correlated scalar MIN
    // subquery sharing a CTE with the outer query; Catalyst decorrelates
    // to an aggregate + join on the correlation key.
    Query(
      "q_join_q2",
      (s, d) => {
        Catalog.registerViews(s, d, "part", "supplier", "nation", "region", "lineitem")
        s.sql(Relational3.q2Sql)
      },
      Some(q2Sql)),

    // TPC-H Q6 shape: forecast revenue change — single-table scan with a
    // tight multi-predicate filter, one output row. The whole query is a
    // parquet scan (all three predicates pushed) + partial/final agg.
    Query(
      "q_agg_q6",
      (s, d) => {
        val l = t(s, d, "lineitem")
        l.where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
            && col("l_discount").between(0.05, 0.07)
            && col("l_quantity") < 24.0)
          .agg(dsum4(col("l_extendedprice") * col("l_discount")).as("revenue"))
      },
      Some(s"""SELECT ${sqls.dsum4("l_extendedprice * l_discount")} AS revenue
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              |  AND l_shipdate < TIMESTAMP '1998-01-01'
              |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""".stripMargin),
      bench = true),

    // TPC-H Q8 shape: one nation's market share inside a region by year —
    // 8-table star join; lineitem⋈orders⋈customer shuffle on the fact
    // keys, every dimension broadcast.
    Query(
      "q_join_q8",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val p = t(s, d, "part").where(col("p_type") === "ECONOMY")
        val sup = t(s, d, "supplier")
        val n1 = t(s, d, "nation")
        val n2 = t(s, d, "nation")
          .select(col("n_nationkey").as("n2_nationkey"), col("n_name").as("nation"))
        val r = t(s, d, "region").where(col("r_name") === "EUROPE")
        val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .join(broadcast(n2), col("s_nationkey") === col("n2_nationkey"))
          .select(year(col("o_orderdate")).as("o_year"), vol.as("volume"), col("nation"))
          .groupBy(col("o_year"))
          .agg((dsum4(when(col("nation") === "NATION_13", col("volume"))
              .otherwise(lit(0.0)))
            / dsum4(col("volume"))).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some(s"""SELECT o_year,
              |  ${sqls.dsum4("CASE WHEN nation = 'NATION_13' THEN volume ELSE 0.0 END")}
              |  / ${sqls.dsum4("volume")} AS mkt_share
              |FROM (
              |  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
              |    l_extendedprice * (1.0 - l_discount) AS volume,
              |    n2.n_name AS nation
              |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
              |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
              |    AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
              |    AND p_type = 'ECONOMY') all_nations
              |GROUP BY o_year
              |ORDER BY o_year""".stripMargin)),

    // TPC-H Q9 shape: profit by supplier nation and year; supply cost
    // modeled as 1% of p_retailprice (no partsupp fixture). One fact
    // shuffle (lineitem⋈orders), dimensions broadcast.
    Query(
      "q_join_q9",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val p = t(s, d, "part").where(col("p_name").contains("widget"))
        val sup = t(s, d, "supplier")
        val n = t(s, d, "nation")
        val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.01) * col("p_retailprice") * col("l_quantity")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
            amount.as("amount"))
          .groupBy(col("nation"), col("o_year"))
          .agg(dsum4(col("amount")).as("sum_profit"))
          .orderBy(col("nation"), desc("o_year"))
      },
      Some(s"""SELECT nation, o_year, ${sqls.dsum4("amount")} AS sum_profit
              |FROM (
              |  SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
              |    l_extendedprice * (1.0 - l_discount) - 0.01 * p_retailprice * l_quantity AS amount
              |  FROM part, supplier, lineitem, orders, nation
              |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
              |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
              |    AND p_name LIKE '%widget%') profit
              |GROUP BY nation, o_year
              |ORDER BY nation, o_year DESC""".stripMargin),
      bench = true),

    // TPC-H Q11 shape: value concentration — grouped sums filtered by a
    // scalar subquery recomputing the same aggregate's average (the
    // threshold uses the exact decimal sum so both engines compare against
    // bit-identical doubles).
    Query(
      "q_agg_q11",
      (s, d) => {
        Catalog.registerViews(s, d, "lineitem", "supplier", "nation")
        s.sql(Relational3.q11Sql)
      },
      Some(q11Sql)),

    // TPC-H Q13 shape: customer order-count distribution — left outer
    // join with an ON-clause filter (kept on the join, not pushed to a
    // WHERE), then a two-level aggregation.
    Query(
      "q_join_q13",
      (s, d) => {
        Catalog.registerViews(s, d, "customer", "orders")
        s.sql(Relational3.q13Sql)
      },
      Some(q13Sql)),

    // TPC-H Q15 shape: top supplier by quarterly revenue — CTE reused by
    // the outer join and a scalar MAX subquery; revenue equality is exact
    // because both sides are the deterministic 4dp sum.
    Query(
      "q_join_q15",
      (s, d) => {
        Catalog.registerViews(s, d, "lineitem", "supplier")
        s.sql(Relational3.q15Sql)
      },
      Some(q15Sql)),

    // TPC-H Q17 shape: small-quantity revenue vs 20% of the per-part
    // average quantity — correlated scalar AVG (exact: quantities are
    // integral doubles, so the average is an exact sum / count in both
    // engines).
    Query(
      "q_agg_q17",
      (s, d) => {
        Catalog.registerViews(s, d, "lineitem", "part")
        s.sql(Relational3.q17Sql)
      },
      Some(q17Sql)),

    // TPC-H Q20 shape: suppliers with heavy shipments of matching parts —
    // IN over a grouped HAVING subquery (semi join after Catalyst's
    // rewrite).
    Query(
      "q_join_q20",
      (s, d) => {
        Catalog.registerViews(s, d, "supplier", "nation", "lineitem", "part")
        s.sql(Relational3.q20Sql)
      },
      Some(q20Sql)),

    // TPC-H Q21 shape: suppliers who kept multi-supplier orders waiting —
    // correlated EXISTS (another supplier on the order) plus NOT EXISTS
    // (no other late supplier): semi + anti self-joins on lineitem.
    Query(
      "q_join_q21",
      (s, d) => {
        Catalog.registerViews(s, d, "supplier", "lineitem", "orders", "nation")
        s.sql(Relational3.q21Sql)
      },
      Some(q21Sql)))

}
