package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Catalog.{t, dsum, dsum4, sqls}

/** Join + calc + sort/limit/Top-N coverage (SURVEY.md §2.2, §2.3, §2.6).
  *
  * All six join types of the reference
  * (flink-table-runtime-blink/.../join/FlinkJoinType.java:22-28) expressed
  * through Catalyst's JoinSelection — broadcast/shuffled-hash/sort-merge
  * picked by the planner + AQE, replacing the reference's
  * BatchPhysical{HashJoin,SortMergeJoin,NestedLoopJoin}Rule.scala.
  *
  * Scale notes: dimension sides (region/nation/customer-filtered) are
  * broadcast-eligible; fact-fact joins shuffle on the join key only once;
  * every query carries a selective filter that Catalyst pushes into the
  * parquet scan.
  */
object Relational {

  val queries: Seq[Query] = Seq(

    // Calc = fused project+filter (reference CommonExecCalc.java:52).
    Query(
      "q_calc",
      (s, d) => {
        t(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("2001-06-01").cast("timestamp")
            && col("l_discount") > 0.05)
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("disc_price"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice * (1.0 - l_discount) AS disc_price
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '2001-06-01' AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Multi-way inner join + agg + Top-N (TPC-H Q3 shape) — headline bench.
    Query(
      "q_join_inner",
      (s, d) => {
        val c = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders")
          .where(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
        val l = t(s, d, "lineitem")
          .where(col("l_shipdate") > lit("2000-01-01").cast("timestamp"))
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(desc("revenue"), col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
              |  ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '2000-01-01'
              |  AND l_shipdate > TIMESTAMP '2000-01-01'
              |GROUP BY 1, 2, 3
              |ORDER BY revenue DESC, l_orderkey
              |LIMIT 10""".stripMargin),
      bench = true),

    // LEFT OUTER with ON-clause predicate (null-producing side filtered).
    Query(
      "q_join_left",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").where(col("o_totalprice") > 400000.0)
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_big_orders"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders
             |FROM customer LEFT JOIN orders
             |  ON c_custkey = o_custkey AND o_totalprice > 400000.0
             |GROUP BY c_custkey
             |ORDER BY c_custkey""".stripMargin)),

    // RIGHT OUTER (nation ⟕ supplier reversed).
    Query(
      "q_join_right",
      (s, d) => {
        val sup = t(s, d, "supplier").where(col("s_acctbal") > 5000.0)
        val n = t(s, d, "nation")
        sup.join(n, col("s_nationkey") === col("n_nationkey"), "right")
          .groupBy(col("n_nationkey"), col("n_name"))
          .agg(count(col("s_suppkey")).as("n_supp"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_supp
             |FROM supplier RIGHT JOIN nation
             |  ON s_nationkey = n_nationkey AND s_acctbal > 5000.0
             |GROUP BY 1, 2
             |ORDER BY n_nationkey""".stripMargin)),

    // FULL OUTER join of two aggregates.
    Query(
      "q_join_full",
      (s, d) => {
        val c = t(s, d, "customer").where(col("c_acctbal") > 9000.0)
          .groupBy(col("c_nationkey").as("nk_c"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = t(s, d, "supplier").where(col("s_acctbal") > 9000.0)
          .groupBy(col("s_nationkey").as("nk_s"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sup, col("nk_c") === col("nk_s"), "full")
          .select(coalesce(col("nk_c"), col("nk_s")).as("nk"),
            col("n_cust"), col("n_supp"))
          .orderBy(col("nk"))
      },
      Some("""WITH c AS (SELECT c_nationkey AS nk_c, COUNT(1) AS n_cust
             |           FROM customer WHERE c_acctbal > 9000.0 GROUP BY 1),
             |     s AS (SELECT s_nationkey AS nk_s, COUNT(1) AS n_supp
             |           FROM supplier WHERE s_acctbal > 9000.0 GROUP BY 1)
             |SELECT COALESCE(nk_c, nk_s) AS nk, n_cust, n_supp
             |FROM c FULL OUTER JOIN s ON nk_c = nk_s
             |ORDER BY nk""".stripMargin)),

    // SEMI join (EXISTS) — reference StreamingSemiAntiJoinOperator.java:34.
    Query(
      "q_join_semi",
      (s, d) => {
        val o = t(s, d, "orders").where(col("o_totalprice") > 450000.0)
        t(s, d, "customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // ANTI join (NOT EXISTS).
    Query(
      "q_join_anti",
      (s, d) => {
        val o = t(s, d, "orders").where(col("o_totalprice") > 400000.0)
        t(s, d, "customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // CROSS join (reference BatchExecNestedLoopJoin.java:44) — small dims.
    Query(
      "q_join_cross",
      (s, d) =>
        t(s, d, "region").crossJoin(t(s, d, "nation"))
          .select(col("r_name"), col("n_name"))
          .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
             |ORDER BY r_name, n_name""".stripMargin)),

    // Theta/non-equi join (compiled JoinCondition in the reference) via
    // the banded range-join operator: an equi-join on width buckets
    // instead of a BroadcastNestedLoopJoin — O(n+m) shuffle, not O(n·m)
    // compare; identical result set (OpsSpec proves equivalence).
    Query(
      "q_join_theta",
      (s, d) => {
        import graft.operators.Ops._
        val sup = t(s, d, "supplier")
        val c = t(s, d, "customer")
        sup.bandedRangeJoin(c, col("s_acctbal"), col("c_acctbal"), 20.0)
          .select(col("s_suppkey"), col("c_custkey"))
          .orderBy(col("s_suppkey"), col("c_custkey"))
      },
      Some("""SELECT s_suppkey, c_custkey FROM supplier JOIN customer
             |  ON c_acctbal BETWEEN s_acctbal - 20.0 AND s_acctbal + 20.0
             |ORDER BY s_suppkey, c_custkey""".stripMargin)),

    // Scalar subquery + IN subquery (reference FlinkSubQueryRemoveRule).
    Query(
      "q_subquery",
      (s, d) => {
        Catalog.registerViews(s, d, "orders", "customer")
        s.sql("""SELECT o_orderkey, o_totalprice
                |FROM orders
                |WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
                |  AND o_custkey IN (SELECT c_custkey FROM customer
                |                    WHERE c_mktsegment = 'MACHINERY')
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice
             |FROM orders
             |WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
             |  AND o_custkey IN (SELECT c_custkey FROM customer
             |                    WHERE c_mktsegment = 'MACHINERY')
             |ORDER BY o_orderkey""".stripMargin)),

    // TPC-H Q10 shape: returned-items revenue per customer, top 20 —
    // fact-fact shuffle join + broadcast nation + agg + TakeOrdered.
    Query(
      "q_join_q10",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
          .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        val l = t(s, d, "lineitem").where(col("l_returnflag") === "R")
        val n = t(s, d, "nation")
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(desc("revenue"), col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name,
              |  ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |JOIN nation ON c_nationkey = n_nationkey
              |WHERE o_orderdate >= TIMESTAMP '2000-01-01'
              |  AND l_returnflag = 'R'
              |GROUP BY 1, 2, 3
              |ORDER BY revenue DESC, c_custkey
              |LIMIT 20""".stripMargin),
      bench = true),

    // TPC-H Q18 shape: customers with any large order (sum qty > T) —
    // agg-derived semi join back onto the fact.
    Query(
      "q_join_q18",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val big = l.groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as("sum_qty"))
          .where(col("sum_qty") > 150.0)
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        o.join(big, col("o_orderkey") === big("l_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
          .limit(50)
      },
      Some(s"""SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
              |FROM orders
              |JOIN (SELECT l_orderkey, ${sqls.dsum("l_quantity")} AS sum_qty
              |      FROM lineitem GROUP BY l_orderkey
              |      HAVING ${sqls.dsum("l_quantity")} > 150.0) big
              |  ON o_orderkey = big.l_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |ORDER BY o_totalprice DESC, o_orderkey
              |LIMIT 50""".stripMargin)),

    // TPC-H Q7 shape: shipping volume between two nations by year —
    // the same dimension joined twice under different aliases.
    Query(
      "q_join_q7",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val sup = t(s, d, "supplier")
        val n1 = t(s, d, "nation")
          .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
        val n2 = t(s, d, "nation")
          .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("nk1"))
          .join(broadcast(n2), col("c_nationkey") === col("nk2"))
          .where((col("supp_nation") < col("cust_nation")))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("volume"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |  YEAR(l_shipdate) AS l_year,
              |  ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} AS volume
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |WHERE n1.n_name < n2.n_name
              |GROUP BY 1, 2, 3
              |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // Sort + limit → TakeOrderedAndProject (reference SortLimitOperator).
    Query(
      "q_sort_limit",
      (s, d) =>
        t(s, d, "orders")
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .limit(20),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // Top-N per group — ROW_NUMBER()<=N pattern the reference's
    // StreamExecRank.java:69 / AppendOnlyTopNFunction.java:48 implements.
    Query(
      "q_topn",
      (s, d) => {
        import graft.operators.Ops._
        t(s, d, "orders")
          .topN(3, Seq(col("o_custkey")),
            Seq(desc("o_totalprice"), col("o_orderkey")))
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) x
             |WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin),
      bench = true))
}
