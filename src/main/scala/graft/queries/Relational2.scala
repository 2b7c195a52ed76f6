package graft.queries

import org.apache.spark.sql.functions._

import Catalog.{dsum, dsum4, sqls, t}

/** Second relational battery — the TPC-H query shapes the reference's
  * batch SQL runtime is exercised with beyond the round-1 set (its TPC-H
  * e2e corpus, flink-end-to-end-tests/flink-tpch-test): correlated
  * EXISTS / NOT EXISTS decorrelation, a star-schema cycle join (Q5),
  * conditional CASE aggregation (Q12/Q14), NOT IN + count-distinct (Q16),
  * and disjunctive multi-column join predicates (Q19). All run through
  * Catalyst's subquery rewrite / join selection — the point is that the
  * engine expresses them declaratively and the optimizer picks the
  * distributed plan (semi/anti joins, broadcasts, partial aggs).
  */
object Relational2 {

  val queries: Seq[Query] = Seq(

    // TPC-H Q4 shape: priority count of orders with at least one line
    // shipped after the order date — correlated EXISTS → left-semi join
    // (reference FlinkSubQueryRemoveRule.FILTER → semi join).
    Query(
      "q_join_q4",
      (s, d) => {
        Catalog.registerViews(s, d, "orders", "lineitem")
        s.sql("""SELECT o_orderpriority, COUNT(1) AS order_count
                |FROM orders
                |WHERE EXISTS (
                |  SELECT 1 FROM lineitem
                |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
                |GROUP BY o_orderpriority
                |ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, COUNT(1) AS order_count
             |FROM orders
             |WHERE EXISTS (
             |  SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // TPC-H Q5 shape: revenue by nation for one region, with the cycle
    // constraint s_nationkey = c_nationkey closing the join graph.
    Query(
      "q_join_q5",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val sup = t(s, d, "supplier")
        val n = t(s, d, "nation")
        val r = t(s, d, "region").where(col("r_name") === "ASIA")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey")
            && col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some(s"""SELECT n_name,
              |  ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |  AND s_nationkey = c_nationkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |GROUP BY n_name
              |ORDER BY revenue DESC, n_name""".stripMargin)),

    // TPC-H Q12 shape: conditional CASE aggregation over a join — high-
    // vs low-priority line counts per line status in a shipdate range.
    Query(
      "q_agg_q12",
      (s, d) => {
        val l = t(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("2000-01-01").cast("timestamp")
            && col("l_shipdate") < lit("2001-01-01").cast("timestamp"))
        val o = t(s, d, "orders")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(col("o_orderpriority") === "1-URGENT"
              || col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
              .as("high_line_count"),
            sum(when(col("o_orderpriority") =!= "1-URGENT"
              && col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
              .as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      // DuckDB's SUM over INTEGER yields HUGEINT (int128); Spark's sum of
      // LongType yields BIGINT. The driver's hash is type-sensitive, so
      // normalize the oracle side to BIGINT explicitly.
      Some("""SELECT l_linestatus,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '2000-01-01'
             |  AND l_shipdate < TIMESTAMP '2001-01-01'
             |GROUP BY l_linestatus
             |ORDER BY l_linestatus""".stripMargin)),

    // TPC-H Q14 shape: promo revenue share — ratio of two conditional
    // sums, one output row.
    Query(
      "q_agg_q14",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val p = t(s, d, "part")
        val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        l.join(p, col("l_partkey") === col("p_partkey"))
          .agg((lit(100.0)
            * dsum4(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
            / dsum4(rev)).as("promo_revenue"))
      },
      Some(s"""SELECT 100.0 *
              |  ${sqls.dsum4("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
              |  / ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} AS promo_revenue
              |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin)),

    // TPC-H Q16 shape: distinct supplier count per (brand, size) through
    // the lineitem bridge, excluding one brand and NOT IN suppliers with
    // negative balance (NOT IN → null-aware anti join).
    Query(
      "q_join_q16",
      (s, d) => {
        Catalog.registerViews(s, d, "lineitem", "part", "supplier")
        s.sql("""SELECT p_brand, p_size,
                |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
                |FROM lineitem
                |JOIN part ON l_partkey = p_partkey
                |WHERE p_brand <> 'Brand#45'
                |  AND l_suppkey NOT IN (
                |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
                |GROUP BY p_brand, p_size
                |ORDER BY supplier_cnt DESC, p_brand, p_size
                |LIMIT 40""".stripMargin)
      },
      Some("""SELECT p_brand, p_size,
             |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#45'
             |  AND l_suppkey NOT IN (
             |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
             |GROUP BY p_brand, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_size
             |LIMIT 40""".stripMargin)),

    // TPC-H Q19 shape: disjunctive multi-column join predicate — three
    // (brand, size, quantity) OR-clauses evaluated inside one join.
    Query(
      "q_join_q19",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val p = t(s, d, "part")
        val clause1 = col("p_brand") === "Brand#12" &&
          col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
        val clause2 = col("p_brand") === "Brand#23" &&
          col("p_size").between(1, 25) && col("l_quantity").between(10, 20)
        val clause3 = col("p_brand") === "Brand#34" &&
          col("p_size").between(1, 35) && col("l_quantity").between(20, 30)
        l.join(p, col("l_partkey") === col("p_partkey")
            && (clause1 || clause2 || clause3))
          .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
      },
      Some(s"""SELECT ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
              |        AND l_quantity BETWEEN 1 AND 11)
              |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
              |        AND l_quantity BETWEEN 10 AND 20)
              |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
              |        AND l_quantity BETWEEN 20 AND 30))""".stripMargin)),

    // TPC-H Q22 shape: scalar AVG subquery + correlated NOT EXISTS —
    // rich customers who never placed a large order, per market segment.
    Query(
      "q_join_q22",
      (s, d) => {
        Catalog.registerViews(s, d, "customer", "orders")
        // the AVG threshold goes through the deterministic decimal
        // formulation on BOTH engines — a plain double AVG is
        // accumulation-order-dependent and could flip a customer sitting
        // within 1 ulp of the boundary
        val q22 = s"""SELECT c_mktsegment, COUNT(1) AS numcust,
                     |  ${sqls.dsum("c_acctbal")} AS totacctbal
                     |FROM customer
                     |WHERE c_acctbal > (
                     |    SELECT ${sqls.davg("c_acctbal")} FROM customer
                     |    WHERE c_acctbal > 0.0)
                     |  AND NOT EXISTS (
                     |    SELECT 1 FROM orders
                     |    WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
                     |GROUP BY c_mktsegment
                     |ORDER BY c_mktsegment""".stripMargin
        s.sql(q22)
      },
      Some(s"""SELECT c_mktsegment, COUNT(1) AS numcust,
              |  ${sqls.dsum("c_acctbal")} AS totacctbal
              |FROM customer
              |WHERE c_acctbal > (
              |    SELECT ${sqls.davg("c_acctbal")} FROM customer
              |    WHERE c_acctbal > 0.0)
              |  AND NOT EXISTS (
              |    SELECT 1 FROM orders
              |    WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
              |GROUP BY c_mktsegment
              |ORDER BY c_mktsegment""".stripMargin)))
}
