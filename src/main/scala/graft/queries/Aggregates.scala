package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Catalog.{t, dsum, dsum4, davg, sqls}

/** Aggregation coverage (SURVEY.md §2.4): hash agg, distinct agg, grouping
  * sets / rollup / cube, stat aggregates, collect/listagg.
  *
  * The reference's local/global split (StreamExecLocalGroupAggregate.java:54 /
  * StreamExecGlobalGroupAggregate.java:70) and BytesHashMap-based hash agg
  * (BatchExecHashAggregate.java:50) map to Spark's automatic partial+final
  * HashAggregateExec — map-side combine means the shuffle carries one row
  * per (partition, group), which is what keeps these plans viable at 100 TB.
  *
  * Double measures are accumulated as exact decimals (see Catalog.dsum) so
  * results are order-independent — at 1000 executors the combine order is
  * nondeterministic, and an engine whose results change run-to-run fails
  * its own regression gate, so exactness here is a feature, not test sugar.
  */
object Aggregates {

  val queries: Seq[Query] = Seq(

    // TPC-H Q1 shape — the flagship (headline bench + driver smoke query).
    Query(
      "q_agg_tpch1",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .where(col("l_shipdate") <= lit("2002-09-02").cast("timestamp"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${sqls.dsum("l_quantity")} AS sum_qty,
              |  ${sqls.dsum("l_extendedprice")} AS sum_base_price,
              |  ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
              |  ${sqls.davg("l_quantity")} AS avg_qty,
              |  ${sqls.davg("l_extendedprice")} AS avg_price,
              |  ${sqls.davg("l_discount")} AS avg_disc,
              |  COUNT(1) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '2002-09-02'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // Distinct aggregates (reference DistinctAggCodeGen.scala /
    // SplitAggregateRule.scala — Catalyst expands via Expand node).
    Query(
      "q_agg_distinct",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_suppkey) AS n_supp,
             |  COUNT(DISTINCT l_partkey) AS n_part,
             |  COUNT(1) AS n_rows
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      bench = true),

    // ROLLUP (reference DecomposeGroupingSetsRule.scala → Expand).
    Query(
      "q_agg_rollup",
      (s, d) =>
        t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(dsum(col("l_quantity")).as("sum_qty"),
            grouping_id().as("gid"))
          .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${sqls.dsum("l_quantity")} AS sum_qty,
              |  GROUPING(l_returnflag, l_linestatus) AS gid
              |FROM lineitem
              |GROUP BY ROLLUP (l_returnflag, l_linestatus)
              |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // CUBE.
    Query(
      "q_agg_cube",
      (s, d) =>
        t(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"),
            grouping_id().as("gid"))
          .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority")),
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n,
              |  ${sqls.dsum("o_totalprice")} AS sum_price,
              |  GROUPING(o_orderstatus, o_orderpriority) AS gid
              |FROM orders
              |GROUP BY CUBE (o_orderstatus, o_orderpriority)
              |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // GROUPING SETS (explicit).
    Query(
      "q_agg_grouping_sets",
      (s, d) => {
        Catalog.registerViews(s, d, "lineitem")
        s.sql(s"""SELECT l_returnflag, l_linestatus, COUNT(1) AS n,
                 |  GROUPING_ID(l_returnflag, l_linestatus) AS gid
                 |FROM lineitem
                 |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                 |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(1) AS n,
             |  GROUPING(l_returnflag, l_linestatus) AS gid
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // min/max/sum0-style aggregates over joins of dims.
    Query(
      "q_agg_minmax",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"),
            min(col("o_orderdate")).as("first_date"),
            max(col("o_orderdate")).as("last_date"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
             |  MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date,
             |  COUNT(1) AS n
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Variance/stddev from exact decimal moments — deterministic across
    // engines (native stddev differs at ulp level between implementations).
    Query(
      "q_agg_stats",
      (s, d) => {
        val qty = col("l_quantity").cast(DecimalType(18, 2))
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            sum(qty).cast("double").as("s1"),
            sum((qty * qty).cast(DecimalType(28, 4))).cast("double").as("s2"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"),
            ((col("s2") - col("s1") * col("s1") / col("n")) / col("n"))
              .as("var_pop"),
            sqrt((col("s2") - col("s1") * col("s1") / col("n"))
              / (col("n") - 1)).as("stddev_samp"),
            col("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
             |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS s2,
             |    COUNT(1) AS n
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag,
             |  (s2 - s1 * s1 / n) / n AS var_pop,
             |  SQRT((s2 - s1 * s1 / n) / (n - 1)) AS stddev_samp,
             |  n
             |FROM m ORDER BY l_returnflag""".stripMargin)),

    // LISTAGG / collect_list with deterministic in-group order
    // (reference ListAggFunction + COLLECT in FlinkSqlOperatorTable.java).
    Query(
      "q_agg_listagg",
      (s, d) =>
        t(s, d, "nation")
          .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
            .as("nations"))
          .orderBy(col("r_name")),
      Some("""SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // Exact percentiles (reference PERCENTILE/median surface; Spark's
    // exact `percentile` matches DuckDB quantile_cont interpolation).
    Query(
      "q_agg_percentile",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("median"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median,
             |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             |  ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Agg over join with HAVING (TPC-H Q5-ish shape) — headline bench.
    Query(
      "q_agg_having",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
            count(lit(1)).as("n_items"))
          .where(col("n_items") > 100)
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some(s"""SELECT n_name,
              |  ${sqls.dsum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
              |  COUNT(1) AS n_items
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY n_name HAVING COUNT(1) > 100
              |ORDER BY revenue DESC, n_name""".stripMargin),
      bench = true))
}
