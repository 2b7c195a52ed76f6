package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Catalog.{sqls, t}

/** TPC-DS-shape battery — the reference's second batch-SQL e2e corpus
  * (flink-end-to-end-tests/flink-tpcds-test, 103 queries). Rather than
  * replaying all 103, this covers the optimizer COMBINATIONS that corpus
  * exercises beyond the TPC-H set already in Relational1-3:
  * window-function ranking OVER a ROLLUP result (Q67's shape), a FULL
  * OUTER JOIN of two cumulative window series (Q51's shape), and a
  * channel-tagged UNION ALL of fact slices re-joined to dimensions
  * (Q71/Q33's shape). Fixtures are the TPC-H-ish tables; the plan
  * structure — Expand → Window, Window ⋈ Window, Union → Join → Agg —
  * is what's being pinned.
  */
object TpcDsShapes {

  val queries: Seq[Query] = Seq(

    // TPC-DS Q67 shape: rank each brand's periods (and its rollup total)
    // by quantity inside the brand partition — Window over Expand.
    // The rank tie-break coalesces the rolled-up NULL year to -1: Spark
    // sorts NULLS FIRST ascending, DuckDB NULLS LAST, and a brand whose
    // quantity sits in one year ties its own rollup total exactly.
    Query(
      "q_ds_rank_rollup",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val p = t(s, d, "part")
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(desc("sum_qty"), coalesce(col("o_year"), lit(-1)))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"), year(col("o_orderdate")).as("o_year"),
            col("l_quantity"))
          .rollup(col("p_brand"), col("o_year"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
          .where(col("p_brand").isNotNull)
          .withColumn("rk", rank().over(w))
          .where(col("rk") <= 3)
          .select(col("p_brand"), col("o_year"), col("sum_qty"), col("rk"))
          .orderBy(col("p_brand"), col("rk"), col("o_year"))
      },
      Some("""SELECT p_brand, o_year, sum_qty, rk FROM (
             |  SELECT p_brand, o_year, sum_qty,
             |    RANK() OVER (PARTITION BY p_brand
             |      ORDER BY sum_qty DESC, COALESCE(o_year, -1)) AS rk
             |  FROM (
             |    SELECT p_brand, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             |      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |      JOIN part ON l_partkey = p_partkey
             |    GROUP BY ROLLUP (p_brand, EXTRACT(YEAR FROM o_orderdate))) t
             |  WHERE p_brand IS NOT NULL) x
             |WHERE rk <= 3
             |ORDER BY p_brand, rk, o_year""".stripMargin)),

    // TPC-DS Q51 shape: cumulative revenue per customer-year in two
    // order-priority channels, FULL OUTER JOINed on (customer, year),
    // keeping points where the high-priority series runs 2× ahead —
    // Window ⋈ Window with null-coalesced comparison.
    Query(
      "q_ds_cume_full_join",
      (s, d) => {
        val o = t(s, d, "orders")
        def series(pred: org.apache.spark.sql.Column) = {
          val w = Window.partitionBy(col("k")).orderBy(col("yr"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          o.where(pred)
            .select(col("o_custkey").as("k"),
              year(col("o_orderdate")).as("yr"), col("o_totalprice"))
            .groupBy(col("k"), col("yr"))
            .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("rev"))
            .select(col("k"), col("yr"), sum(col("rev")).over(w).as("cum"))
        }
        val hi = series(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .withColumnRenamed("cum", "hi_cum")
        val lo = series(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select(col("k").as("k2"), col("yr").as("yr2"),
            col("cum").as("lo_cum"))
        hi.join(lo, col("k") === col("k2") && col("yr") === col("yr2"),
            "full_outer")
          .where(coalesce(col("hi_cum"), lit(0.0))
            > lit(2.0) * coalesce(col("lo_cum"), lit(0.0)))
          .select(coalesce(col("k"), col("k2")).as("custkey"),
            coalesce(col("yr"), col("yr2")).as("yr"),
            col("hi_cum"), col("lo_cum"))
          .orderBy(col("custkey"), col("yr"))
      },
      Some("""WITH a AS (
             |  SELECT o_custkey AS k, EXTRACT(YEAR FROM o_orderdate) AS yr,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
             |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)),
             |b AS (
             |  SELECT o_custkey AS k, EXTRACT(YEAR FROM o_orderdate) AS yr,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
             |  FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)),
             |ac AS (SELECT k, yr, SUM(rev) OVER (PARTITION BY k ORDER BY yr
             |         ROWS UNBOUNDED PRECEDING) AS hi_cum FROM a),
             |bc AS (SELECT k, yr, SUM(rev) OVER (PARTITION BY k ORDER BY yr
             |         ROWS UNBOUNDED PRECEDING) AS lo_cum FROM b)
             |SELECT COALESCE(ac.k, bc.k) AS custkey,
             |  COALESCE(ac.yr, bc.yr) AS yr, hi_cum, lo_cum
             |FROM ac FULL JOIN bc ON ac.k = bc.k AND ac.yr = bc.yr
             |WHERE COALESCE(hi_cum, 0.0) > 2.0 * COALESCE(lo_cum, 0.0)
             |ORDER BY custkey, yr""".stripMargin)),

    // TPC-DS Q71/Q33 shape: three channel-tagged slices of the fact
    // table UNION ALLed, joined to dimensions, aggregated per (channel,
    // nation). Catalyst pushes each slice's predicate into its own scan;
    // the union is shuffle-free ahead of the single agg exchange.
    Query(
      "q_ds_channel_union",
      (s, d) => {
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        val f = o.where(col("o_totalprice") > 200000.0)
          .select(lit("big").as("channel"), col("o_custkey"),
            col("o_totalprice"))
          .union(o.where(col("o_orderpriority") === "1-URGENT")
            .select(lit("urgent").as("channel"), col("o_custkey"),
              col("o_totalprice")))
          .union(o.where(year(col("o_orderdate")) <= 1996)
            .select(lit("early").as("channel"), col("o_custkey"),
              col("o_totalprice")))
        f.join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("channel"), col("n_name"))
          .agg(count(lit(1)).as("n"), Catalog.dsum(col("o_totalprice"))
            .as("rev"))
          .orderBy(col("channel"), col("n_name"))
      },
      Some(s"""WITH f AS (
              |  SELECT 'big' AS channel, o_custkey, o_totalprice
              |  FROM orders WHERE o_totalprice > 200000.0
              |  UNION ALL
              |  SELECT 'urgent', o_custkey, o_totalprice
              |  FROM orders WHERE o_orderpriority = '1-URGENT'
              |  UNION ALL
              |  SELECT 'early', o_custkey, o_totalprice
              |  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) <= 1996)
              |SELECT channel, n_name, COUNT(1) AS n,
              |  ${sqls.dsum("o_totalprice")} AS rev
              |FROM f JOIN customer ON o_custkey = c_custkey
              |  JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY channel, n_name
              |ORDER BY channel, n_name""".stripMargin)))
}
