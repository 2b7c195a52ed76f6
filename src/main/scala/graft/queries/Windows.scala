package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import Catalog.t

/** OVER-window coverage (SURVEY.md §2.5): ranking functions, offset
  * functions, and the frame taxonomy of the reference's
  * `…/operators/over/frame/` (row sliding, range sliding, unbounded
  * preceding/following) via Spark's `Window.rowsBetween/rangeBetween`.
  *
  * All ORDER BYs carry a unique tie-breaker so frame contents — and thus
  * running aggregates — are total-order deterministic; running sums
  * accumulate in decimal so the fold order can't produce ulp drift.
  *
  * Scale: WindowExec shuffles once on the partition key and sorts within
  * partitions — same plan shape as the reference's
  * BufferDataOverWindowOperator; skewed partition keys (one giant customer)
  * are the thing to watch at 100 TB, so partition keys here are
  * high-cardinality.
  */
object Windows {

  private val dec = (c: String) => col(c).cast(DecimalType(18, 2))

  val queries: Seq[Query] = Seq(

    // Ranking functions (reference RankOperator.java:33 / FlinkSqlOperatorTable
    // RANK/DENSE_RANK/ROW_NUMBER/NTILE).
    Query(
      "q_over_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
          .select(col("o_orderpriority"), col("o_orderkey"),
            col("o_totalprice"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rk"),
            dense_rank().over(w).as("drk"),
            ntile(4).over(w).as("quartile"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
             |  ROW_NUMBER() OVER w AS rn,
             |  RANK() OVER w AS rk,
             |  DENSE_RANK() OVER w AS drk,
             |  NTILE(4) OVER w AS quartile
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '2001-01-01'
             |WINDOW w AS (PARTITION BY o_orderpriority
             |             ORDER BY o_totalprice DESC, o_orderkey)
             |ORDER BY o_orderpriority, rn""".stripMargin)),

    // Running (cumulative) aggregate — ROWS UNBOUNDED PRECEDING frame
    // (reference RowUnboundedPrecedingOverFrame).
    Query(
      "q_over_running",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .where(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            sum(dec("o_totalprice")).over(w).cast("double")
              .as("running_total"),
            count(lit(1)).over(w).as("n_so_far"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             |    AS running_total,
             |  COUNT(1) OVER w AS n_so_far
             |FROM orders WHERE o_custkey < 100
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey
             |             ROWS UNBOUNDED PRECEDING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Sliding ROWS frame (reference RowSlidingOverFrame).
    Query(
      "q_over_rows_sliding",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-2, Window.currentRow)
        t(s, d, "orders")
          .where(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            (sum(dec("o_totalprice")).over(w).cast("double")
              / count(lit(1)).over(w)).as("ma3"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             |    / COUNT(1) OVER w AS ma3
             |FROM orders WHERE o_custkey < 100
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // RANGE frame over a numeric key (reference RangeSlidingOverFrame).
    Query(
      "q_over_range",
      (s, d) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_quantity"))
          .rangeBetween(-5L, 0L)
        t(s, d, "lineitem")
          .where(col("l_orderkey") < 200)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"),
            count(lit(1)).over(w).as("n_within_5"))
          .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
             |  COUNT(1) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
             |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within_5
             |FROM lineitem WHERE l_orderkey < 200
             |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin)),

    // Time-interval RANGE frame (reference RangeSlidingOverFrame over
    // rowtime — the streaming OVER's batch shape): events in the
    // preceding hour per user. SQL form: Spark and DuckDB both support
    // RANGE with interval bounds on a timestamp ORDER BY.
    Query(
      "q_over_time_range",
      (s, d) => {
        Catalog.registerViews(s, d, "events")
        // events view needs the ns→µs conversion the loader applies
        Catalog.t(s, d, "events").createOrReplaceTempView("events")
        s.sql("""SELECT user_id, event_id,
                |  COUNT(1) OVER (PARTITION BY user_id ORDER BY ts
                |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                |    AS n_last_hour
                |FROM events
                |ORDER BY user_id, event_id""".stripMargin)
      },
      Some("""SELECT user_id, event_id,
             |  COUNT(1) OVER (PARTITION BY user_id
             |    ORDER BY CAST(ts AS TIMESTAMP)
             |    RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
             |    AS n_last_hour
             |FROM events
             |ORDER BY user_id, event_id""".stripMargin)),

    // LEAD/LAG offset functions (reference OffsetOverFrame).
    Query(
      "q_over_lead_lag",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders")
          .where(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            (col("o_totalprice") - coalesce(lag(col("o_totalprice"), 1).over(w),
              col("o_totalprice"))).as("delta"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  LAG(o_totalprice, 1) OVER w AS prev_price,
             |  LEAD(o_totalprice, 1) OVER w AS next_price,
             |  o_totalprice - COALESCE(LAG(o_totalprice, 1) OVER w, o_totalprice)
             |    AS delta
             |FROM orders WHERE o_custkey < 100
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // FIRST_VALUE / LAST_VALUE over explicit frames (reference
    // FirstValue/LastValue agg functions + UnboundedOverWindowFrame).
    Query(
      "q_over_first_last",
      (s, d) => {
        val wf = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders")
          .where(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            first(col("o_totalprice")).over(wf).as("first_price"),
            last(col("o_totalprice")).over(wf).as("last_price"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  FIRST_VALUE(o_totalprice) OVER w AS first_price,
             |  LAST_VALUE(o_totalprice) OVER w AS last_price
             |FROM orders WHERE o_custkey < 100
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)))
}
