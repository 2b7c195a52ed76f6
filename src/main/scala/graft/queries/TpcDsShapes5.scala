package graft.queries

/** Fifth TPC-DS-shape battery (reference corpus:
  * flink-end-to-end-tests/flink-tpcds-test) — four more distinctive
  * idioms: the coefficient-of-variation filter (Q17's stddev/avg
  * threshold over a correlated stats aggregate), the scalar-max spend
  * threshold (Q23's "best customers" HAVING against an aggregate of an
  * aggregate), the date-offset non-equi fact join (Q72's d2 > d1 + k
  * days residual on an equi-key join), and revenue-band segmentation
  * (Q54's two-level aggregate: per-customer totals re-aggregated into
  * FLOOR bands). One ANSI SQL text per query, run verbatim on BOTH
  * Spark and the DuckDB oracle.
  *
  * Determinism notes: Q17's variance is computed from exact integer
  * moments (quantities are integral ≤ 50, so n·Σq² and (Σq)² stay well
  * under 2^53 — no STDDEV_SAMP, whose float combine order differs
  * between engines); money sums go through DECIMAL casts (Catalog.dsum
  * discipline); FLOOR is cast to BIGINT (DuckDB FLOOR → DOUBLE, Spark →
  * LONG); COUNT is used instead of SUM(CASE) where possible (DuckDB
  * SUM(int) → HUGEINT).
  */
object TpcDsShapes5 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // Q17 shape: keep parts whose demand is STABLE — sample coefficient of
  // variation below a threshold — then report their exact demand stats.
  // cov < 1/2  ⇔  4·n·(n·Σq² − (Σq)²) < (n−1)·(Σq)², all in exact
  // integer arithmetic (the inequality form avoids sqrt AND division).
  private val covFilterSql =
    """WITH stats AS (
      |  SELECT l_partkey AS pk, COUNT(1) AS n,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)
      |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq2
      |  FROM lineitem GROUP BY 1)
      |SELECT pk, n, sq AS sum_qty,
      |  CAST(sq AS DOUBLE) / n AS avg_qty
      |FROM stats
      |WHERE n >= 5 AND 4 * n * (n * sq2 - sq * sq) < (n - 1) * sq * sq
      |ORDER BY pk""".stripMargin

  // Q23 shape: "best customers" — spend above half the maximum customer
  // spend (a scalar subquery over the same CTE), then their urgent-order
  // counts via a filtered left join (threshold customers with zero
  // urgent orders still appear).
  private val topSpendersSql =
    """WITH spend AS (
      |  SELECT o_custkey AS ck,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sp
      |  FROM orders GROUP BY 1),
      |best AS (
      |  SELECT ck, sp FROM spend
      |  WHERE sp > 0.5 * (SELECT MAX(sp) FROM spend))
      |SELECT b.ck AS ck, b.sp AS sp,
      |  COUNT(o.o_orderkey) AS urgent_orders
      |FROM best b LEFT JOIN orders o
      |  ON o.o_custkey = b.ck AND o.o_orderpriority = '1-URGENT'
      |GROUP BY b.ck, b.sp ORDER BY ck""".stripMargin

  // Q72 shape: equi-key join with a date-offset residual — lines shipped
  // more than 60 days after their order date, counted per priority. The
  // inequality lives in the JOIN ON (a residual filter on the hash join,
  // not a post-aggregation CASE).
  private val lateShipSql =
    """SELECT o_orderpriority, COUNT(1) AS late_lines
      |FROM lineitem JOIN orders
      |  ON l_orderkey = o_orderkey
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // Q54 shape: revenue-band segmentation — per-customer totals
  // re-aggregated into fixed-width spend bands (two chained aggregates;
  // the second input is already small).
  private val spendBandsSql =
    """WITH spend AS (
      |  SELECT o_custkey AS ck,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sp
      |  FROM orders GROUP BY 1)
      |SELECT CAST(FLOOR(sp / 500000) AS BIGINT) AS band,
      |  COUNT(1) AS n_customers
      |FROM spend GROUP BY 1 ORDER BY band""".stripMargin

  private def sqlQuery(name: String, sql: String,
      tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql))

  val queries: Seq[Query] = Seq(
    sqlQuery("q_ds_cov_filter", covFilterSql, "lineitem"),
    sqlQuery("q_ds_top_spenders", topSpendersSql, "orders"),
    sqlQuery("q_ds_late_ship", lateShipSql, "lineitem", "orders"),
    sqlQuery("q_ds_spend_bands", spendBandsSql, "orders"))
}
