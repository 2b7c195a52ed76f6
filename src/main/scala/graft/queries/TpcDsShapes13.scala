package graft.queries

/** Thirteenth TPC-DS-shape battery — the two shapes TPCDS_MAP.md's gap
  * audit found genuinely uncovered after five rounds of idiom mining
  * (reference corpus: flink-end-to-end-tests/flink-tpcds-test,
  * runner TpcdsTestProgram.java:49).
  *
  * 1. Q72's core — the corpus's only fact×fact join at DIFFERENT
  *    grains: a daily-grain demand fact joined to a coarser-grain
  *    inventory snapshot on (item, period), with an
  *    on_hand-vs-demand inequality residual, a shipped-late date
  *    non-equi, and a promotion LEFT OUTER whose null side is
  *    CASE-counted. `q_ds_late_ship` (TpcDsShapes5) covered only the
  *    date-offset residual; this covers the two-grain join itself.
  * 2. Q21/Q40's before/after pivot — two conditional SUMs around an
  *    event date with a HAVING on their RATIO band (2/3 ≤
  *    after/before ≤ 3/2). CASE pivots existed (`q_ds_case_pivot`),
  *    but no row filtered on the ratio of two pivot cells.
  *
  * One ANSI SQL text runs verbatim on BOTH Spark and the DuckDB
  * oracle. Determinism: quantities are integral (1..50) doubles, so
  * CAST(... AS BIGINT) is exact on both engines (truncation and
  * rounding agree on integers) and all aggregates stay in exact
  * integer arithmetic — zero ulp exposure.
  */
object TpcDsShapes13 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // Q72 shape. The monthly snapshot is an aggregate of the fact at
  // (brand, month) grain — at scale the CTE is a shuffle on its group
  // key that AQE then sizes; the demand-side join reshuffles on the
  // same (brand, month) key, the on_hand < demand inequality stays a
  // post-join residual (never a join key), the shipped-late predicate
  // is scan-local (both dates on the joined demand row), and the
  // promo dim subset is broadcast for the LEFT OUTER. DATE_TRUNC is
  // CAST to TIMESTAMP on both sides because DuckDB returns DATE where
  // Spark returns TIMESTAMP.
  private val inventoryAheadSql =
    """WITH inv AS (
      |  SELECT p_brand AS i_brand,
      |         CAST(DATE_TRUNC('month', l_shipdate) AS TIMESTAMP)
      |           AS inv_month,
      |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
      |           AS on_hand
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  GROUP BY 1, 2)
      |SELECT i_brand,
      |  CAST(COUNT(1) AS BIGINT) AS n_ahead,
      |  CAST(SUM(CASE WHEN promo.p_partkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS no_promo,
      |  CAST(SUM(CASE WHEN promo.p_partkey IS NOT NULL THEN 1 ELSE 0
      |    END) AS BIGINT) AS with_promo
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN part ON p_partkey = l_partkey
      |JOIN inv ON inv.i_brand = p_brand
      |        AND inv.inv_month =
      |            CAST(DATE_TRUNC('month', l_shipdate) AS TIMESTAMP)
      |        AND inv.on_hand < l_quantity * 25
      |LEFT JOIN (SELECT p_partkey FROM part WHERE p_size < 10) promo
      |       ON promo.p_partkey = l_partkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 5 DAY
      |GROUP BY i_brand
      |ORDER BY i_brand""".stripMargin

  // Q21/Q40 shape: the ratio band 2/3 ≤ after/before ≤ 3/2 is
  // expressed by cross-multiplication (3·after ≥ 2·before ∧ 2·after ≤
  // 3·before) so the HAVING stays in exact integer arithmetic instead
  // of a division whose result type differs between engines. The
  // HAVING repeats the SUM(CASE…) expressions rather than referencing
  // the SELECT aliases — alias resolution inside HAVING is
  // engine-specific, aggregate re-use is not.
  private val beforeAfterBandSql =
    """SELECT s_name,
      |  CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-06-01'
      |    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
      |    AS qty_before,
      |  CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-06-01'
      |    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
      |    AS qty_after
      |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |WHERE l_shipdate BETWEEN TIMESTAMP '1998-03-01'
      |                     AND TIMESTAMP '1998-09-01'
      |GROUP BY s_name
      |HAVING SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-06-01'
      |         THEN CAST(l_quantity AS BIGINT) ELSE 0 END) > 0
      |   AND SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-06-01'
      |         THEN CAST(l_quantity AS BIGINT) ELSE 0 END) * 3
      |       >= SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-06-01'
      |         THEN CAST(l_quantity AS BIGINT) ELSE 0 END) * 2
      |   AND SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-06-01'
      |         THEN CAST(l_quantity AS BIGINT) ELSE 0 END) * 2
      |       <= SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-06-01'
      |         THEN CAST(l_quantity AS BIGINT) ELSE 0 END) * 3
      |ORDER BY s_name""".stripMargin

  private def sqlQuery(name: String, sql: String,
      bench: Boolean, tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql), bench = bench)

  val queries: Seq[Query] = Seq(
    // bench: the corpus's only fact×fact different-grain join — worth a
    // tracked headline number (two lineitem scans, one co-keyed SMJ)
    sqlQuery("q_ds_inventory_ahead", inventoryAheadSql, bench = true,
      "lineitem", "orders", "part"),
    sqlQuery("q_ds_before_after_band", beforeAfterBandSql, bench = false,
      "lineitem", "supplier"))
}
