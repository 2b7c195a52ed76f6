package graft.queries

/** Seventh TPC-DS-shape battery (reference corpus:
  * flink-end-to-end-tests/flink-tpcds-test) — the round-3 verdict's
  * highest-value still-absent idioms, re-expressed on the TPC-H-ish
  * fixtures: the multi-channel rollup report (Q5/Q77), the moving-band
  * deviation with a full three-way self join-back (Q47/Q57), the
  * mutually-exclusive EXISTS cohort matrix (Q69), and the cross-channel
  * cumulative comparison through a FULL OUTER join (Q51). One ANSI SQL
  * text per query, run verbatim on BOTH Spark and the DuckDB oracle.
  *
  * Decimal discipline: every re-aggregated column passes through
  * DECIMAL(18,2) at each stage on both engines, and division/AVG drops
  * to DOUBLE explicitly, so cross-engine hashes match at full precision.
  */
object TpcDsShapes7 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // Q5/Q77 shape: per-channel sales/returns CTEs (channels synthesized
  // from disjoint customer-key residues), UNION ALL, then GROUP BY
  // ROLLUP(channel, id) — per-id rows, per-channel subtotals, grand
  // total in ONE aggregation (Catalyst plans a single Expand).
  private val channelRollupSql =
    """WITH ssr AS (
      |  SELECT 'store' AS channel, CAST(o_custkey % 5 AS BIGINT) AS id,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |      AS DECIMAL(18,2)) AS sales,
      |    CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice
      |      ELSE 0 END AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS returned
      |  FROM orders WHERE o_custkey % 3 = 0 GROUP BY 2),
      |csr AS (
      |  SELECT 'catalog' AS channel, CAST(o_custkey % 5 AS BIGINT) AS id,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |      AS DECIMAL(18,2)) AS sales,
      |    CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice
      |      ELSE 0 END AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS returned
      |  FROM orders WHERE o_custkey % 3 = 1 GROUP BY 2),
      |wsr AS (
      |  SELECT 'web' AS channel, CAST(o_custkey % 5 AS BIGINT) AS id,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |      AS DECIMAL(18,2)) AS sales,
      |    CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice
      |      ELSE 0 END AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS returned
      |  FROM orders WHERE o_custkey % 3 = 2 GROUP BY 2)
      |SELECT channel, id,
      |  CAST(SUM(CAST(sales AS DECIMAL(18,2))) AS DOUBLE) AS sales,
      |  CAST(SUM(CAST(returned AS DECIMAL(18,2))) AS DOUBLE) AS returned,
      |  CAST(SUM(CAST(sales - returned AS DECIMAL(18,2))) AS DOUBLE)
      |    AS net
      |FROM (SELECT * FROM ssr UNION ALL SELECT * FROM csr
      |      UNION ALL SELECT * FROM wsr) x
      |GROUP BY ROLLUP(channel, id)
      |ORDER BY channel NULLS FIRST, id NULLS FIRST""".stripMargin

  // Q47/Q57 shape: monthly revenue per supplier with its year-average
  // band, then the FULL three-way join-back — the series joined to
  // itself at rn-1 and rn+1 so each deviating month carries its
  // neighbors' revenues. The idiom: window + double self-equi-join on a
  // dense sequence number, deviation filter at the end.
  private val movingDevBandsSql =
    """WITH v1 AS (
      |  SELECT l_suppkey AS sk,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
      |    CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mo,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
      |      AS DECIMAL(18,2)) AS rev
      |  FROM lineitem WHERE l_suppkey < 40
      |  GROUP BY 1, 2, 3),
      |v2 AS (
      |  SELECT sk, yr, mo, rev,
      |    -- exact decimal sum, ONE double division: a double AVG would
      |    -- accumulate in engine-specific order and drift at the ulp
      |    CAST(CAST(SUM(CAST(rev AS DECIMAL(18,2)))
      |        OVER (PARTITION BY sk, yr) AS DOUBLE)
      |      / COUNT(1) OVER (PARTITION BY sk, yr) AS DOUBLE) AS avg_rev,
      |    RANK() OVER (PARTITION BY sk ORDER BY yr, mo) AS rn
      |  FROM v1)
      |SELECT v.sk, v.yr, v.mo,
      |  CAST(v.rev AS DOUBLE) AS rev, v.avg_rev,
      |  CAST(p.rev AS DOUBLE) AS prev_rev,
      |  CAST(n.rev AS DOUBLE) AS next_rev
      |FROM v2 v
      |JOIN v2 p ON v.sk = p.sk AND v.rn = p.rn + 1
      |JOIN v2 n ON v.sk = n.sk AND v.rn = n.rn - 1
      |WHERE v.avg_rev > 0
      |  AND ABS(CAST(v.rev AS DOUBLE) - v.avg_rev) / v.avg_rev > 0.2
      |ORDER BY v.sk, v.yr, v.mo""".stripMargin

  // Q69 shape: the mutually-exclusive EXISTS matrix — customers in one
  // channel and provably absent from two others (three independent
  // correlated subqueries; Catalyst plans semi + two anti joins),
  // reported per demographic cell.
  private val existsMatrixSql =
    """SELECT c_mktsegment AS seg, c_nationkey AS nk, COUNT(1) AS n_cust
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |        WHERE o.o_custkey = c.c_custkey
      |          AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |        WHERE o.o_custkey = c.c_custkey
      |          AND o.o_orderpriority = '5-LOW')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |        WHERE o.o_custkey = c.c_custkey
      |          AND o.o_orderstatus = 'O'
      |          AND o.o_orderpriority = '3-MEDIUM')
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // Q51 shape: two channels' running totals per key compared through a
  // FULL OUTER join on (key, day) — the cumulative-dominance report
  // (web running total ahead of store). Window agg feeding both sides
  // of an outer join, COALESCE keys, null-safe comparison.
  private val cumCompareSql =
    """WITH daily AS (
      |  SELECT o_custkey AS ck, o_orderdate AS d,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'store' END
      |      AS channel,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |      AS DECIMAL(18,2)) AS rev
      |  FROM orders WHERE o_custkey < 150 GROUP BY 1, 2, 3),
      |cum AS (
      |  SELECT ck, d, channel,
      |    CAST(SUM(CAST(rev AS DECIMAL(18,2)))
      |      OVER (PARTITION BY ck, channel ORDER BY d
      |            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev
      |  FROM daily)
      |SELECT COALESCE(w.ck, s.ck) AS ck, COALESCE(w.d, s.d) AS d,
      |  w.cum_rev AS web_cum, s.cum_rev AS store_cum
      |FROM (SELECT * FROM cum WHERE channel = 'web') w
      |FULL OUTER JOIN (SELECT * FROM cum WHERE channel = 'store') s
      |  ON w.ck = s.ck AND w.d = s.d
      |WHERE COALESCE(w.cum_rev, 0) > COALESCE(s.cum_rev, 0)
      |ORDER BY ck, d""".stripMargin

  private def sqlQuery(name: String, sql: String,
      tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql))

  val queries: Seq[Query] = Seq(
    sqlQuery("q_ds_channel_rollup", channelRollupSql, "orders"),
    sqlQuery("q_ds_moving_dev_bands", movingDevBandsSql, "lineitem"),
    sqlQuery("q_ds_exists_matrix", existsMatrixSql, "customer", "orders"),
    sqlQuery("q_ds_cum_compare", cumCompareSql, "orders"))
}
