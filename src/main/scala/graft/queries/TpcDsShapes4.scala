package graft.queries

/** Fourth TPC-DS-shape battery (reference corpus:
  * flink-end-to-end-tests/flink-tpcds-test) — four more distinctive
  * idioms: best-and-worst rank join (Q44's two opposite-order ranks of
  * one CTE joined on rank), the within-band-of-joint-average filter
  * (Q58's 0.9×..1.1× channel comparison), consecutive-period growth of
  * growth (Q31's one CTE consumed three times with a ratio-of-ratios
  * predicate), and LEAST-of-ranks selection (Q49's per-measure ranks
  * folded with LEAST). One ANSI SQL text per query, run verbatim on
  * BOTH Spark and the DuckDB oracle; doubles go through exact DECIMAL
  * casts (Catalog.dsum discipline).
  */
object TpcDsShapes4 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // Q44 shape: one performance CTE ranked twice in opposite orders,
  // self-joined on the rank index — best/worst side-by-side. The rank
  // windows are global (no partition): both plan as a single-partition
  // window over the small aggregated CTE, not over the fact table.
  private val rankBestWorstSql =
    """WITH perf AS (
      |  SELECT l_suppkey AS sk,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS rev
      |  FROM lineitem GROUP BY l_suppkey),
      |best AS (
      |  SELECT sk, rev, ROW_NUMBER() OVER (ORDER BY rev DESC, sk) AS rnk
      |  FROM perf),
      |worst AS (
      |  SELECT sk, rev, ROW_NUMBER() OVER (ORDER BY rev ASC, sk) AS rnk
      |  FROM perf)
      |SELECT b.rnk AS rnk, b.sk AS best_sk, b.rev AS best_rev,
      |  w.sk AS worst_sk, w.rev AS worst_rev
      |FROM best b JOIN worst w ON b.rnk = w.rnk
      |WHERE b.rnk <= 10 ORDER BY rnk""".stripMargin

  // Q58 shape: two channel aggregations of the same measure joined on
  // the item key, kept only where EACH side lies within ±10% of the
  // pair's average — the symmetric band predicate.
  private val avgBandSql =
    """WITH ch1 AS (
      |  SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') GROUP BY 1),
      |ch2 AS (
      |  SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH') GROUP BY 1)
      |SELECT ch1.pk AS pk, ch1.rev AS rev1, ch2.rev AS rev2
      |FROM ch1 JOIN ch2 ON ch1.pk = ch2.pk
      |WHERE ch1.rev BETWEEN 0.9 * (ch1.rev + ch2.rev) / 2
      |    AND 1.1 * (ch1.rev + ch2.rev) / 2
      |  AND ch2.rev BETWEEN 0.9 * (ch1.rev + ch2.rev) / 2
      |    AND 1.1 * (ch1.rev + ch2.rev) / 2
      |ORDER BY pk""".stripMargin

  // Q31 shape: one revenue CTE consumed THREE times, chained on
  // consecutive years, selecting groups whose growth accelerates —
  // the ratio-of-ratios predicate over a repeated CTE.
  private val shareGrowthSql =
    """WITH rev AS (
      |  SELECT c_nationkey AS nk, EXTRACT(YEAR FROM o_orderdate) AS yr,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT a.nk AS nk, b.rev / a.rev AS g1, c.rev / b.rev AS g2
      |FROM rev a JOIN rev b ON a.nk = b.nk AND b.yr = a.yr + 1
      |  JOIN rev c ON b.nk = c.nk AND c.yr = b.yr + 1
      |WHERE a.yr = 1995 AND b.rev / a.rev < c.rev / b.rev
      |ORDER BY nk""".stripMargin

  // Q49 shape: rank the same rows by two measures independently, keep
  // rows whose BEST (least) rank clears the bar — LEAST-of-ranks
  // selection over returned items.
  private val leastRanksSql =
    """WITH m AS (
      |  SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS amt
      |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
      |r AS (
      |  SELECT pk, qty, amt,
      |    ROW_NUMBER() OVER (ORDER BY qty DESC, pk) AS qty_rnk,
      |    ROW_NUMBER() OVER (ORDER BY amt DESC, pk) AS amt_rnk
      |  FROM m)
      |SELECT pk, qty_rnk, amt_rnk, LEAST(qty_rnk, amt_rnk) AS best_rnk
      |FROM r WHERE LEAST(qty_rnk, amt_rnk) <= 15
      |ORDER BY best_rnk, pk""".stripMargin

  private def sqlQuery(name: String, sql: String,
      tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql))

  val queries: Seq[Query] = Seq(
    sqlQuery("q_ds_rank_best_worst", rankBestWorstSql, "lineitem"),
    sqlQuery("q_ds_avg_band", avgBandSql, "lineitem", "orders"),
    sqlQuery("q_ds_share_growth", shareGrowthSql, "customer", "orders"),
    sqlQuery("q_ds_least_ranks", leastRanksSql, "lineitem"))
}
