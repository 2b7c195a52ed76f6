package graft.queries

/** Fourteenth TPC-DS-shape battery — the nine "star+agg class" map rows
  * made DIRECT (reference corpus:
  * flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/{q3,q7,q26,
  * q27,q42,q52,q55,q91,q96}.sql, runner TpcdsTestProgram.java:49).
  *
  * Rounds 2-6 covered these queries by class claim: plain dimensional
  * equi-join + two-phase aggregate + top-n, the shape the TPC-H battery
  * pins. The round-6 verdict asked for the cheap closure — one thin
  * oracle-green catalog row per file, so TPCDS_MAP.md cites a direct
  * green entry for all 103 reference files and the class-claim footnote
  * disappears. Each query mirrors its reference file's distinctive
  * filter/grain structure on the fixture schema; none is a bench
  * headline (the class's plan shape is already benched by
  * q_join_inner/q_sort_limit).
  *
  * Determinism contract (same as TpcDsShapes13): ONE ANSI text runs
  * verbatim on Spark and DuckDB, so all arithmetic stays integral —
  * l_quantity is an integral-valued double (CAST truncation and
  * rounding agree), averages are written CAST(SUM(..) AS DOUBLE) /
  * COUNT(..) so both engines divide the same exact integers, and
  * MIN/MAX of doubles/timestamps involve no arithmetic at all.
  * Top-n ORDER BYs carry a full tiebreak so the LIMIT frontier is a
  * deterministic SET.
  *
  * Scale shape (shared by all nine): dims filter then BROADCAST under
  * AQE, the fact scans once with pushed filters, aggregation is
  * two-phase partial/final on the group key — no shuffle carries
  * pre-aggregate fact rows, which is the property that survives a 100×
  * fact growth.
  */
object TpcDsShapes14 {

  // SQL text vals are declared BEFORE `queries`: a Query referencing a
  // val declared later in the same object NPEs at class init.

  // q3: brand × year revenue, top-n, one selective dim filter.
  private val q3Sql =
    """SELECT p_brand, YEAR(o_orderdate) AS o_year,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_size < 15
      |GROUP BY p_brand, YEAR(o_orderdate)
      |ORDER BY sum_qty DESC, o_year, p_brand
      |LIMIT 10""".stripMargin

  // q7: star+agg behind FOUR dimension filters, a row of averages.
  private val q7Sql =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
      |    / COUNT(1) AS avg_qty,
      |  CAST(SUM(CAST(p_size AS BIGINT)) AS DOUBLE)
      |    / COUNT(1) AS avg_size,
      |  CAST(COUNT(1) AS BIGINT) AS n
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN part ON p_partkey = l_partkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderpriority = '1-URGENT'
      |  AND p_size BETWEEN 5 AND 40
      |  AND l_returnflag = 'N'
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // q26: the catalog-channel variant — supplier-side demographics.
  private val q26Sql =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
      |    / COUNT(1) AS avg_qty,
      |  MAX(l_shipdate) AS last_ship,
      |  CAST(COUNT(1) AS BIGINT) AS n
      |FROM lineitem
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN part ON p_partkey = l_partkey
      |WHERE n_name LIKE 'NATION_1%'
      |  AND l_linestatus = 'F'
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // q27: store star+agg with a ROLLUP over the geography hierarchy.
  private val q27Sql =
    """SELECT n_name, p_brand,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  GROUPING_ID(n_name, p_brand) AS gid
      |FROM lineitem
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_size < 12
      |GROUP BY ROLLUP (n_name, p_brand)
      |ORDER BY gid, n_name NULLS FIRST, p_brand NULLS FIRST""".stripMargin

  // q42: category (p_type head) × year, top-n.
  private val q42Sql =
    """SELECT SUBSTRING(p_type, 1, 8) AS category,
      |  YEAR(l_shipdate) AS ship_year,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE l_returnflag = 'A'
      |GROUP BY SUBSTRING(p_type, 1, 8), YEAR(l_shipdate)
      |ORDER BY sum_qty DESC, category, ship_year
      |LIMIT 10""".stripMargin

  // q52: single-dim brand revenue in one year, top-n.
  private val q52Sql =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE YEAR(l_shipdate) = 1997
      |GROUP BY p_brand
      |ORDER BY sum_qty DESC, p_brand
      |LIMIT 10""".stripMargin

  // q55: q52's twin distinguished by a dim-attribute filter, not a
  // time filter.
  private val q55Sql =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_type LIKE 'SMALL%'
      |GROUP BY p_brand
      |ORDER BY sum_qty DESC, p_brand
      |LIMIT 10""".stripMargin

  // q91: returns-only fact slice through customer demographics.
  private val q91Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ret_qty,
      |  CAST(COUNT(1) AS BIGINT) AS ret_lines
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation ON n_nationkey = c_nationkey
      |WHERE l_returnflag = 'R'
      |  AND c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
      |  AND o_orderstatus = 'F'
      |GROUP BY n_name
      |ORDER BY ret_qty DESC, n_name""".stripMargin

  // q96: a bare filtered COUNT through three dimensions and a time band.
  private val q96Sql =
    """SELECT CAST(COUNT(1) AS BIGINT) AS n
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN part ON p_partkey = l_partkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND c_mktsegment = 'HOUSEHOLD'
      |  AND p_size < 20""".stripMargin

  private def sqlQuery(name: String, sql: String,
      tables: String*): Query =
    Query(name,
      (s, d) => {
        Catalog.registerViews(s, d, tables: _*)
        s.sql(sql)
      },
      Some(sql))

  val queries: Seq[Query] = Seq(
    sqlQuery("q_ds_star_q3", q3Sql, "lineitem", "orders", "part"),
    sqlQuery("q_ds_star_q7", q7Sql,
      "lineitem", "orders", "customer", "part"),
    sqlQuery("q_ds_star_q26", q26Sql,
      "lineitem", "supplier", "nation", "part"),
    sqlQuery("q_ds_star_q27", q27Sql,
      "lineitem", "supplier", "nation", "part"),
    sqlQuery("q_ds_star_q42", q42Sql, "lineitem", "part"),
    sqlQuery("q_ds_star_q52", q52Sql, "lineitem", "part"),
    sqlQuery("q_ds_star_q55", q55Sql, "lineitem", "part"),
    sqlQuery("q_ds_star_q91", q91Sql,
      "lineitem", "orders", "customer", "nation"),
    sqlQuery("q_ds_star_q96", q96Sql,
      "lineitem", "orders", "customer", "part"))
}
