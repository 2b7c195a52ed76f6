package graft.queries

import org.apache.spark.sql.functions._

import Catalog.t

/** Scalar-function coverage (SURVEY.md §2.8) — the reference's
  * FlinkSqlOperatorTable.java surface re-expressed with
  * `org.apache.spark.sql.functions` built-ins (codegen'd; no UDFs in the
  * hot path). Graft-specific additions that Spark lacks natively
  * (SPLIT_INDEX, IS_DECIMAL, …) live in graft.functions.GraftFunctions.
  *
  * Transcendental results are rounded to 6 decimals on both engines: Java
  * StrictMath-adjacent libm and DuckDB's libm may differ in the last ulp.
  */
object Functions {

  val queries: Seq[Query] = Seq(

    // String function battery.
    Query(
      "q_fn_string",
      (s, d) =>
        t(s, d, "customer").where(col("c_custkey") <= 200)
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("up"),
            lower(col("c_name")).as("lo"),
            length(col("c_name")).as("len"),
            substring(col("c_name"), 3, 5).as("sub"),
            concat_ws("-", col("c_name"), col("c_mktsegment")).as("cw"),
            lpad(col("c_name"), 20, "*").as("lp"),
            rpad(col("c_name"), 20, "*").as("rp"),
            regexp_replace(col("c_name"), "[0-9]+", "#").as("rre"),
            reverse(col("c_name")).as("rev"),
            trim(lit("  x  ")).as("tr"),
            replace(col("c_mktsegment"), lit("MACH"), lit("M-")).as("rep"),
            instr(col("c_name"), "1").as("pos"),
            repeat(lit("ab"), 3).as("rpt"),
            md5(col("c_name")).as("h"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
             |  UPPER(c_name) AS up, LOWER(c_name) AS lo,
             |  LENGTH(c_name) AS len,
             |  SUBSTRING(c_name, 3, 5) AS sub,
             |  CONCAT_WS('-', c_name, c_mktsegment) AS cw,
             |  LPAD(c_name, 20, '*') AS lp, RPAD(c_name, 20, '*') AS rp,
             |  REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS rre,
             |  REVERSE(c_name) AS rev,
             |  TRIM('  x  ') AS tr,
             |  REPLACE(c_mktsegment, 'MACH', 'M-') AS rep,
             |  STRPOS(c_name, '1') AS pos,
             |  REPEAT('ab', 3) AS rpt,
             |  MD5(c_name) AS h
             |FROM customer WHERE c_custkey <= 200
             |ORDER BY c_custkey""".stripMargin)),

    // Math battery (round(…,6) for libm parity).
    Query(
      "q_fn_math",
      (s, d) =>
        t(s, d, "supplier")
          .select(
            col("s_suppkey"),
            abs(col("s_acctbal") * -1.0).as("ab"),
            round(col("s_acctbal"), 1).as("rnd"),
            floor(col("s_acctbal")).as("fl"),
            ceil(col("s_acctbal")).as("ce"),
            signum(col("s_acctbal") - 5000.0).as("sg"),
            round(sqrt(abs(col("s_acctbal"))), 6).as("sq"),
            round(exp(col("s_acctbal") / 10000.0), 6).as("ex"),
            round(log(abs(col("s_acctbal")) + 1.0), 6).as("lg"),
            round(log10(abs(col("s_acctbal")) + 1.0), 6).as("lg10"),
            round(sin(col("s_acctbal") / 1000.0), 6).as("sn"),
            round(cos(col("s_acctbal") / 1000.0), 6).as("cs"),
            round(atan2(col("s_acctbal"), lit(100.0)), 6).as("at2"),
            round(degrees(col("s_acctbal") / 10000.0), 6).as("deg"),
            pmod(col("s_suppkey"), lit(7)).as("md"),
            round(pow(col("s_acctbal") / 1000.0, 2.0), 6).as("pw"))
          .orderBy(col("s_suppkey")),
      Some("""SELECT s_suppkey,
             |  ABS(s_acctbal * -1.0) AS ab,
             |  ROUND(s_acctbal, 1) AS rnd,
             |  CAST(FLOOR(s_acctbal) AS BIGINT) AS fl,
             |  CAST(CEIL(s_acctbal) AS BIGINT) AS ce,
             |  CAST(SIGN(s_acctbal - 5000.0) AS DOUBLE) AS sg,
             |  ROUND(SQRT(ABS(s_acctbal)), 6) AS sq,
             |  ROUND(EXP(s_acctbal / 10000.0), 6) AS ex,
             |  ROUND(LN(ABS(s_acctbal) + 1.0), 6) AS lg,
             |  ROUND(LOG10(ABS(s_acctbal) + 1.0), 6) AS lg10,
             |  ROUND(SIN(s_acctbal / 1000.0), 6) AS sn,
             |  ROUND(COS(s_acctbal / 1000.0), 6) AS cs,
             |  ROUND(ATAN2(s_acctbal, 100.0), 6) AS at2,
             |  ROUND(DEGREES(s_acctbal / 10000.0), 6) AS deg,
             |  s_suppkey % 7 AS md,
             |  ROUND(POW(s_acctbal / 1000.0, 2.0), 6) AS pw
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // Temporal battery.
    Query(
      "q_fn_temporal",
      (s, d) =>
        t(s, d, "orders").where(col("o_orderkey") <= 500)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            quarter(col("o_orderdate")).as("q"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("dom"),
            dayofyear(col("o_orderdate")).as("doy"),
            date_trunc("month", col("o_orderdate")).as("mstart"),
            col("o_orderdate").cast("date").as("odate"),
            add_months(col("o_orderdate").cast("date"), 2).as("plus2m"),
            datediff(lit("2005-01-01").cast("date"),
              col("o_orderdate").cast("date")).as("days_to_2005"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  YEAR(o_orderdate) AS y, QUARTER(o_orderdate) AS q,
             |  MONTH(o_orderdate) AS m,
             |  DAYOFMONTH(o_orderdate) AS dom,
             |  DAYOFYEAR(o_orderdate) AS doy,
             |  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mstart,
             |  CAST(o_orderdate AS DATE) AS odate,
             |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
             |  DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2005-01-01')
             |    AS days_to_2005
             |FROM orders WHERE o_orderkey <= 500
             |ORDER BY o_orderkey""".stripMargin)),

    // Temporal battery 2: TIMESTAMPADD/TIMESTAMPDIFF, LAST_DAY,
    // WEEKOFYEAR, OVERLAPS (reference OVERLAPS/TIMESTAMP_ADD/
    // TIMESTAMP_DIFF in FlinkSqlOperatorTable; OVERLAPS expressed as the
    // standard interval-intersection predicate — fixture dates are
    // midnight-aligned so day-diff semantics agree across engines).
    Query(
      "q_fn_temporal2",
      (s, d) =>
        t(s, d, "orders").where(col("o_orderkey") <= 500)
          .select(
            col("o_orderkey"),
            expr("timestampadd(HOUR, 3, o_orderdate)").as("plus3h"),
            expr("timestampdiff(DAY, o_orderdate, TIMESTAMP '2003-01-01')")
              .as("days_to_2003"),
            last_day(col("o_orderdate")).as("month_end"),
            weekofyear(col("o_orderdate")).as("woy"),
            (col("o_orderdate") <= lit("2001-03-31").cast("timestamp") &&
              col("o_orderdate") + expr("interval 30 days")
                >= lit("2001-01-01").cast("timestamp")).as("overlaps_q1"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  o_orderdate + INTERVAL 3 HOUR AS plus3h,
             |  date_diff('day', o_orderdate, TIMESTAMP '2003-01-01')
             |    AS days_to_2003,
             |  last_day(o_orderdate) AS month_end,
             |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
             |  o_orderdate <= TIMESTAMP '2001-03-31'
             |    AND o_orderdate + INTERVAL 30 DAY >= TIMESTAMP '2001-01-01'
             |    AS overlaps_q1
             |FROM orders WHERE o_orderkey <= 500
             |ORDER BY o_orderkey""".stripMargin)),

    // Conditional: CASE/IF/NULLIF/COALESCE/GREATEST/LEAST/IS DISTINCT FROM.
    Query(
      "q_fn_conditional",
      (s, d) =>
        t(s, d, "customer").where(col("c_custkey") <= 300)
          .select(
            col("c_custkey"),
            when(col("c_acctbal") < 0, "neg")
              .when(col("c_acctbal") < 5000, "low")
              .otherwise("high").as("band"),
            nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
              lit("-")).as("seg2"),
            greatest(col("c_acctbal"), lit(1000.0)).as("g"),
            least(col("c_acctbal"), lit(1000.0)).as("l"),
            (col("c_mktsegment") <=> lit("AUTOMOBILE")).as("eq_auto"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
             |  CASE WHEN c_acctbal < 0 THEN 'neg'
             |       WHEN c_acctbal < 5000 THEN 'low'
             |       ELSE 'high' END AS band,
             |  NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
             |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '-') AS seg2,
             |  GREATEST(c_acctbal, 1000.0) AS g,
             |  LEAST(c_acctbal, 1000.0) AS l,
             |  c_mktsegment IS NOT DISTINCT FROM 'AUTOMOBILE' AS eq_auto
             |FROM customer WHERE c_custkey <= 300
             |ORDER BY c_custkey""".stripMargin)),

    // Collection/array + UNNEST (reference LogicalUnnestRule.scala →
    // explode/Generator).
    Query(
      "q_fn_array_unnest",
      (s, d) =>
        t(s, d, "documents").where(col("doc_id") < 30)
          .select(col("doc_id"),
            posexplode(slice(split(col("text"), " "), 1, 5)))
          .withColumnRenamed("pos", "idx")
          .withColumnRenamed("col", "w")
          .orderBy(col("doc_id"), col("idx")),
      Some("""SELECT doc_id, CAST(idx - 1 AS INT) AS idx, w FROM (
             |  SELECT doc_id,
             |    UNNEST(string_split(text, ' ')[1:5]) AS w,
             |    GENERATE_SUBSCRIPTS(string_split(text, ' ')[1:5], 1) AS idx
             |  FROM documents WHERE doc_id < 30) u
             |ORDER BY doc_id, idx""".stripMargin)),

    // Bitwise + radix battery (reference FlinkSqlOperatorTable: BIN HEX
    // MOD bit ops; ScalarOperatorGens bitwise codegen).
    Query(
      "q_fn_bits",
      (s, d) =>
        t(s, d, "supplier")
          .select(col("s_suppkey"),
            hex(col("s_suppkey")).as("hx"),
            (col("s_suppkey").bitwiseAND(lit(12L))).as("band"),
            (col("s_suppkey").bitwiseOR(lit(5L))).as("bor"),
            (col("s_suppkey").bitwiseXOR(lit(9L))).as("bxor"),
            shiftleft(col("s_suppkey"), 3).as("shl"),
            shiftright(col("s_suppkey"), 1).as("shr"),
            bitwise_not(col("s_suppkey")).as("bnot"))
          .orderBy(col("s_suppkey")),
      Some("""SELECT s_suppkey,
             |  HEX(s_suppkey) AS hx,
             |  s_suppkey & 12 AS band,
             |  s_suppkey | 5 AS bor,
             |  XOR(s_suppkey, 9) AS bxor,
             |  CAST(s_suppkey << 3 AS BIGINT) AS shl,
             |  CAST(s_suppkey >> 1 AS BIGINT) AS shr,
             |  ~s_suppkey AS bnot
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // String battery 2 (reference FlinkSqlOperatorTable: OVERLAY,
    // TO_BASE64/FROM_BASE64, ASCII/CHR, LOCATE, LEFT/RIGHT, TRANSLATE,
    // STR_TO_MAP, PARSE_URL) — DuckDB lacks several of these natively, so
    // the oracle recomputes them from primitives.
    Query(
      "q_fn_string2",
      (s, d) =>
        t(s, d, "documents").where(col("doc_id") < 100)
          .select(
            col("doc_id"),
            overlay(col("source"), lit("XY"), lit(3)).as("ov"),
            base64(encode(col("source"), "UTF-8")).as("b64"),
            decode(unbase64(base64(encode(col("source"), "UTF-8"))), "UTF-8")
              .as("rt"),
            ascii(col("source")).as("asc"),
            expr("char(ascii(source) + 1)").as("nextc"),
            locate("a", col("source")).as("loc"),
            expr("left(source, 3)").as("lft"),
            expr("right(source, 3)").as("rgt"),
            translate(col("source"), "aeiou", "AEIOU").as("tr"),
            element_at(str_to_map(
              concat(lit("lang:"), col("lang"), lit(",src:"), col("source")),
              lit(","), lit(":")), "lang").as("m_lang"),
            parse_url(concat(lit("https://"), col("source"),
              lit(".example.com/p?q="), col("doc_id")), lit("HOST"))
              .as("url_host"),
            parse_url(concat(lit("https://"), col("source"),
              lit(".example.com/p?q="), col("doc_id")), lit("QUERY"), lit("q"))
              .as("url_q"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  SUBSTRING(source, 1, 2) || 'XY' || SUBSTRING(source, 5) AS ov,
             |  to_base64(ENCODE(source)) AS b64,
             |  source AS rt,
             |  ASCII(source) AS asc,
             |  CHR(ASCII(source) + 1) AS nextc,
             |  STRPOS(source, 'a') AS loc,
             |  LEFT(source, 3) AS lft,
             |  RIGHT(source, 3) AS rgt,
             |  TRANSLATE(source, 'aeiou', 'AEIOU') AS tr,
             |  lang AS m_lang,
             |  source || '.example.com' AS url_host,
             |  CAST(doc_id AS VARCHAR) AS url_q
             |FROM documents WHERE doc_id < 100
             |ORDER BY doc_id""".stripMargin)),

    // Array set operations (reference ARRAY surface + CARDINALITY):
    // intersect/union/except/contains/sort over token arrays. DuckDB
    // reproduces Spark's dedup semantics via list_distinct+list_filter.
    Query(
      "q_fn_array2",
      (s, d) => {
        val toks = split(col("text"), " ")
        t(s, d, "documents")
          .where(size(toks) >= 12)
          .select(col("doc_id"),
            slice(toks, 1, 8).as("a"), slice(toks, 5, 8).as("b"))
          .select(col("doc_id"),
            size(array_intersect(col("a"), col("b"))).as("n_inter"),
            size(array_union(col("a"), col("b"))).as("n_union"),
            size(array_except(col("a"), col("b"))).as("n_except"),
            array_contains(col("a"), "the").as("has_the"),
            array_join(array_sort(array_distinct(col("a"))), ",").as("srt"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  LEN(list_filter(list_distinct(a), x -> list_contains(b, x)))
             |    AS n_inter,
             |  LEN(list_distinct(list_concat(a, b))) AS n_union,
             |  LEN(list_filter(list_distinct(a),
             |    x -> NOT list_contains(b, x))) AS n_except,
             |  list_contains(a, 'the') AS has_the,
             |  array_to_string(list_sort(list_distinct(a)), ',') AS srt
             |FROM (
             |  SELECT doc_id,
             |    string_split(text, ' ')[1:8] AS a,
             |    string_split(text, ' ')[5:12] AS b
             |  FROM documents
             |  WHERE LEN(string_split(text, ' ')) >= 12) x
             |ORDER BY doc_id""".stripMargin)),

    // JSON access (reference JsonFunctionsTest.scala surface; 1.13 had
    // predicates + extraction idioms).
    Query(
      "q_fn_json",
      (s, d) =>
        t(s, d, "events").where(col("event_id") < 500)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, CAST(props ->> '$.k' AS INT) AS k
             |FROM events WHERE event_id < 500
             |ORDER BY event_id""".stripMargin)))
}
