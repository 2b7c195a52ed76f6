package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Catalog.{t, dsum}
import graft.cep.Cep

/** Time-windowed / event-table coverage (SURVEY.md §2.4 window aggs, §2.3
  * interval + temporal joins, §2.6 deduplicate). Batch expressions of the
  * reference's streaming operators; the same plans run unchanged as
  * Structured Streaming queries via graft.streaming (watermark added).
  *
  * events.ts is ns in parquet; Spark reads µs. Oracle SQL casts through
  * TIMESTAMP (µs) to match — see FIXTURES.md protocol note.
  */
object EventQueries {

  /** Gaps-and-islands oracle for the `signup error+` NFA pattern — shared
    * by q_cep_nfa (DataFrame NFA API) and q_cep_sql (the MATCH_RECOGNIZE
    * SQL surface): both must produce this exact relation. */
  private val cepNfaOracle =
    """WITH ordered AS (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      |  FROM events),
      |starts AS (
      |  SELECT user_id, rn AS start_rn, event_id AS a_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn)
      |      - 1 AS INT) AS match_seq
      |  FROM (SELECT *, LEAD(event_type) OVER (PARTITION BY user_id
      |          ORDER BY rn) AS next_type
      |        FROM ordered) t
      |  WHERE event_type = 'signup' AND next_type = 'error'),
      |anchored AS (
      |  SELECT user_id, event_id, rn, event_type,
      |    MAX(CASE WHEN event_type <> 'error' THEN rn END)
      |      OVER (PARTITION BY user_id ORDER BY rn
      |            ROWS UNBOUNDED PRECEDING) AS anchor_rn
      |  FROM ordered)
      |SELECT key, step, event_id, match_seq FROM (
      |  SELECT user_id AS key, 'A' AS step, a_id AS event_id,
      |    match_seq
      |  FROM starts
      |  UNION ALL
      |  SELECT e.user_id AS key, 'B' AS step, e.event_id,
      |    s.match_seq
      |  FROM anchored e
      |  JOIN starts s ON s.user_id = e.user_id
      |    AND s.start_rn = e.anchor_rn
      |  WHERE e.event_type = 'error') m
      |ORDER BY key, match_seq, step, event_id""".stripMargin

  /** Gaps-and-islands oracle for the `A (E|C)+ P` alternation pattern —
    * shared by q_cep_alt (DataFrame NFA API) and q_cep_sql_alt (the SQL
    * surface, where the reference rejects alternation): runs of
    * error/click anchored at the preceding non-run event, kept iff that
    * anchor is a signup and the event right after the run is a purchase,
    * each run event labeled with its own alternative. */
  private val cepAltOracle =
    """WITH ordered AS (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      |  FROM events),
      |marked AS (
      |  SELECT *,
      |    MAX(CASE WHEN event_type NOT IN ('error','click')
      |      THEN rn END) OVER (PARTITION BY user_id ORDER BY rn
      |        ROWS UNBOUNDED PRECEDING) AS anchor_rn
      |  FROM ordered),
      |runs AS (
      |  SELECT user_id, anchor_rn, MAX(rn) AS end_rn
      |  FROM marked WHERE event_type IN ('error','click')
      |  GROUP BY 1, 2),
      |hits AS (
      |  SELECT a.user_id, a.rn AS a_rn, a.event_id AS a_id,
      |    r.end_rn, p.event_id AS p_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY a.user_id
      |      ORDER BY a.rn) - 1 AS INT) AS match_seq
      |  FROM ordered a
      |  JOIN runs r ON r.user_id = a.user_id AND r.anchor_rn = a.rn
      |  JOIN ordered p ON p.user_id = a.user_id
      |    AND p.rn = r.end_rn + 1 AND p.event_type = 'purchase'
      |  WHERE a.event_type = 'signup')
      |SELECT key, step, event_id, match_seq FROM (
      |  SELECT user_id AS key, 'A' AS step, a_id AS event_id,
      |    match_seq FROM hits
      |  UNION ALL
      |  SELECT h.user_id, CASE WHEN m.event_type = 'error'
      |      THEN 'E' ELSE 'C' END, m.event_id, h.match_seq
      |  FROM marked m JOIN hits h ON m.user_id = h.user_id
      |    AND m.anchor_rn = h.a_rn
      |  WHERE m.event_type IN ('error','click')
      |  UNION ALL
      |  SELECT user_id, 'P', p_id, match_seq FROM hits) u
      |ORDER BY key, match_seq, step, event_id""".stripMargin

  /** The islands-CTE prefix of [[cepNfaOracle]] (everything before its
    * final per-event SELECT) — shared by every oracle that re-aggregates
    * the same match relation. */
  private lazy val cepOraclePrefix: String =
    cepNfaOracle.substring(0, cepNfaOracle.indexOf("SELECT key, step"))

  /** Per-event match relation `m(user_id, rn, event_id, var, match_seq
    * [, extras])` over the islands CTEs — the ALL-ROWS oracles' shared
    * core. `aExtras`/`bExtras` append aligned projection columns to the
    * A-row and B-row branches. */
  private def cepPerEventCte(aExtras: String = "",
      bExtras: String = ""): String =
    s""", m AS (
       |  SELECT user_id, start_rn AS rn, a_id AS event_id,
       |    'A' AS var, match_seq$aExtras
       |  FROM starts
       |  UNION ALL
       |  SELECT e.user_id, e.rn, e.event_id, 'B',
       |    s.match_seq$bExtras
       |  FROM anchored e JOIN starts s
       |    ON s.user_id = e.user_id AND s.start_rn = e.anchor_rn
       |  WHERE e.event_type = 'error')""".stripMargin

  val queries: Seq[Query] = Seq(

    // Tumbling window aggregation (reference WindowOperator.java:96 +
    // SliceAssigners tumbling; Spark window() col).
    Query(
      "q_window_tumble",
      (s, d) =>
        t(s, d, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(col("window.start").as("w_start"), col("event_type"),
            col("n"), col("sum_value"))
          .orderBy(col("w_start"), col("event_type")),
      Some("""SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS w_start,
             |  event_type, COUNT(1) AS n,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY w_start, event_type""".stripMargin),
      bench = true),

    // Sliding (hop) window: 1 hour size, 15 min slide — each event lands in
    // 4 windows (reference SliceAssigners hopping; Spark window(slide)).
    Query(
      "q_window_hop",
      (s, d) =>
        t(s, d, "events")
          .groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("w_start"), col("n"))
          .orderBy(col("w_start")),
      Some("""WITH b AS (
             |  SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
             |a AS (
             |  SELECT DATE_TRUNC('hour', ts)
             |    + INTERVAL '15 minutes' * CAST(FLOOR(EXTRACT(MINUTE FROM ts) / 15) AS INT)
             |    - INTERVAL '15 minutes' * k.k AS w_start
             |  FROM b, (SELECT UNNEST([0, 1, 2, 3]) AS k) k)
             |SELECT w_start, COUNT(1) AS n FROM a
             |GROUP BY w_start ORDER BY w_start""".stripMargin)),

    // CUMULATE window (reference SqlCumulateTableFunction.java:37) — union
    // of growing prefix windows within a 1-hour max span, 20-minute step.
    Query(
      "q_window_cumulate",
      (s, d) => {
        val ev = t(s, d, "events")
        // expand each event into every prefix window [hour_start, hour_start + k*20min)
        // that contains it: k such that ts < hour_start + k*20min, k in 1..3
        val base = ev.select(col("ts"), col("value"),
          date_trunc("hour", col("ts")).as("w_start"))
        val expanded = base
          .withColumn("k", explode(array(lit(1), lit(2), lit(3))))
          .where(col("ts") < col("w_start") + expr("make_interval(0,0,0,0,0,20,0) * k"))
          .select(col("w_start"),
            (col("w_start") + expr("make_interval(0,0,0,0,0,20,0) * k")).as("w_end"),
            col("value"))
        expanded.groupBy(col("w_start"), col("w_end"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy(col("w_start"), col("w_end"))
      },
      Some("""WITH b AS (SELECT CAST(ts AS TIMESTAMP) AS ts, "value" FROM events),
             |a AS (
             |  SELECT DATE_TRUNC('hour', ts) AS w_start,
             |    DATE_TRUNC('hour', ts) + INTERVAL '20 minutes' * k.k AS w_end,
             |    ts, "value"
             |  FROM b, (SELECT UNNEST([1, 2, 3]) AS k) k
             |  WHERE ts < DATE_TRUNC('hour', ts) + INTERVAL '20 minutes' * k.k)
             |SELECT w_start, w_end, COUNT(1) AS n,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM a GROUP BY 1, 2 ORDER BY w_start, w_end""".stripMargin)),

    // Session window (reference EventTimeSessionWindows /
    // session_window() in Spark) — 5-minute gap per user.
    Query(
      "q_window_session",
      (s, d) =>
        t(s, d, "events")
          .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(col("user_id"), col("session_window.start").as("s_start"),
            col("n"), col("sum_value"))
          .orderBy(col("user_id"), col("s_start")),
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |             event_id, "value"
             |           FROM events),
             |x AS (
             |  SELECT user_id, ts, event_id, "value",
             |    CASE WHEN LAG(ts) OVER w IS NULL
             |      OR ts - LAG(ts) OVER w > INTERVAL '5 minutes'
             |      THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |y AS (
             |  SELECT user_id, ts, "value",
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM x)
             |SELECT user_id, MIN(ts) AS s_start, COUNT(1) AS n,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM y GROUP BY user_id, sid
             |ORDER BY user_id, s_start""".stripMargin)),

    // Count evictor (reference CountEvictor.java / Evictor API): keep
    // only the LAST 3 events (by event time) of each hourly window
    // before aggregating — evict-before-apply as a declarative
    // rank-then-aggregate, no custom window machinery needed.
    Query(
      "q_window_evict",
      (s, d) => {
        val bucket = window(col("ts"), "1 hour")
        val w = Window.partitionBy(col("user_id"), col("w_start"))
          .orderBy(desc("ts"), desc("event_id"))
        t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"),
            bucket.getField("start").as("w_start"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .groupBy(col("user_id"), col("w_start"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy(col("user_id"), col("w_start"))
      },
      Some("""SELECT user_id, w_start, COUNT(1) AS n,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM (
             |  SELECT user_id, w_start, "value",
             |    ROW_NUMBER() OVER (PARTITION BY user_id, w_start
             |      ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM (
             |    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, "value",
             |      time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start
             |    FROM events) e) x
             |WHERE rn <= 3
             |GROUP BY user_id, w_start
             |ORDER BY user_id, w_start""".stripMargin)),

    // TimeEvictor (reference flink-streaming-java windowing/evictors/
    // TimeEvictor.java): before the window aggregates, drop every element
    // older than (window max ts − keep). Batch twin: windowed MAX(ts) +
    // filter + agg — the window max and the aggregation share one
    // (user, window) shuffle.
    Query(
      "q_window_evict_time",
      (s, d) => {
        val bucket = window(col("ts"), "1 hour")
        val wAll = Window.partitionBy(col("user_id"), col("w_start"))
        t(s, d, "events")
          .select(col("user_id"), col("ts"), col("value"),
            bucket.getField("start").as("w_start"))
          .withColumn("max_ts", max(col("ts")).over(wAll))
          .where(col("ts") >= col("max_ts") - expr("INTERVAL 30 MINUTES"))
          .groupBy(col("user_id"), col("w_start"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy(col("user_id"), col("w_start"))
      },
      Some("""SELECT user_id, w_start, COUNT(1) AS n,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM (
             |  SELECT user_id, w_start, ts, "value",
             |    MAX(ts) OVER (PARTITION BY user_id, w_start) AS max_ts
             |  FROM (
             |    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, "value",
             |      time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start
             |    FROM events) e) x
             |WHERE ts >= max_ts - INTERVAL '30 minutes'
             |GROUP BY user_id, w_start
             |ORDER BY user_id, w_start""".stripMargin)),

    // DeltaEvictor (reference windowing/evictors/DeltaEvictor.java):
    // evict elements whose delta against the window's LAST element
    // exceeds the threshold. Last element = (ts, event_id)-max row;
    // the unbounded-frame FIRST_VALUE and the aggregate share one
    // (user, window) shuffle, same plan shape as the other evictors.
    Query(
      "q_window_evict_delta",
      (s, d) => {
        val bucket = window(col("ts"), "1 hour")
        val wLast = Window.partitionBy(col("user_id"), col("w_start"))
          .orderBy(desc("ts"), desc("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"),
            bucket.getField("start").as("w_start"))
          .withColumn("last_val", first(col("value")).over(wLast))
          .where(abs(col("value") - col("last_val")) <= 10.0)
          .groupBy(col("user_id"), col("w_start"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy(col("user_id"), col("w_start"))
      },
      Some("""SELECT user_id, w_start, COUNT(1) AS n,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM (
             |  SELECT user_id, w_start, "value",
             |    FIRST_VALUE("value") OVER (PARTITION BY user_id, w_start
             |      ORDER BY ts DESC, event_id DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |      AS last_val
             |  FROM (
             |    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             |      "value",
             |      time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start
             |    FROM events) e) x
             |WHERE ABS("value" - last_val) <= 10.0
             |GROUP BY user_id, w_start
             |ORDER BY user_id, w_start""".stripMargin)),

    // Session windows with a DYNAMIC per-event gap (reference
    // SessionWindowTimeGapExtractor — flink-streaming-java
    // DynamicEventTimeSessionWindows): each event extends its session by
    // its own type-dependent gap; overlapping [ts, ts+gap) windows merge.
    // Oracle: islands over the running max of window ends — a new session
    // starts when an event's ts reaches past every previous end.
    Query(
      "q_window_session_dynamic",
      (s, d) =>
        t(s, d, "events")
          .groupBy(session_window(col("ts"),
            when(col("event_type") === "view", lit("10 minutes"))
              .otherwise(lit("2 minutes"))), col("user_id"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(col("user_id"), col("session_window.start").as("s_start"),
            col("n"), col("sum_value"))
          .orderBy(col("user_id"), col("s_start")),
      Some("""WITH e AS (
             |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, "value",
             |    CAST(ts AS TIMESTAMP) + CASE WHEN event_type = 'view'
             |      THEN INTERVAL '10 minutes' ELSE INTERVAL '2 minutes'
             |    END AS w_end
             |  FROM events),
             |x AS (
             |  SELECT user_id, ts, event_id, "value",
             |    CASE WHEN MAX(w_end) OVER (PARTITION BY user_id
             |        ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |      OR ts >= MAX(w_end) OVER (PARTITION BY user_id
             |        ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      THEN 1 ELSE 0 END AS brk
             |  FROM e),
             |y AS (
             |  SELECT user_id, ts, "value",
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM x)
             |SELECT user_id, MIN(ts) AS s_start, COUNT(1) AS n,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM y GROUP BY user_id, sid
             |ORDER BY user_id, s_start""".stripMargin)),

    // Deduplicate keep-first (reference StreamExecDeduplicate.java:70,
    // RowTimeDeduplicateFunction.java:31 — ROW_NUMBER()=1 rewrite),
    // via the library operator.
    Query(
      "q_dedup_keep_first",
      (s, d) => {
        import graft.operators.Ops._
        t(s, d, "events")
          .dedupKeepFirst(Seq(col("user_id"), col("event_type")),
            Seq(col("ts"), col("event_id")))
          .select(col("user_id"), col("event_type"), col("event_id"),
            col("value"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT user_id, event_type, event_id, "value" FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
             |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events) x
             |WHERE rn = 1
             |ORDER BY user_id, event_type""".stripMargin)),

    // Interval join (reference StreamExecIntervalJoin.java:67 /
    // TimeIntervalJoin.java:51): error within 60 min after a signup, same user.
    Query(
      "q_interval_join",
      (s, d) => {
        import graft.operators.Ops._
        val ev = t(s, d, "events")
        val a = ev.where(col("event_type") === "signup")
          .select(col("user_id").as("u"), col("event_id").as("a_id"),
            col("ts").as("a_ts"))
        val b = ev.where(col("event_type") === "error")
          .select(col("user_id").as("u2"), col("event_id").as("b_id"),
            col("ts").as("b_ts"))
        a.intervalJoin(b, col("u") === col("u2"), col("a_ts"), col("b_ts"),
            "0 seconds", "60 minutes")
          .select(col("a_id"), col("b_id"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""SELECT a.event_id AS a_id, b.event_id AS b_id
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id
             | AND a.event_type = 'signup' AND b.event_type = 'error'
             | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
             | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL '60 minutes'
             |ORDER BY a_id, b_id""".stripMargin)),

    // MATCH_RECOGNIZE-lite (reference StreamExecMatch.java:90, pattern
    // `A B` with A.type='signup', B.type='error'): adjacent-event pattern
    // per user timeline via lead() — the row-pattern cases SQL window
    // functions can express; full NFA quantifiers are out of v1 scope
    // (SURVEY §7 hard list).
    Query(
      "q_cep_adjacent",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(s, d, "events")
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .withColumn("next_id", lead(col("event_id"), 1).over(w))
          .where(col("event_type") === "signup"
            && col("next_type") === "error")
          .select(col("user_id"), col("event_id").as("a_id"),
            col("next_id").as("b_id"))
          .orderBy(col("user_id"), col("a_id"))
      },
      Some("""SELECT user_id, event_id AS a_id, next_id AS b_id FROM (
             |  SELECT user_id, event_id, event_type,
             |    LEAD(event_type, 1) OVER w AS next_type,
             |    LEAD(event_id, 1) OVER w AS next_id
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id
             |               ORDER BY CAST(ts AS TIMESTAMP), event_id)) x
             |WHERE event_type = 'signup' AND next_type = 'error'
             |ORDER BY user_id, a_id""".stripMargin)),

    // Full NFA pattern matching (reference StreamExecMatch.java:90 /
    // flink-cep Pattern.java:50): `signup error+` strict-contiguity with
    // greedy Plus, after-match skip — graft.cep.Cep. Oracle: because the
    // two step predicates are disjoint, the NFA's matches are exactly
    // "signup whose next event is an error" (A) plus the maximal error
    // run anchored at that signup (B) — expressible in ANSI SQL as
    // gaps-and-islands over the per-user timeline, so the NFA engine is
    // hash-checked end to end (quantified patterns with overlapping
    // predicates stay spec-validated in CepSpec).
    Query(
      "q_cep_nfa",
      (s, d) =>
        graft.cep.Cep.signupThenErrors(t(s, d, "events"))
          .orderBy(col("key"), col("match_seq"), col("step"),
            col("event_id")),
      Some(cepNfaOracle),
      // bench: the CEP family's headline number — one key shuffle +
      // linear NFA scan; tracks the mapPartitions match path the SQL
      // rows never exercise
      bench = true),

    // The same `A B+` pattern through the SQL MATCH_RECOGNIZE surface
    // (reference StreamExecMatch.java:90 — the reference's CEP NFA is a
    // SQL-level operator; graft's parser extension rewrites the clause
    // onto Cep.matchPattern). Same oracle as q_cep_nfa: the DataFrame
    // API and the SQL surface must agree row for row. Sessions built
    // via GraftSession run this through spark.sql directly (the
    // injected parser); the catalog uses the extension-free direct
    // path so the driver's plain Verify session works too.
    Query(
      "q_cep_sql",
      (s, d) => {
        Catalog.registerViews(s, d, "events")
        graft.cep.MatchRecognize.sql(s,
          """SELECT key, step, event_id, match_seq
            |FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts, event_id
            |  AFTER MATCH SKIP PAST LAST ROW
            |  PATTERN (A B+)
            |  DEFINE A AS event_type = 'signup',
            |         B AS event_type = 'error'
            |)
            |ORDER BY key, match_seq, step, event_id""".stripMargin)
      },
      Some(cepNfaOracle)),

    // MEASURES / ONE ROW PER MATCH over the same pattern: the SQL
    // standard's per-match aggregation surface (reference
    // MatchCodeGenerator measures codegen). Oracle: the same islands
    // CTE chain, aggregated per (key, match_seq) with arg_max over the
    // timeline rank for LAST.
    Query(
      "q_cep_sql_measures",
      (s, d) => {
        Catalog.registerViews(s, d, "events")
        graft.cep.MatchRecognize.sql(s,
          """SELECT key, match_seq, a_id, last_err, n_errors
            |FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts, event_id
            |  MEASURES FIRST(A.event_id) AS a_id,
            |           LAST(B.event_id) AS last_err,
            |           COUNT(B.*) AS n_errors
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP PAST LAST ROW
            |  PATTERN (A B+)
            |  DEFINE A AS event_type = 'signup',
            |         B AS event_type = 'error'
            |)
            |ORDER BY key, match_seq""".stripMargin)
      },
      Some {
        // reuse the islands CTE prefix of cepNfaOracle, swap the final
        // per-event select for the per-match aggregation
        cepOraclePrefix +
          """SELECT s.user_id AS key, s.match_seq, s.a_id,
            |  ARG_MAX(e.event_id, e.rn) AS last_err,
            |  CAST(COUNT(1) AS BIGINT) AS n_errors
            |FROM starts s JOIN anchored e
            |  ON e.user_id = s.user_id AND e.anchor_rn = s.start_rn
            |    AND e.event_type = 'error'
            |GROUP BY 1, 2, 3
            |ORDER BY key, match_seq""".stripMargin
      }),

    // SUBSET union variables (SQL:2016 R010; parity-plus — the
    // reference's 1.13 SQL surface has no SUBSET): S = (A, B) makes
    // MEASURES aggregate over the union of both variables' rows.
    // FIRST(S.·) lands on the signup, LAST(S.·) on the final error, and
    // COUNT(S.*) counts the whole match — three anchors no single
    // variable provides. Oracle: the islands CTEs aggregated per match
    // with the union reconstructed as A ∪ anchored-errors.
    Query(
      "q_cep_sql_subset",
      (s, d) => {
        Catalog.registerViews(s, d, "events")
        graft.cep.MatchRecognize.sql(s,
          """SELECT key, match_seq, a_id, first_id, last_id, n_all
            |FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts, event_id
            |  MEASURES FIRST(A.event_id) AS a_id,
            |           FIRST(S.event_id) AS first_id,
            |           LAST(S.event_id) AS last_id,
            |           COUNT(S.*) AS n_all
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP PAST LAST ROW
            |  PATTERN (A B+)
            |  SUBSET S = (A, B)
            |  DEFINE A AS event_type = 'signup',
            |         B AS event_type = 'error'
            |)
            |ORDER BY key, match_seq""".stripMargin)
      },
      Some {
        cepOraclePrefix +
          """SELECT s.user_id AS key, s.match_seq, s.a_id,
            |  s.a_id AS first_id,
            |  ARG_MAX(e.event_id, e.rn) AS last_id,
            |  CAST(COUNT(1) + 1 AS BIGINT) AS n_all
            |FROM starts s JOIN anchored e
            |  ON e.user_id = s.user_id AND e.anchor_rn = s.start_rn
            |    AND e.event_type = 'error'
            |GROUP BY 1, 2, 3, 4
            |ORDER BY key, match_seq""".stripMargin
      }),

    // ALL ROWS PER MATCH over the same pattern: the standard's other
    // output mode (reference StreamExecMatch allRows) — every consumed
    // input row with original columns plus RUNNING measures
    // (MATCH_NUMBER(), CLASSIFIER(), running FIRST/COUNT). Oracle: the
    // islands CTEs emit the same per-event relation; the running COUNT
    // is a windowed conditional count over the match's timeline.
    Query(
      "q_cep_sql_all_rows",
      (s, d) => {
        Catalog.registerViews(s, d, "events")
        graft.cep.MatchRecognize.sql(s,
          """SELECT user_id, event_id, event_type, mno, var, a_id, n_err
            |FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts, event_id
            |  MEASURES MATCH_NUMBER() AS mno,
            |           CLASSIFIER() AS var,
            |           FIRST(A.event_id) AS a_id,
            |           COUNT(B.*) AS n_err
            |  ALL ROWS PER MATCH
            |  AFTER MATCH SKIP PAST LAST ROW
            |  PATTERN (A B+)
            |  DEFINE A AS event_type = 'signup',
            |         B AS event_type = 'error'
            |)
            |ORDER BY user_id, mno, event_id""".stripMargin)
      },
      Some {
        cepOraclePrefix +
          cepPerEventCte(
            aExtras = ", 'signup' AS event_type, a_id",
            bExtras = ", e.event_type, s.a_id") +
          """
            |SELECT user_id, event_id, event_type,
            |  CAST(match_seq AS INT) AS mno, var, a_id,
            |  CAST(COUNT(CASE WHEN var = 'B' THEN 1 END) OVER (
            |    PARTITION BY user_id, match_seq ORDER BY rn
            |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_err
            |FROM m
            |ORDER BY user_id, mno, event_id""".stripMargin
      }),

    // PREV navigation in DEFINE (SQL-standard input navigation; the
    // reference codegens PREV/NEXT calls in MatchCodeGenerator):
    // rising-value click pairs — strict contiguity A B where B is a
    // click whose value exceeds its input-predecessor's (= A's, since B
    // immediately follows A). PREV compiles to LAG over the same
    // (user_id → ts, id) shuffle the NFA needs. Oracle reproduces the
    // NFA's greedy leftmost non-overlap: candidate starts p where
    // (p, p+1) are rising clicks; within runs of CONSECUTIVE candidate
    // positions every other one matches (taking p consumes p+1).
    Query(
      "q_cep_sql_prev",
      (s, d) => {
        Catalog.registerViews(s, d, "events")
        graft.cep.MatchRecognize.sql(s,
          """SELECT key, step, event_id, match_seq
            |FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts, event_id
            |  AFTER MATCH SKIP PAST LAST ROW
            |  PATTERN (A B)
            |  DEFINE A AS event_type = 'click',
            |         B AS event_type = 'click' AND value > PREV(value)
            |)
            |ORDER BY key, match_seq, step, event_id""".stripMargin)
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, ts, event_type, value,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS rn
             |  FROM events),
             |cand AS (
             |  SELECT a.user_id, a.rn AS p,
             |    a.event_id AS a_id, b.event_id AS b_id
             |  FROM ord a JOIN ord b
             |    ON a.user_id = b.user_id AND b.rn = a.rn + 1
             |  WHERE a.event_type = 'click' AND b.event_type = 'click'
             |    AND b.value > a.value),
             |runs AS (
             |  SELECT user_id, p, a_id, b_id,
             |    p - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY p)
             |      AS grp
             |  FROM cand),
             |sel AS (
             |  SELECT user_id, p, a_id, b_id
             |  FROM (SELECT *, ROW_NUMBER() OVER (
             |      PARTITION BY user_id, grp ORDER BY p) AS rix
             |    FROM runs) r
             |  WHERE rix % 2 = 1),
             |seq AS (
             |  SELECT user_id, p, a_id, b_id,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY p)
             |      - 1 AS INT) AS match_seq
             |  FROM sel)
             |SELECT user_id AS key, 'A' AS step, a_id AS event_id,
             |  match_seq FROM seq
             |UNION ALL
             |SELECT user_id, 'B', b_id, match_seq FROM seq
             |ORDER BY key, match_seq, step, event_id""".stripMargin)),

    // RUNNING vs FINAL measure semantics in ALL ROWS mode (the SQL
    // standard's two aggregation scopes; the reference distinguishes
    // them in MatchCodeGenerator): RUNNING COUNT grows along the match,
    // FINAL COUNT and FINAL LAST show the whole-match value on every
    // row. Oracle: the same islands relation with an ordered-frame vs
    // full-frame window per measure.
    Query(
      "q_cep_sql_final",
      (s, d) => {
        Catalog.registerViews(s, d, "events")
        graft.cep.MatchRecognize.sql(s,
          """SELECT user_id, event_id, mno, var, n_run, n_tot, last_b
            |FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts, event_id
            |  MEASURES MATCH_NUMBER() AS mno,
            |           CLASSIFIER() AS var,
            |           RUNNING COUNT(B.*) AS n_run,
            |           FINAL COUNT(B.*) AS n_tot,
            |           FINAL LAST(B.event_id) AS last_b
            |  ALL ROWS PER MATCH
            |  AFTER MATCH SKIP PAST LAST ROW
            |  PATTERN (A B+)
            |  DEFINE A AS event_type = 'signup',
            |         B AS event_type = 'error'
            |)
            |ORDER BY user_id, mno, event_id""".stripMargin)
      },
      Some {
        cepOraclePrefix + cepPerEventCte() +
          """
            |SELECT user_id, event_id, CAST(match_seq AS INT) AS mno, var,
            |  CAST(COUNT(CASE WHEN var = 'B' THEN 1 END) OVER (
            |    PARTITION BY user_id, match_seq ORDER BY rn
            |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_run,
            |  CAST(COUNT(CASE WHEN var = 'B' THEN 1 END) OVER (
            |    PARTITION BY user_id, match_seq) AS BIGINT) AS n_tot,
            |  ARG_MAX(CASE WHEN var = 'B' THEN event_id END,
            |    CASE WHEN var = 'B' THEN rn END) OVER (
            |    PARTITION BY user_id, match_seq) AS last_b
            |FROM m
            |ORDER BY user_id, mno, event_id""".stripMargin
      }),

    // Optional quantifier (reference Pattern.optional, Quantifier.java):
    // `signup error? purchase` strict-contiguity. The signup anchor can't
    // recur inside a match span, so leftmost skip-past-last matches are
    // exactly the 2/3-event windows SQL LEADs can enumerate.
    Query(
      "q_cep_optional",
      (s, d) => cepQuery(s, d,
        Seq(Cep.Step("A", _.getString(3) == "signup"),
          Cep.Step("B", _.getString(3) == "error", Cep.Opt),
          Cep.Step("C", _.getString(3) == "purchase"))),
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |w AS (
             |  SELECT user_id, rn, event_id AS id0, event_type AS t0,
             |    LEAD(event_type,1) OVER uw AS t1, LEAD(event_id,1) OVER uw AS id1,
             |    LEAD(event_type,2) OVER uw AS t2, LEAD(event_id,2) OVER uw AS id2
             |  FROM ordered WINDOW uw AS (PARTITION BY user_id ORDER BY rn)),
             |m AS (
             |  SELECT user_id, rn, id0 AS a_id,
             |    CASE WHEN t1='error' AND t2='purchase' THEN id1 END AS b_id,
             |    CASE WHEN t1='purchase' THEN id1 ELSE id2 END AS c_id
             |  FROM w
             |  WHERE t0='signup' AND (t1='purchase' OR (t1='error' AND t2='purchase'))),
             |seq AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id
             |    ORDER BY rn) - 1 AS INT) AS match_seq FROM m)
             |SELECT key, step, event_id, match_seq FROM (
             |  SELECT user_id AS key, 'A' AS step, a_id AS event_id, match_seq FROM seq
             |  UNION ALL SELECT user_id, 'B', b_id, match_seq FROM seq WHERE b_id IS NOT NULL
             |  UNION ALL SELECT user_id, 'C', c_id, match_seq FROM seq) u
             |ORDER BY key, match_seq, step, event_id""".stripMargin)),

    // Bounded repetition with backtracking (reference Pattern.times(from,
    // to)): `signup error{1,2} purchase` — greedy takes two errors, hands
    // one back when the purchase doesn't follow.
    Query(
      "q_cep_times",
      (s, d) => cepQuery(s, d,
        Seq(Cep.Step("A", _.getString(3) == "signup"),
          Cep.Step("B", _.getString(3) == "error", Cep.Times(1, 2)),
          Cep.Step("C", _.getString(3) == "purchase"))),
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |w AS (
             |  SELECT user_id, rn, event_id AS id0, event_type AS t0,
             |    LEAD(event_type,1) OVER uw AS t1, LEAD(event_id,1) OVER uw AS id1,
             |    LEAD(event_type,2) OVER uw AS t2, LEAD(event_id,2) OVER uw AS id2,
             |    LEAD(event_type,3) OVER uw AS t3, LEAD(event_id,3) OVER uw AS id3
             |  FROM ordered WINDOW uw AS (PARTITION BY user_id ORDER BY rn)),
             |m AS (
             |  SELECT user_id, rn, id0 AS a_id, id1 AS b1_id,
             |    CASE WHEN t2='error' AND t3='purchase' THEN id2 END AS b2_id,
             |    CASE WHEN t2='error' AND t3='purchase' THEN id3 ELSE id2 END AS c_id
             |  FROM w
             |  WHERE t0='signup' AND t1='error'
             |    AND ((t2='error' AND t3='purchase') OR t2='purchase')),
             |seq AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id
             |    ORDER BY rn) - 1 AS INT) AS match_seq FROM m)
             |SELECT key, step, event_id, match_seq FROM (
             |  SELECT user_id AS key, 'A' AS step, a_id AS event_id, match_seq FROM seq
             |  UNION ALL SELECT user_id, 'B', b1_id, match_seq FROM seq
             |  UNION ALL SELECT user_id, 'B', b2_id, match_seq FROM seq WHERE b2_id IS NOT NULL
             |  UNION ALL SELECT user_id, 'C', c_id, match_seq FROM seq) u
             |ORDER BY key, match_seq, step, event_id""".stripMargin)),

    // After-match SKIP_TO_NEXT (reference AfterMatchSkipStrategy.java):
    // `error{2}` with overlapping matches allowed — every adjacent error
    // pair per user timeline.
    Query(
      "q_cep_skip_next",
      (s, d) => cepQuery(s, d,
        Seq(Cep.Step("B", _.getString(3) == "error", Cep.Times(2, 2))),
        skip = Cep.SkipToNext),
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |w AS (
             |  SELECT user_id, rn, event_id AS id0, event_type AS t0,
             |    LEAD(event_type,1) OVER uw AS t1, LEAD(event_id,1) OVER uw AS id1
             |  FROM ordered WINDOW uw AS (PARTITION BY user_id ORDER BY rn)),
             |m AS (SELECT user_id, rn, id0, id1 FROM w
             |      WHERE t0='error' AND t1='error'),
             |seq AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id
             |    ORDER BY rn) - 1 AS INT) AS match_seq FROM m)
             |SELECT key, step, event_id, match_seq FROM (
             |  SELECT user_id AS key, 'B' AS step, id0 AS event_id, match_seq FROM seq
             |  UNION ALL SELECT user_id, 'B', id1, match_seq FROM seq) u
             |ORDER BY key, match_seq, step, event_id""".stripMargin)),

    // After-match SKIP_PAST_LAST on a self-overlapping pattern: `error{2}`
    // tiles each maximal error run into disjoint leftmost pairs — the case
    // a windowed SQL can only express with gaps-and-islands run analysis,
    // pinning the non-overlap semantics the NFA scan enforces.
    Query(
      "q_cep_skip_past",
      (s, d) => cepQuery(s, d,
        Seq(Cep.Step("B", _.getString(3) == "error", Cep.Times(2, 2)))),
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |runs AS (
             |  SELECT user_id, rn, event_id,
             |    rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS grp
             |  FROM ordered WHERE event_type='error'),
             |offs AS (
             |  SELECT user_id, event_id, grp, rn,
             |    ROW_NUMBER() OVER (PARTITION BY user_id, grp ORDER BY rn) - 1 AS off,
             |    COUNT(*) OVER (PARTITION BY user_id, grp) AS len,
             |    MIN(rn) OVER (PARTITION BY user_id, grp) AS run_start
             |  FROM runs),
             |pairs AS (
             |  SELECT user_id, event_id, grp, run_start,
             |    CAST(FLOOR(off/2.0) AS BIGINT) AS pair
             |  FROM offs WHERE FLOOR(off/2.0) < FLOOR(len/2.0)),
             |starts AS (
             |  SELECT DISTINCT user_id, grp, pair, run_start + 2*pair AS start_rn
             |  FROM pairs),
             |seqd AS (
             |  SELECT user_id, grp, pair,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY start_rn) - 1 AS INT) AS match_seq
             |  FROM starts)
             |SELECT p.user_id AS key, 'B' AS step, p.event_id, s.match_seq
             |FROM pairs p JOIN seqd s ON p.user_id = s.user_id
             |  AND p.grp = s.grp AND p.pair = s.pair
             |ORDER BY key, match_seq, step, p.event_id""".stripMargin)),

    // Relaxed contiguity — the reference CEP library's followedBy
    // (Pattern.java:50): `signup ~> purchase` skips interleaved
    // non-purchase noise (clicks, views, errors) between the two steps.
    // SKIP_TO_NEXT makes every start independent, so the oracle is a
    // windowed first-purchase-after-each-signup lookup.
    Query(
      "q_cep_relaxed",
      (s, d) => cepQuery(s, d,
        Cep.pattern("A ~> B", Map(
          "A" -> (_.getString(3) == "signup"),
          "B" -> (_.getString(3) == "purchase"))),
        skip = Cep.SkipToNext),
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |nxt AS (
             |  SELECT user_id, event_id, rn, event_type,
             |    MIN(CASE WHEN event_type = 'purchase' THEN rn END) OVER
             |      (PARTITION BY user_id ORDER BY rn
             |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS b_rn
             |  FROM ordered),
             |starts AS (
             |  SELECT user_id, event_id AS a_id, rn, b_rn,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY rn) - 1 AS INT) AS match_seq
             |  FROM nxt WHERE event_type = 'signup' AND b_rn IS NOT NULL)
             |SELECT key, step, event_id, match_seq FROM (
             |  SELECT user_id AS key, 'A' AS step, a_id AS event_id,
             |    match_seq FROM starts
             |  UNION ALL
             |  SELECT s.user_id, 'B', o.event_id, s.match_seq
             |  FROM starts s JOIN ordered o
             |    ON o.user_id = s.user_id AND o.rn = s.b_rn) m
             |ORDER BY key, match_seq, step, event_id""".stripMargin)),

    // notFollowedBy (reference Pattern.notFollowedBy): `signup ~> !error
    // ~> purchase` — the purchase counts only if NO error occurred in
    // the skipped gap. Oracle: first-purchase / first-error windowed
    // lookups; the match survives iff the error (if any) comes after the
    // purchase.
    Query(
      "q_cep_not_followed",
      (s, d) => cepQuery(s, d,
        Cep.pattern("A ~> !E ~> B", Map(
          "A" -> (_.getString(3) == "signup"),
          "E" -> (_.getString(3) == "error"),
          "B" -> (_.getString(3) == "purchase"))),
        skip = Cep.SkipToNext),
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |nxt AS (
             |  SELECT user_id, event_id, rn, event_type,
             |    MIN(CASE WHEN event_type = 'purchase' THEN rn END) OVER fw AS b_rn,
             |    MIN(CASE WHEN event_type = 'error' THEN rn END) OVER fw AS e_rn
             |  FROM ordered
             |  WINDOW fw AS (PARTITION BY user_id ORDER BY rn
             |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
             |starts AS (
             |  SELECT user_id, event_id AS a_id, rn, b_rn,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY rn) - 1 AS INT) AS match_seq
             |  FROM nxt WHERE event_type = 'signup' AND b_rn IS NOT NULL
             |    AND (e_rn IS NULL OR e_rn > b_rn))
             |SELECT key, step, event_id, match_seq FROM (
             |  SELECT user_id AS key, 'A' AS step, a_id AS event_id,
             |    match_seq FROM starts
             |  UNION ALL
             |  SELECT s.user_id, 'B', o.event_id, s.match_seq
             |  FROM starts s JOIN ordered o
             |    ON o.user_id = s.user_id AND o.rn = s.b_rn) m
             |ORDER BY key, match_seq, step, event_id""".stripMargin)),

    // notNext (reference Pattern.notNext): `signup !error ~> purchase` —
    // only the event IMMEDIATELY after the signup must not be an error;
    // later errors in the gap are fine (contrast q_cep_not_followed).
    Query(
      "q_cep_not_next",
      (s, d) => cepQuery(s, d,
        Cep.pattern("A !E ~> B", Map(
          "A" -> (_.getString(3) == "signup"),
          "E" -> (_.getString(3) == "error"),
          "B" -> (_.getString(3) == "purchase"))),
        skip = Cep.SkipToNext),
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |nxt AS (
             |  SELECT user_id, event_id, rn, event_type,
             |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY rn)
             |      AS next_type,
             |    MIN(CASE WHEN event_type = 'purchase' THEN rn END) OVER
             |      (PARTITION BY user_id ORDER BY rn
             |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS b_rn
             |  FROM ordered),
             |starts AS (
             |  SELECT user_id, event_id AS a_id, rn, b_rn,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY rn) - 1 AS INT) AS match_seq
             |  FROM nxt WHERE event_type = 'signup' AND b_rn IS NOT NULL
             |    AND (next_type IS NULL OR next_type <> 'error'))
             |SELECT key, step, event_id, match_seq FROM (
             |  SELECT user_id AS key, 'A' AS step, a_id AS event_id,
             |    match_seq FROM starts
             |  UNION ALL
             |  SELECT s.user_id, 'B', o.event_id, s.match_seq
             |  FROM starts s JOIN ordered o
             |    ON o.user_id = s.user_id AND o.rn = s.b_rn) m
             |ORDER BY key, match_seq, step, event_id""".stripMargin)),

    // Pattern alternation `(A|B)+` with classifier labeling — Calcite's
    // MATCH_RECOGNIZE grammar admits it, the reference SQL layer rejects
    // it (parity-plus, library-level): signup, then a maximal run of
    // errors-OR-clicks, closed immediately by a purchase; every consumed
    // run event is emitted under ITS OWN alternative's label. Greedy +
    // strict: only the maximal run can match (handing back still leaves
    // a non-purchase adjacent), so the oracle is gaps-and-islands — runs
    // of error/click anchored at the preceding non-run event, kept iff
    // that anchor is a signup and the event right after the run is a
    // purchase.
    Query(
      "q_cep_alt",
      (s, d) => cepQuery(s, d,
        Cep.pattern("A (E|C)+ P", Map(
          "A" -> (_.getString(3) == "signup"),
          "E" -> (_.getString(3) == "error"),
          "C" -> (_.getString(3) == "click"),
          "P" -> (_.getString(3) == "purchase")))),
      Some(cepAltOracle)),

    // The same alternation pattern through the SQL surface: the
    // reference (Flink 1.13) rejects PATTERN alternation outright, so a
    // graft user gets strictly more SQL than the reference here; the SQL
    // path and the DataFrame API must agree row for row (shared oracle).
    Query(
      "q_cep_sql_alt",
      (s, d) => {
        Catalog.registerViews(s, d, "events")
        graft.cep.MatchRecognize.sql(s,
          """SELECT key, step, event_id, match_seq
            |FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts, event_id
            |  AFTER MATCH SKIP PAST LAST ROW
            |  PATTERN (A (E|C)+ P)
            |  DEFINE A AS event_type = 'signup',
            |         E AS event_type = 'error',
            |         C AS event_type = 'click',
            |         P AS event_type = 'purchase'
            |)
            |ORDER BY key, match_seq, step, event_id""".stripMargin)
      },
      Some(cepAltOracle)),

    // Relaxed contiguity bounded by a WITHIN horizon: the purchase must
    // arrive within 2 hours of the signup — the relaxed scan stops at
    // the first out-of-window event (events are time-ordered, so no
    // later take can be in-window either).
    Query(
      "q_cep_relaxed_within",
      (s, d) => cepQuery(s, d,
        Cep.pattern("A ~> B", Map(
          "A" -> (_.getString(3) == "signup"),
          "B" -> (_.getString(3) == "purchase"))),
        skip = Cep.SkipToNext,
        withinMicros = Some(2L * 3600L * 1000000L)),
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             |    event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |nxt AS (
             |  SELECT user_id, event_id, ts, rn, event_type,
             |    MIN(CASE WHEN event_type = 'purchase' THEN rn END) OVER
             |      (PARTITION BY user_id ORDER BY rn
             |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS b_rn
             |  FROM ordered),
             |starts AS (
             |  SELECT n.user_id, n.event_id AS a_id, n.rn, n.b_rn,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY n.user_id
             |      ORDER BY n.rn) - 1 AS INT) AS match_seq
             |  FROM nxt n JOIN ordered b
             |    ON b.user_id = n.user_id AND b.rn = n.b_rn
             |  WHERE n.event_type = 'signup'
             |    AND b.ts <= n.ts + INTERVAL '2 hours')
             |SELECT key, step, event_id, match_seq FROM (
             |  SELECT user_id AS key, 'A' AS step, a_id AS event_id,
             |    match_seq FROM starts
             |  UNION ALL
             |  SELECT s.user_id, 'B', o.event_id, s.match_seq
             |  FROM starts s JOIN ordered o
             |    ON o.user_id = s.user_id AND o.rn = s.b_rn) m
             |ORDER BY key, match_seq, step, event_id""".stripMargin)),

    // Open-ended quantifier (reference Pattern.timesOrMore —
    // Pattern.java:50): `signup error{2,} purchase` — an unbounded
    // lower-bounded run. Greedy consumes the WHOLE consecutive error
    // island (backtracking cannot shorten it: a handed-back position
    // holds an error, never the purchase), so a match is exactly a
    // signup, a maximal error run of length >= 2, and the purchase
    // immediately after the run.
    Query(
      "q_cep_times_or_more",
      (s, d) => cepQuery(s, d,
        Seq(Cep.Step("A", _.getString(3) == "signup"),
          Cep.Step("B", _.getString(3) == "error", Cep.timesOrMore(2)),
          Cep.Step("C", _.getString(3) == "purchase"))),
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |err AS (
             |  SELECT user_id, rn, event_id,
             |    rn - ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY rn) AS grp
             |  FROM ordered WHERE event_type = 'error'),
             |isl AS (
             |  SELECT user_id, grp, MIN(rn) AS r0, MAX(rn) AS r1,
             |    COUNT(1) AS len
             |  FROM err GROUP BY user_id, grp),
             |m AS (
             |  SELECT i.user_id, i.grp, i.r0, i.r1, a.event_id AS a_id,
             |    c.event_id AS c_id
             |  FROM isl i
             |  JOIN ordered a ON a.user_id = i.user_id AND a.rn = i.r0 - 1
             |    AND a.event_type = 'signup'
             |  JOIN ordered c ON c.user_id = i.user_id AND c.rn = i.r1 + 1
             |    AND c.event_type = 'purchase'
             |  WHERE i.len >= 2),
             |seq AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id
             |    ORDER BY r0) - 1 AS INT) AS match_seq FROM m)
             |SELECT key, step, event_id, match_seq FROM (
             |  SELECT user_id AS key, 'A' AS step, a_id AS event_id,
             |    match_seq FROM seq
             |  UNION ALL
             |  SELECT s.user_id, 'B', e.event_id, s.match_seq
             |  FROM seq s JOIN err e ON e.user_id = s.user_id
             |    AND e.rn BETWEEN s.r0 AND s.r1
             |  UNION ALL SELECT user_id, 'C', c_id, match_seq FROM seq) u
             |ORDER BY key, match_seq, step, event_id""".stripMargin)),

    // Predicate stop-condition (reference Pattern.until —
    // Pattern.java:50): after a signup, consume ANY run of non-signup
    // activity `until` a purchase appears; the purchase stops the loop
    // WITHOUT being consumed by it, and the next step takes it. The
    // observable difference from a plain greedy loop: the match closes
    // at the FIRST purchase after the signup (greedy-without-until
    // would swallow it and match a later one); a signup arriving before
    // any purchase kills the attempt (contiguity break, and no purchase
    // exists in the handed-back run for C to take).
    Query(
      "q_cep_until",
      (s, d) => cepQuery(s, d,
        Seq(Cep.Step("A", _.getString(3) == "signup"),
          Cep.Step("B", _.getString(3) != "signup", Cep.Plus,
            until = Some(_.getString(3) == "purchase")),
          Cep.Step("C", _.getString(3) == "purchase"))),
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |marks AS (
             |  SELECT user_id, rn, event_id, event_type FROM ordered
             |  WHERE event_type IN ('signup', 'purchase')),
             |nxt AS (
             |  SELECT user_id, rn, event_id, event_type,
             |    LEAD(event_type) OVER uw AS nt,
             |    LEAD(rn) OVER uw AS nrn,
             |    LEAD(event_id) OVER uw AS nid
             |  FROM marks WINDOW uw AS (PARTITION BY user_id ORDER BY rn)),
             |m AS (
             |  SELECT user_id, rn AS arn, event_id AS a_id,
             |    nrn AS crn, nid AS c_id
             |  FROM nxt
             |  WHERE event_type = 'signup' AND nt = 'purchase'
             |    AND nrn >= rn + 2),
             |seq AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id
             |    ORDER BY arn) - 1 AS INT) AS match_seq FROM m)
             |SELECT key, step, event_id, match_seq FROM (
             |  SELECT user_id AS key, 'A' AS step, a_id AS event_id,
             |    match_seq FROM seq
             |  UNION ALL
             |  SELECT s.user_id, 'B', o.event_id, s.match_seq
             |  FROM seq s JOIN ordered o ON o.user_id = s.user_id
             |    AND o.rn > s.arn AND o.rn < s.crn
             |  UNION ALL SELECT user_id, 'C', c_id, match_seq FROM seq) u
             |ORDER BY key, match_seq, step, event_id""".stripMargin)),

    // Quantified SEQUENCE group (reference GroupPattern.java —
    // flink-cep/.../pattern/GroupPattern.java): `(A B)+` repeats the
    // whole signup-error sub-sequence. Strict contiguity makes a match
    // exactly a maximal island of chained signup-error pairs (pair
    // starts 2 apart chain; a gap >= 3 breaks the island — a pair start
    // 1 apart is impossible since signup != error), which gaps-and-
    // islands SQL can enumerate: grp = rn - 2*ROW_NUMBER() is constant
    // within an island and strictly increases across islands.
    Query(
      "q_cep_group_plus",
      (s, d) => cepQuery(s, d,
        Seq(Cep.group(
          Cep.Step("A", _.getString(3) == "signup"),
          Cep.Step("B", _.getString(3) == "error")).copy(quant = Cep.Plus))),
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |pairs AS (
             |  SELECT o.user_id, o.rn, o.event_id AS a_id,
             |    n.event_id AS b_id
             |  FROM ordered o JOIN ordered n
             |    ON n.user_id = o.user_id AND n.rn = o.rn + 1
             |  WHERE o.event_type = 'signup' AND n.event_type = 'error'),
             |isl AS (
             |  SELECT user_id, rn, a_id, b_id,
             |    rn - 2 * ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY rn) AS grp
             |  FROM pairs),
             |seq AS (
             |  SELECT user_id, rn, a_id, b_id,
             |    CAST(DENSE_RANK() OVER (PARTITION BY user_id
             |      ORDER BY grp) - 1 AS INT) AS match_seq
             |  FROM isl)
             |SELECT key, step, event_id, match_seq FROM (
             |  SELECT user_id AS key, 'A' AS step, a_id AS event_id,
             |    match_seq FROM seq
             |  UNION ALL SELECT user_id, 'B', b_id, match_seq FROM seq) u
             |ORDER BY key, match_seq, step, event_id""".stripMargin)),

    // The same sequence group through the SQL surface: PATTERN ((A B)+)
    // with CLASSIFIER labeling each row by the consuming sub-step
    // (reference GroupPattern.java; the reference 1.13 SQL layer does
    // not parse group quantifiers — parity-plus, like SUBSET).
    Query(
      "q_cep_sql_group",
      (s, d) => {
        Catalog.registerViews(s, d, "events")
        graft.cep.MatchRecognize.sql(s,
          """SELECT user_id, event_id, mno, var
            |FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts, event_id
            |  MEASURES MATCH_NUMBER() AS mno, CLASSIFIER() AS var
            |  ALL ROWS PER MATCH
            |  AFTER MATCH SKIP PAST LAST ROW
            |  PATTERN ((A B)+)
            |  DEFINE A AS event_type = 'signup',
            |         B AS event_type = 'error'
            |)
            |ORDER BY user_id, mno, event_id""".stripMargin)
      },
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events),
             |pairs AS (
             |  SELECT o.user_id, o.rn, o.event_id AS a_id,
             |    n.event_id AS b_id
             |  FROM ordered o JOIN ordered n
             |    ON n.user_id = o.user_id AND n.rn = o.rn + 1
             |  WHERE o.event_type = 'signup' AND n.event_type = 'error'),
             |isl AS (
             |  SELECT user_id, rn, a_id, b_id,
             |    rn - 2 * ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY rn) AS grp
             |  FROM pairs),
             |seq AS (
             |  SELECT user_id, rn, a_id, b_id,
             |    CAST(DENSE_RANK() OVER (PARTITION BY user_id
             |      ORDER BY grp) - 1 AS INT) AS match_seq
             |  FROM isl)
             |SELECT user_id, event_id, mno, var FROM (
             |  SELECT user_id, a_id AS event_id, match_seq AS mno,
             |    'A' AS var FROM seq
             |  UNION ALL
             |  SELECT user_id, b_id, match_seq, 'B' FROM seq) u
             |ORDER BY user_id, mno, event_id""".stripMargin)),

    // Temporal / as-of join (reference TemporalRowTimeJoinOperator.java:78):
    // for each error, the latest signup of the same user at-or-before it.
    // Scalable pattern: union both sides, one shuffle on user_id, running
    // last_value(ignore nulls) over event time — no per-row point lookups.
    Query(
      "q_asof_join",
      (s, d) => {
        import graft.operators.Ops._
        val ev = t(s, d, "events")
        val errors = ev.where(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id"))
        val signups = ev.where(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_id").as("signup_id"))
        errors.asofJoin(signups, key = "user_id", leftTs = "ts",
            rightTs = "ts", payload = "signup_id", tieBreaker = "event_id",
            as = "asof_id")
          .select(col("event_id"), col("asof_id"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT e.event_id,
             |  (SELECT s.event_id FROM events s
             |   WHERE s.user_id = e.user_id AND s.event_type = 'signup'
             |     AND s.ts <= e.ts
             |   ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS asof_id
             |FROM events e
             |WHERE e.event_type = 'error'
             |ORDER BY e.event_id""".stripMargin),
      bench = true),

    // ChangelogNormalize, batch twin (reference
    // StreamExecChangelogNormalize.java:61): materialize a bounded
    // changelog into its final table — last version per key wins, a key
    // whose final version is a delete disappears. Orders plays the
    // changelog: key = o_custkey, version order = (o_orderdate,
    // o_orderkey), final status 'F' acts as the delete marker. The
    // streaming twin (Streams.changelogNormalizeStream /
    // ChangelogIngest) is round-trip-tested in StreamingSpec.
    Query(
      "q_changelog_ingest",
      (s, d) => {
        import graft.operators.Ops._
        t(s, d, "orders")
          .dedupKeepFirst(Seq(col("o_custkey")),
            Seq(desc("o_orderdate"), desc("o_orderkey")))
          .where(col("o_orderstatus") =!= "F")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
             |FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders) t
             |WHERE rn = 1 AND o_orderstatus <> 'F'
             |ORDER BY o_custkey""".stripMargin)))

  /** Run a CEP pattern over the events fixture (field 3 of the selected
    * frame is event_type) in the canonical output order. */
  private def cepQuery(s: org.apache.spark.sql.SparkSession, d: String,
      steps: Seq[Cep.Step],
      skip: Cep.SkipStrategy = Cep.SkipPastLast,
      withinMicros: Option[Long] = None): org.apache.spark.sql.DataFrame =
    Cep.matchPattern(
      t(s, d, "events").select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")),
      keyCol = "user_id", tsCol = "ts", idCol = "event_id",
      steps = steps, withinMicros = withinMicros, skip = skip)
      .orderBy(col("key"), col("match_seq"), col("step"), col("event_id"))
}
