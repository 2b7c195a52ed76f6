package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cep.Cep
import graft.queries.Catalog

/** NFA pattern matcher (reference flink-cep semantics): validated against
  * the window-function formulation for the `A B` class, plus quantifier
  * and within-horizon behavior on constructed timelines. */
class CepSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def mkEvents(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
  }

  test("A B (One One) matches equal the lead() formulation") {
    val events = graft.engine.Tables.load(spark, SparkFixture.sf, "events")
    val nfa = Cep.matchPattern(
      events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")),
      "user_id", "ts", "event_id",
      Seq(Cep.Step("A", _.getString(3) == "signup"),
        Cep.Step("B", _.getString(3) == "error")))
    val nfaPairs = nfa.collect()
      .groupBy(r => (r.getLong(0), r.getInt(3)))
      .map { case (_, rows) =>
        (rows.find(_.getString(1) == "A").get.getLong(2),
          rows.find(_.getString(1) == "B").get.getLong(2))
      }.toSet
    val leadPairs = Catalog.byName("q_cep_adjacent")
      .run(spark, SparkFixture.sf)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // lead() allows overlapping matches; NFA skips past each match — every
    // NFA match must be a lead()-pair, and every non-overlapping lead()
    // pair must be found
    assert(nfaPairs.nonEmpty)
    assert(nfaPairs.subsetOf(leadPairs))
  }

  test("streaming NFA across micro-batches equals batch NFA (A B)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    // stage the events fixture as two time-split files so partial matches
    // must survive a batch boundary
    val stage = java.nio.file.Files.createTempDirectory("graft_cep").toString
    val ev = graft.engine.Tables.load(spark, SparkFixture.sf, "events")
      .select("user_id", "ts", "event_id", "event_type")
    val mid = ev.selectExpr("percentile_approx(cast(ts as double), 0.5)")
      .collect().head.getDouble(0)
    ev.where(col("ts").cast("double") <= mid).coalesce(1)
      .write.parquet(s"$stage/f0")
    Thread.sleep(1100) // file-source ordering is by modification time
    ev.where(col("ts").cast("double") > mid).coalesce(1)
      .write.parquet(s"$stage/f1")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("event_type", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stage/*/")
    val steps = Seq(
      Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error"))
    val q = Cep.matchPatternStream(stream, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("t_cep").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = Cep.matchPattern(ev, "user_id", "ts", "event_id", steps)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("Plus quantifier consumes greedily") {
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "error"), (1L, 40L, 4L, "click"),
      (1L, 50L, 5L, "signup"), (1L, 60L, 6L, "error"))
    val m = Cep.signupThenErrors(events).collect()
    val bySeq = m.groupBy(_.getInt(3))
    assert(bySeq.size === 2)
    val first = bySeq(0).map(r => (r.getString(1), r.getLong(2))).toSet
    assert(first === Set(("A", 1L), ("B", 2L), ("B", 3L)))
    val second = bySeq(1).map(r => (r.getString(1), r.getLong(2))).toSet
    assert(second === Set(("A", 5L), ("B", 6L)))
  }

  test("strict contiguity rejects interleaved events") {
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "error"))
    assert(Cep.signupThenErrors(events).count() === 0)
  }

  private def runPattern(events: org.apache.spark.sql.DataFrame,
      spec: String, preds: Map[String, org.apache.spark.sql.Row => Boolean],
      skip: Cep.SkipStrategy = Cep.SkipPastLast) =
    Cep.matchPattern(events, "user_id", "ts", "event_id",
        Cep.pattern(spec, preds), skip = skip)
      .collect()
      .map(r => (r.getInt(3), r.getString(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSet).toMap

  private val typePreds: Map[String, org.apache.spark.sql.Row => Boolean] =
    Map("A" -> (_.getString(3) == "signup"),
      "B" -> (_.getString(3) == "purchase"),
      "E" -> (_.getString(3) == "error"),
      "ERR" -> (_.getString(3) == "error"))

  test("followedBy skips non-matching noise; skip-past-last resumes after" +
      " the real last consumed event") {
    // s1 s2 p1 s3 c p2: first match pairs s1 with p1 ACROSS s2 (relaxed
    // gap); skip-past-last must resume after p1's true position — the
    // interleaved s2 is consumed-over and never matches — then s3+p2
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "signup"),
      (1L, 30L, 3L, "purchase"), (1L, 40L, 4L, "signup"),
      (1L, 50L, 5L, "click"), (1L, 60L, 6L, "purchase"))
    val m = runPattern(events, "A ~> B", typePreds)
    assert(m === Map(
      0 -> Set(("A", 1L), ("B", 3L)),
      1 -> Set(("A", 4L), ("B", 6L))))
  }

  test("strict next fails where followedBy matches") {
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "purchase"))
    assert(runPattern(events, "A B", typePreds).isEmpty)
    assert(runPattern(events, "A ~> B", typePreds) ===
      Map(0 -> Set(("A", 1L), ("B", 3L))))
  }

  test("quantified relaxed step skips noise between its iterations") {
    // signup, errors interleaved with clicks: relaxed ERR+ collects all
    // three errors (internal relaxed contiguity, the reference's default
    // for followedBy loops); strict ERR+ takes none (click after signup)
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "error"), (1L, 40L, 4L, "view"),
      (1L, 50L, 5L, "error"), (1L, 60L, 6L, "error"))
    val m = runPattern(events, "A ~> ERR+", typePreds)
    assert(m === Map(0 -> Set(("A", 1L), ("ERR", 3L), ("ERR", 5L),
      ("ERR", 6L))))
    assert(runPattern(events, "A ERR+", typePreds).isEmpty)
  }

  test("notFollowedBy kills a match whose gap contains the guard event") {
    val bad = mkEvents( // error before the first purchase → dead
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "error"), (1L, 40L, 4L, "purchase"))
    val good = mkEvents( // error only after the purchase → survives
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "purchase"), (1L, 40L, 4L, "error"))
    assert(runPattern(bad, "A ~> !E ~> B", typePreds).isEmpty)
    assert(runPattern(good, "A ~> !E ~> B", typePreds) ===
      Map(0 -> Set(("A", 1L), ("B", 3L))))
  }

  test("notNext guards only the immediately-following event") {
    val immediate = mkEvents( // error right after signup → dead
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "purchase"))
    val later = mkEvents( // error later in the gap → fine for notNext
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "error"), (1L, 40L, 4L, "purchase"))
    assert(runPattern(immediate, "A !E ~> B", typePreds).isEmpty)
    assert(runPattern(later, "A !E ~> B", typePreds) ===
      Map(0 -> Set(("A", 1L), ("B", 4L))))
    // the same timeline dies under notFollowedBy (whole-gap guard)
    assert(runPattern(later, "A ~> !E ~> B", typePreds).isEmpty)
  }

  test("alternation consumes mixed runs, labeling by matching alternative") {
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "click"), (1L, 40L, 4L, "error"),
      (1L, 50L, 5L, "purchase"))
    val m = runPattern(events, "A (E|C)+ P", typePreds ++ Map[String,
        org.apache.spark.sql.Row => Boolean](
      "C" -> (_.getString(3) == "click"),
      "P" -> (_.getString(3) == "purchase")))
    assert(m === Map(0 -> Set(("A", 1L), ("E", 2L), ("C", 3L),
      ("E", 4L), ("P", 5L))))
    // a pure-single-type pattern rejects the mixed run
    assert(runPattern(events, "A ERR+ B", typePreds).isEmpty)
  }

  test("alternation: overlapping alternatives label by declaration order") {
    // 'high' matches BOTH alternatives → first declared (H) wins; the
    // classifier is deterministic, not predicate-set-dependent
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"))
    val preds: Map[String, org.apache.spark.sql.Row => Boolean] = Map(
      "A" -> (_.getString(3) == "signup"),
      "H" -> (_.getString(3) == "error"),
      "E" -> (_.getString(3) == "error"))
    val m = runPattern(events, "A (H|E)+", preds)
    assert(m === Map(0 -> Set(("A", 1L), ("H", 2L))))
  }

  test("alternation backtracking hands back run events like a plain step") {
    // greedy (E|C)+ takes e c e, P needs the purchase right after — the
    // run cannot shorten (the handed-back event is not a purchase), so
    // only the maximal-run match exists; with the purchase mid-run the
    // pattern must match the shorter prefix ending right before it
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "purchase"), (1L, 40L, 4L, "click"))
    val preds = typePreds ++ Map[String,
        org.apache.spark.sql.Row => Boolean](
      "C" -> (_.getString(3) == "click"),
      "P" -> (_.getString(3) == "purchase"))
    val m = runPattern(events, "A (E|C)+ P", preds)
    assert(m === Map(0 -> Set(("A", 1L), ("E", 2L), ("P", 3L))))
  }

  test("streaming NFA alternation labels equal batch across batches") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val preds = typePreds ++ Map[String,
        org.apache.spark.sql.Row => Boolean](
      "C" -> (_.getString(3) == "click"),
      "P" -> (_.getString(3) == "purchase"))
    val steps = Cep.pattern("A (E|C)+ P", preds)
    val rows = Seq(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "click"), (1L, 40L, 4L, "error"),
      (1L, 50L, 5L, "purchase"), (2L, 10L, 20L, "signup"),
      (2L, 20L, 21L, "click"), (2L, 30L, 22L, "purchase"))
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep_alt")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // split mid-run so the alternation run spans the batch boundary
    mem.addData(rows.take(3).toIndexedSeq); q.processAllAvailable()
    mem.addData(rows.drop(3).toIndexedSeq); q.processAllAvailable()
    val got = spark.table("t_cep_alt").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    q.stop()
    val want = Cep.matchPattern(mkEvents(rows: _*), "user_id", "ts",
        "event_id", steps)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3).toLong)).toSet
    assert(got === want)
    assert(got.exists(_._2 == "E") && got.exists(_._2 == "C"))
  }

  test("relaxed scan respects the within horizon") {
    // purchase exists but beyond the 60 s window → the relaxed scan
    // stops at the horizon, no match; a purchase inside matches
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "click"),
      (1L, 200L, 3L, "purchase"),
      (2L, 10L, 10L, "signup"), (2L, 30L, 11L, "purchase"))
    val m = Cep.matchPattern(events, "user_id", "ts", "event_id",
        Cep.pattern("A ~> B", typePreds),
        withinMicros = Some(60L * 1000000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(m === Set((2L, "A", 10L), (2L, "B", 11L)))
  }

  test("pattern validation rejects malformed relaxed/negated specs") {
    intercept[IllegalArgumentException] {
      Cep.matchPattern(mkEvents((1L, 10L, 1L, "signup")),
        "user_id", "ts", "event_id",
        Cep.pattern("!E ~> B", typePreds)).collect()
    }
    intercept[IllegalArgumentException] {
      Cep.pattern("A ~> ~> B", typePreds)
    }
    intercept[IllegalArgumentException] {
      Cep.pattern("A !E+ B", typePreds)
    }
    intercept[IllegalArgumentException] { // trailing notFollowedBy
      Cep.matchPattern(mkEvents((1L, 10L, 1L, "signup")),
        "user_id", "ts", "event_id",
        Cep.pattern("A ~> !E", typePreds)).collect()
    }
    // leading '~>' has nothing to relax — worst in a group body, where a
    // relaxed HEAD sub-step would silently attach iterations relaxed
    // even though the group is declared strict
    intercept[IllegalArgumentException] {
      Cep.pattern("(~> A B)+", typePreds)
    }
    intercept[IllegalArgumentException] {
      Cep.pattern("~> A B", typePreds)
    }
  }

  test("streaming NFA equals batch NFA on relaxed + negated patterns") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // fixture slice, split mid-timeline so gaps span batch boundaries
    val ev = graft.engine.Tables.load(spark, SparkFixture.sf, "events")
      .select("user_id", "ts", "event_id", "event_type")
      .where(col("user_id") < 200)
    val rows = ev.collect().map(r => (r.getLong(0),
      r.getTimestamp(1).getTime / 1000, r.getLong(2), r.getString(3)))
      .sortBy(t => (t._2, t._3))
    for (spec <- Seq("A ~> B", "A ~> !E ~> B", "A !E ~> B")) {
      val steps = Cep.pattern(spec, typePreds)
      val mem = MemoryStream[(Long, Long, Long, String)]
      val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
        .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
      val name = "t_cep_relaxed_" + spec.count(_ == '>')
      val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id",
          steps, skip = Cep.SkipToNext)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
      // a terminal event per key closes every key's open tail: purchases
      // close relaxed B-scans, and the guard-free type closes notNext
      // (timestamps past the fixture's max so batch order == arrival order)
      val maxSec = rows.map(_._2).max
      val closers = rows.map(_._1).distinct.zipWithIndex.map {
        case (u, i) => (u, maxSec + 100 + i, 900000L + i, "purchase")
      }
      mem.addData(closers.toIndexedSeq); q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      q.stop()
      val closed = mkEvents((rows ++ closers).toIndexedSeq: _*)
      val want = Cep.matchPattern(closed, "user_id", "ts", "event_id",
          steps, skip = Cep.SkipToNext)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getInt(3).toLong)).toSet
      assert(got === want, s"stream/batch divergence for '$spec'")
      assert(got.nonEmpty, s"vacuous parity for '$spec'")
    }
  }

  test("event-time streaming NFA reorders across micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val steps = Seq(
      Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error"))
    def feed(eventTime: Boolean, name: String) = {
      val mem = MemoryStream[(Long, Long, Long, String)]
      val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
        .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
        .withWatermark("ts", "2 minutes")
      val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id",
          steps, eventTime = eventTime)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      // the ERROR arrives a batch BEFORE the earlier signup (out of
      // order across batches, inside the 2 min watermark delay); a
      // later event then advances the watermark past both
      mem.addData((1L, 100L, 2L, "error")); q.processAllAvailable()
      mem.addData((1L, 50L, 1L, "signup")); q.processAllAvailable()
      mem.addData((1L, 500L, 9L, "view")); q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getString(1), r.getLong(2))).toSet
      q.stop()
      got
    }
    // event-time mode: the pending buffer re-establishes (ts, id) order
    // once the watermark passes — signup@50 then error@100 match A B,
    // exactly the batch scan of the time-sorted data
    assert(feed(eventTime = true, "t_cep_et") ===
      Set(("A", 1L), ("B", 2L)))
    // arrival mode (the default): the error precedes the signup in the
    // NFA buffer — no match; this is the documented proctime contract
    assert(feed(eventTime = false, "t_cep_arr") === Set.empty)
  }

  test("streaming NFA within-horizon abandons stale partial matches") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val steps = Seq(
      Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error"))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps,
        withinMicros = Some(60L * 1000000L))
      .writeStream.format("memory").queryName("t_cep_within")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // u1: signup then error 2h later (beyond within) → no match
    // u2: signup then error 30s later (inside within, across batches) → match
    mem.addData((1L, 0L, 1L, "signup"), (2L, 0L, 10L, "signup"))
    q.processAllAvailable()
    mem.addData((1L, 7200L, 2L, "error"), (2L, 30L, 11L, "error"))
    q.processAllAvailable()
    val rows = spark.table("t_cep_within").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows === Set((2L, "A", 10L), (2L, "B", 11L)))
  }

  test("streaming NFA with trailing Plus closes greedy tails across batches") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val steps = Seq(
      Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error", Cep.Plus))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep_plus")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // batch 1 opens a greedy tail (signup error); the tail must stay open
    // over the boundary, absorb batch 2's error, close on the click, and
    // the click must not break the later A B match
    mem.addData((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"))
    q.processAllAvailable()
    mem.addData((1L, 30L, 3L, "error"), (1L, 40L, 4L, "click"),
      (1L, 50L, 5L, "signup"), (1L, 60L, 6L, "error"), (1L, 70L, 7L, "view"))
    q.processAllAvailable()
    val rows = spark.table("t_cep_plus").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    q.stop()
    assert(rows === Set(
      (1L, "A", 1L, 0L), (1L, "B", 2L, 0L), (1L, "B", 3L, 0L),
      (1L, "A", 5L, 1L), (1L, "B", 6L, 1L)))
    // and the batch NFA on the same timeline agrees on the closed matches
    val batch = Cep.matchPattern(
      mkEvents((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
        (1L, 30L, 3L, "error"), (1L, 40L, 4L, "click"),
        (1L, 50L, 5L, "signup"), (1L, 60L, 6L, "error"),
        (1L, 70L, 7L, "view")),
      "user_id", "ts", "event_id", steps).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3).toLong)).toSet
    assert(batch === rows)
  }

  test("streaming NFA with an interior Plus: suffix closes the match across batches") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val steps = Seq(
      Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error", Cep.Plus),
      Cep.Step("C", _.getString(3) == "purchase"))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep_interior")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // tail opens in batch 1; batch 2 extends it and the purchase closes
    // the match through the suffix — then a second signup run dies on a
    // view (no suffix entry)
    mem.addData((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"))
    q.processAllAvailable()
    mem.addData((1L, 30L, 3L, "error"), (1L, 40L, 4L, "purchase"),
      (1L, 50L, 5L, "signup"), (1L, 60L, 6L, "error"), (1L, 70L, 7L, "view"))
    q.processAllAvailable()
    val rows = spark.table("t_cep_interior").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    q.stop()
    assert(rows === Set((1L, "A", 1L, 0L), (1L, "B", 2L, 0L),
      (1L, "B", 3L, 0L), (1L, "C", 4L, 0L)))
    // batch NFA agrees on the full timeline
    val batch = Cep.matchPattern(
      mkEvents((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
        (1L, 30L, 3L, "error"), (1L, 40L, 4L, "purchase"),
        (1L, 50L, 5L, "signup"), (1L, 60L, 6L, "error"),
        (1L, 70L, 7L, "view")),
      "user_id", "ts", "event_id", steps).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3).toLong)).toSet
    assert(batch === rows)
  }

  test("streaming NFA interior Plus with a two-step suffix; mid-suffix death recovers") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val steps = Seq(
      Cep.Step("B", _.getString(3) == "error", Cep.Plus),
      Cep.Step("C", _.getString(3) == "purchase"),
      Cep.Step("D", _.getString(3) == "click"))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep_suf2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // u1: e e p c → full match through the 2-step suffix
    // u2: e p e — suffix dies mid-way (error ≠ click); the killing error
    // then re-opens a fresh tail, closed by p c in the next batch
    mem.addData((1L, 10L, 1L, "error"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "purchase"), (1L, 40L, 4L, "click"),
      (2L, 10L, 10L, "error"), (2L, 20L, 11L, "purchase"),
      (2L, 30L, 12L, "error"))
    q.processAllAvailable()
    mem.addData((2L, 40L, 13L, "purchase"), (2L, 50L, 14L, "click"))
    q.processAllAvailable()
    val rows = spark.table("t_cep_suf2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows === Set(
      (1L, "B", 1L), (1L, "B", 2L), (1L, "C", 3L), (1L, "D", 4L),
      (2L, "B", 12L), (2L, "C", 13L), (2L, "D", 14L)))
  }

  test("streaming NFA with a bounded Times tail emits at capacity and drops below min") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val steps = Seq(
      Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error", Cep.Times(2, 3)))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep_btimes")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // u1: 4 errors → capacity-3 match emits WITHOUT a closing event (the
    // 3rd error lands in batch 2, so the tail also crossed a boundary);
    // the 4th error alone can't re-match (no signup)
    mem.addData((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"))
    q.processAllAvailable()
    mem.addData((1L, 30L, 3L, "error"), (1L, 40L, 4L, "error"),
      (1L, 50L, 5L, "error"),
      // u2: one error then a click → below min 2, dropped entirely
      (2L, 10L, 10L, "signup"), (2L, 20L, 11L, "error"),
      (2L, 30L, 12L, "click"),
      // u3: exactly 2 errors closed by a click → emits on the click
      (3L, 10L, 20L, "signup"), (3L, 20L, 21L, "error"),
      (3L, 30L, 22L, "error"), (3L, 40L, 23L, "click"))
    q.processAllAvailable()
    val rows = spark.table("t_cep_btimes").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows === Set(
      (1L, "A", 1L), (1L, "B", 2L), (1L, "B", 3L), (1L, "B", 4L),
      (3L, "A", 20L), (3L, "B", 21L), (3L, "B", 22L)))
  }

  test("streaming NFA flushes an open greedy tail when the horizon expires") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
      .withWatermark("ts", "0 seconds")
    val steps = Seq(
      Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error", Cep.Plus))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps,
        withinMicros = Some(60L * 1000000L), flushOnHorizon = true)
      .writeStream.format("memory").queryName("t_cep_flush")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // u1 opens a greedy tail; no closing event for u1 ever arrives
    // (timestamps start above 0: with a 0-second watermark delay the
    // initial watermark is 0 and a ts=0 row would be dropped as late)
    mem.addData((1L, 100L, 1L, "signup"), (1L, 110L, 2L, "error"))
    q.processAllAvailable()
    // another user's far-future event drives the watermark past u1's
    // 60 s horizon → the open tail must flush as a completed match
    mem.addData((2L, 500L, 10L, "view"))
    q.processAllAvailable()
    mem.addData((3L, 1000L, 20L, "view"))
    q.processAllAvailable()
    val rows = spark.table("t_cep_flush").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows === Set((1L, "A", 1L), (1L, "B", 2L)))
  }

  test("streaming NFA replays self-overlapping prefixes (A A B over A A A B)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val steps = Seq(
      Cep.Step("A1", _.getString(3) == "click"),
      Cep.Step("A2", _.getString(3) == "click"),
      Cep.Step("B", _.getString(3) == "error"))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep_overlap")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // click click click error: the match starts at the SECOND click — a
    // failed partial must slide, not restart at the failing event; split
    // across batches so the slide happens against carried-over state
    mem.addData((1L, 10L, 1L, "click"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "click"))
    q.processAllAvailable()
    mem.addData((1L, 40L, 4L, "error"))
    q.processAllAvailable()
    val got = spark.table("t_cep_overlap").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(got === Set(("A1", 2L), ("A2", 3L), ("B", 4L)))
    // batch NFA finds the same match
    val batch = Cep.matchPattern(
      mkEvents((1L, 10L, 1L, "click"), (1L, 20L, 2L, "click"),
        (1L, 30L, 3L, "click"), (1L, 40L, 4L, "error")),
      "user_id", "ts", "event_id", steps)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(batch === got)
  }

  test("streaming NFA trailing reluctant Plus emits the shortest match immediately") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val steps = Cep.pattern("A B+?", Map(
      "A" -> ((r: org.apache.spark.sql.Row) => r.getString(3) == "signup"),
      "B" -> ((r: org.apache.spark.sql.Row) => r.getString(3) == "error")))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep_reluctant")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // reluctant tail: the match closes on the FIRST error — no closing
    // event or horizon needed (a greedy B+ would hold the tail open)
    mem.addData((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"))
    q.processAllAvailable()
    val early = spark.table("t_cep_reluctant").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    assert(early === Set(("A", 1L), ("B", 2L)),
      "reluctant match must emit before any closing event")
    // later errors have no signup anchor → nothing more
    mem.addData((1L, 30L, 3L, "error"), (1L, 40L, 4L, "error"))
    q.processAllAvailable()
    val all = spark.table("t_cep_reluctant").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(all === early)
    val batch = Cep.matchPattern(
      mkEvents((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
        (1L, 30L, 3L, "error"), (1L, 40L, 4L, "error")),
      "user_id", "ts", "event_id", steps)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(batch === all)
  }

  test("streaming NFA interior reluctant quantifier completes across batches") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val steps = Cep.pattern("A B{1,3}? C", Map(
      "A" -> ((r: org.apache.spark.sql.Row) => r.getString(3) == "signup"),
      "B" -> ((r: org.apache.spark.sql.Row) => r.getString(3) == "error"),
      "C" -> ((r: org.apache.spark.sql.Row) => r.getString(3) == "purchase")))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep_rel_interior")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // the reluctant run grows only because C hasn't arrived; the partial
    // (with two consumed errors) must survive the batch boundary
    mem.addData((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"))
    q.processAllAvailable()
    mem.addData((1L, 30L, 3L, "error"), (1L, 40L, 4L, "purchase"),
      // u2: errors exceed the {1,3} bound before the purchase → dead
      (2L, 10L, 10L, "signup"), (2L, 20L, 11L, "error"),
      (2L, 30L, 12L, "error"), (2L, 40L, 13L, "error"),
      (2L, 50L, 14L, "error"), (2L, 60L, 15L, "purchase"))
    q.processAllAvailable()
    val got = spark.table("t_cep_rel_interior").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(got === Set((1L, "A", 1L), (1L, "B", 2L), (1L, "B", 3L),
      (1L, "C", 4L)))
    val batch = Cep.matchPattern(
      mkEvents((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
        (1L, 30L, 3L, "error"), (1L, 40L, 4L, "purchase"),
        (2L, 10L, 10L, "signup"), (2L, 20L, 11L, "error"),
        (2L, 30L, 12L, "error"), (2L, 40L, 13L, "error"),
        (2L, 50L, 14L, "error"), (2L, 60L, 15L, "purchase")),
      "user_id", "ts", "event_id", steps)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(batch === got)
  }

  test("streaming NFA handles multiple quantifiers and overlapping predicates") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    // two quantified steps, predicates NOT disjoint (C accepts errors
    // too): the old single-quantifier machine rejected this outright
    val steps = Cep.pattern("A+ B{1,2} C", Map(
      "A" -> ((r: org.apache.spark.sql.Row) => r.getString(3) == "click"),
      "B" -> ((r: org.apache.spark.sql.Row) => r.getString(3) == "error"),
      "C" -> ((r: org.apache.spark.sql.Row) =>
        r.getString(3) == "error" || r.getString(3) == "purchase")))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep_multi_quant")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // soup split mid-pattern: click click | click error error | error …
    // greedy B{1,2} wants two errors, then C must take the third
    val soup = Seq(
      (1L, 10L, 1L, "click"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "click"), (1L, 40L, 4L, "error"),
      (1L, 50L, 5L, "error"), (1L, 60L, 6L, "error"),
      // second match for the same key plus a closing signup so nothing
      // is held open at stream end
      (1L, 70L, 7L, "click"), (1L, 80L, 8L, "error"),
      (1L, 90L, 9L, "purchase"), (1L, 100L, 10L, "signup"))
    mem.addData(soup.slice(0, 2): _*)
    q.processAllAvailable()
    mem.addData(soup.slice(2, 5): _*)
    q.processAllAvailable()
    mem.addData(soup.slice(5, 10): _*)
    q.processAllAvailable()
    val got = spark.table("t_cep_multi_quant").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    q.stop()
    val batch = Cep.matchPattern(mkEvents(soup: _*),
      "user_id", "ts", "event_id", steps)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("streaming NFA honors after-match skip strategies (to-next overlaps)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    // self-overlapping error{2} with SKIP TO NEXT: a run of 4 errors
    // yields 3 overlapping matches; the run crosses a batch boundary
    val steps = Seq(Cep.Step("E", _.getString(3) == "error",
      Cep.Times(2, 2)))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps,
        skip = Cep.SkipToNext)
      .writeStream.format("memory").queryName("t_cep_skipnext")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData((1L, 10L, 1L, "error"), (1L, 20L, 2L, "error"))
    q.processAllAvailable()
    mem.addData((1L, 30L, 3L, "error"), (1L, 40L, 4L, "error"),
      (1L, 50L, 5L, "click"))
    q.processAllAvailable()
    val got = spark.table("t_cep_skipnext").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSet
    q.stop()
    val batch = Cep.matchPattern(
      mkEvents((1L, 10L, 1L, "error"), (1L, 20L, 2L, "error"),
        (1L, 30L, 3L, "error"), (1L, 40L, 4L, "error"),
        (1L, 50L, 5L, "click")),
      "user_id", "ts", "event_id", steps, skip = Cep.SkipToNext)
      .collect().map(r => (r.getLong(2), r.getInt(3).toLong)).toSet
    assert(got === batch)
    assert(got.map(_._2).size === 3) // three overlapping matches
  }

  test("within horizon bounds a match") {
    val events = mkEvents(
      (1L, 0L, 1L, "signup"), (1L, 3600L, 2L, "error"))
    val bounded = Cep.matchPattern(events, "user_id", "ts", "event_id",
      Seq(Cep.Step("A", _.getString(3) == "signup"),
        Cep.Step("B", _.getString(3) == "error")),
      withinMicros = Some(60L * 1000000L))
    assert(bounded.count() === 0)
    val unbounded = Cep.signupThenErrors(events)
    assert(unbounded.count() === 2) // A + B rows of one match
  }

  private def matchSets(df: org.apache.spark.sql.DataFrame) =
    df.collect().groupBy(_.getInt(3)).toSeq.sortBy(_._1).map(_._2
      .map(r => (r.getString(1), r.getLong(2))).toSet)

  test("Opt quantifier matches zero or one, greedily") {
    val steps = Seq(Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error", Cep.Opt),
      Cep.Step("C", _.getString(3) == "purchase"))
    // one with the optional error, one without
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "purchase"),
      (1L, 40L, 4L, "signup"), (1L, 50L, 5L, "purchase"))
    val m = matchSets(
      Cep.matchPattern(events, "user_id", "ts", "event_id", steps))
    assert(m === Seq(Set(("A", 1L), ("B", 2L), ("C", 3L)),
      Set(("A", 4L), ("C", 5L))))
  }

  test("Times backtracks when greedy consumption starves a later step") {
    val steps = Seq(Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error", Cep.Times(1, 2)),
      Cep.Step("C", _.getString(3) == "purchase"))
    // greedy would take both errors at 20/30 and fail; the 2-error match
    // only works because purchase follows — then a 1-error match
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "error"), (1L, 40L, 4L, "purchase"),
      (1L, 50L, 5L, "signup"), (1L, 60L, 6L, "error"),
      (1L, 70L, 7L, "purchase"))
    val m = matchSets(
      Cep.matchPattern(events, "user_id", "ts", "event_id", steps))
    assert(m === Seq(Set(("A", 1L), ("B", 2L), ("B", 3L), ("C", 4L)),
      Set(("A", 5L), ("B", 6L), ("C", 7L))))
    // three errors: greedy Times(1,2) takes 2 then backtracking is not
    // needed; the third error breaks contiguity to purchase → no match
    val events2 = mkEvents(
      (2L, 10L, 1L, "signup"), (2L, 20L, 2L, "error"),
      (2L, 30L, 3L, "error"), (2L, 40L, 4L, "error"),
      (2L, 50L, 5L, "purchase"))
    assert(Cep.matchPattern(events2, "user_id", "ts", "event_id", steps)
      .count() === 0)
  }

  test("reluctant Times consumes the fewest events that still match") {
    // pattern: signup error{1,2}? click-or-error C — over signup e e c:
    // greedy B takes both errors; reluctant B takes one and lets C take
    // the second error
    val stepsReluctant = Seq(Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error", Cep.Times(1, 2, greedy = false)),
      Cep.Step("C", r => r.getString(3) == "error" || r.getString(3) == "click"))
    val stepsGreedy = Seq(Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error", Cep.Times(1, 2)),
      Cep.Step("C", r => r.getString(3) == "error" || r.getString(3) == "click"))
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "error"), (1L, 40L, 4L, "click"))
    val rel = matchSets(
      Cep.matchPattern(events, "user_id", "ts", "event_id", stepsReluctant))
    assert(rel === Seq(Set(("A", 1L), ("B", 2L), ("C", 3L))))
    val gre = matchSets(
      Cep.matchPattern(events, "user_id", "ts", "event_id", stepsGreedy))
    assert(gre === Seq(Set(("A", 1L), ("B", 2L), ("B", 3L), ("C", 4L))))
  }

  test("skip-to-first/last resume the scan inside the match") {
    // pattern B=error{1,2} C=click over: error error click click
    val steps = Seq(
      Cep.Step("B", _.getString(3) == "error", Cep.Times(1, 2)),
      Cep.Step("C", _.getString(3) == "click"))
    val events = mkEvents(
      (1L, 10L, 1L, "error"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "click"), (1L, 40L, 4L, "click"))
    // skip-to-last(B): resume at the 2nd error → a second, overlapping
    // match (error2, click3)
    val toLastB = matchSets(Cep.matchPattern(events, "user_id", "ts",
      "event_id", steps, skip = Cep.SkipToLast("B")))
    assert(toLastB === Seq(
      Set(("B", 1L), ("B", 2L), ("C", 3L)),
      Set(("B", 2L), ("C", 3L))))
    // skip-to-first(C): resume at click3 — no error there, so exactly one
    // match (distinguishes from skip-to-next, which would re-match at
    // error2)
    val toFirstC = matchSets(Cep.matchPattern(events, "user_id", "ts",
      "event_id", steps, skip = Cep.SkipToFirst("C")))
    assert(toFirstC === Seq(Set(("B", 1L), ("B", 2L), ("C", 3L))))
    // and skip-to-first of the starting step advances one event instead
    // of looping forever (the reference throws here)
    val toFirstB = Cep.matchPattern(events, "user_id", "ts", "event_id",
      steps, skip = Cep.SkipToFirst("B"))
    assert(toFirstB.select("match_seq").distinct().count() === 2)
  }

  test("pattern string parser covers the quantifier grammar") {
    val preds: Map[String, org.apache.spark.sql.Row => Boolean] = Map(
      "signup" -> (_.getString(3) == "signup"),
      "error" -> (_.getString(3) == "error"),
      "purchase" -> (_.getString(3) == "purchase"))
    val steps = Cep.pattern("signup error+ purchase?", preds)
    assert(steps.map(s => (s.name, s.quant)) === Seq(
      ("signup", Cep.One), ("error", Cep.Plus), ("purchase", Cep.Opt)))
    val steps2 = Cep.pattern("error{2} signup{1,3}? purchase{2,}", preds)
    assert(steps2.map(_.quant) === Seq(Cep.Times(2, 2),
      Cep.Times(1, 3, greedy = false), Cep.Times(2, Int.MaxValue)))
    // reluctant optional and reluctant plus
    assert(Cep.pattern("error?? signup+?", preds).map(_.quant) ===
      Seq(Cep.Times(0, 1, greedy = false),
        Cep.Times(1, Int.MaxValue, greedy = false)))
    // parsed pattern runs identically to hand-built steps
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "error"), (1L, 40L, 4L, "purchase"))
    val viaParser = Cep.matchPattern(events, "user_id", "ts", "event_id",
      Cep.pattern("signup error+ purchase?", preds)).collect().toSet
    val viaSteps = Cep.matchPattern(events, "user_id", "ts", "event_id",
      Seq(Cep.Step("signup", preds("signup")),
        Cep.Step("error", preds("error"), Cep.Plus),
        Cep.Step("purchase", preds("purchase"), Cep.Opt)))
      .collect().toSet
    assert(viaParser === viaSteps && viaParser.nonEmpty)
    intercept[IllegalArgumentException] {
      Cep.pattern("signup unknown+", preds)
    }
  }

  test("skip strategies: past-last tiles runs, to-next overlaps") {
    val steps = Seq(Cep.Step("B", _.getString(3) == "error",
      Cep.Times(2, 2)))
    val events = mkEvents(
      (1L, 10L, 1L, "error"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "error"), (1L, 40L, 4L, "error"))
    val past = matchSets(
      Cep.matchPattern(events, "user_id", "ts", "event_id", steps))
    assert(past === Seq(Set(("B", 1L), ("B", 2L)), Set(("B", 3L), ("B", 4L))))
    val next = matchSets(Cep.matchPattern(events, "user_id", "ts",
      "event_id", steps, skip = Cep.SkipToNext))
    assert(next === Seq(Set(("B", 1L), ("B", 2L)), Set(("B", 2L), ("B", 3L)),
      Set(("B", 3L), ("B", 4L))))
  }

  private def groupAB(q: Cep.Quant = Cep.Plus) = Cep.group(
    Cep.Step("A", _.getString(3) == "signup"),
    Cep.Step("B", _.getString(3) == "error")).copy(quant = q)

  test("sequence group (A B)+ repeats the whole sub-sequence greedily") {
    // reference GroupPattern.java: the quantifier loops the SEQUENCE —
    // two complete signup-error runs form ONE match; the click ends the
    // island; the trailing pair is its own match
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "error"),
      (1L, 50L, 5L, "click"),
      (1L, 60L, 6L, "signup"), (1L, 70L, 7L, "error"))
    val got = matchSets(Cep.matchPattern(events, "user_id", "ts",
      "event_id", Seq(groupAB())))
    assert(got === Seq(
      Set(("A", 1L), ("B", 2L), ("A", 3L), ("B", 4L)),
      Set(("A", 6L), ("B", 7L))))
    // a half-iteration never matches: signup with no error after it
    val half = Cep.matchPattern(
      mkEvents((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "click")),
      "user_id", "ts", "event_id", Seq(groupAB()))
    assert(half.count() === 0)
  }

  test("sequence group hands back an iteration when a later step starves") {
    // (A B)+ C with C = signup: greedy takes both iterations, then no
    // signup remains for C — the group hands the second iteration back
    val steps = Seq(groupAB(), Cep.Step("C", _.getString(3) == "signup"))
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "error"))
    val got = matchSets(Cep.matchPattern(events, "user_id", "ts",
      "event_id", steps))
    assert(got === Seq(Set(("A", 1L), ("B", 2L), ("C", 3L))))
  }

  test("bounded group {1,2} caps iterations; relaxed group skips noise " +
      "between them") {
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "error"),
      (1L, 50L, 5L, "signup"), (1L, 60L, 6L, "error"))
    // {1,2}: three contiguous iterations split 2 + 1 under skip-past-last
    val capped = matchSets(Cep.matchPattern(events, "user_id", "ts",
      "event_id", Seq(groupAB(Cep.Times(1, 2)))))
    assert(capped === Seq(
      Set(("A", 1L), ("B", 2L), ("A", 3L), ("B", 4L)),
      Set(("A", 5L), ("B", 6L))))
    // relaxed group: noise between iterations is skipped over, one match
    val noisy = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "click"),
      (1L, 40L, 4L, "signup"), (1L, 50L, 5L, "error"))
    val relaxed = matchSets(Cep.matchPattern(noisy, "user_id", "ts",
      "event_id", Seq(groupAB().copy(relaxed = true))))
    assert(relaxed === Seq(
      Set(("A", 1L), ("B", 2L), ("A", 4L), ("B", 5L))))
    // strict group on the same data: the click splits the island
    val strict = matchSets(Cep.matchPattern(noisy, "user_id", "ts",
      "event_id", Seq(groupAB())))
    assert(strict === Seq(
      Set(("A", 1L), ("B", 2L)), Set(("A", 4L), ("B", 5L))))
  }

  test("group until stops the iteration loop at the boundary event") {
    val g = groupAB(Cep.timesOrMore(1))
      .copy(until = Some(_.getString(3) == "purchase"))
    val steps = Seq(g, Cep.Step("P", _.getString(3) == "purchase"))
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "error"),
      (1L, 50L, 5L, "purchase"),
      (1L, 60L, 6L, "signup"), (1L, 70L, 7L, "error"))
    val got = matchSets(Cep.matchPattern(events, "user_id", "ts",
      "event_id", steps))
    // the stop event is left for P; the tail pair has no purchase → no
    // second match
    assert(got === Seq(Set(("A", 1L), ("B", 2L), ("A", 3L), ("B", 4L),
      ("P", 5L))))
  }

  test("skip-to-last of a group sub-step resumes inside the island") {
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "error"))
    val got = matchSets(Cep.matchPattern(events, "user_id", "ts",
      "event_id", Seq(groupAB()), skip = Cep.SkipToLast("A")))
    // match 1 = both iterations; resume at the LAST A (position of s3)
    // → overlapping second match of the remaining pair
    assert(got === Seq(
      Set(("A", 1L), ("B", 2L), ("A", 3L), ("B", 4L)),
      Set(("A", 3L), ("B", 4L))))
  }

  test("notFollowedBy guard inside a group iteration kills only that " +
      "iteration's branch") {
    // (A ~> !C ~> B)+: within each iteration the relaxed A→B gap must
    // not contain a click; a violating iteration ends the loop, the
    // completed iterations still match
    val preds: Map[String, org.apache.spark.sql.Row => Boolean] = Map(
      "A" -> (_.getString(3) == "signup"),
      "B" -> (_.getString(3) == "error"),
      "C" -> (_.getString(3) == "click"))
    val steps = Cep.pattern("(A ~> !C ~> B)+", preds)
    // user 1: iteration 2's gap holds a click → loop stops after one
    // iteration; user 2: a view in the gap is skipped (guard is
    // C-specific), two clean iterations chain strictly
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "click"),
      (1L, 50L, 5L, "error"),
      (2L, 10L, 1L, "signup"), (2L, 20L, 2L, "view"),
      (2L, 30L, 3L, "error"), (2L, 40L, 4L, "signup"),
      (2L, 50L, 5L, "error"))
    val got = Cep.matchPattern(events, "user_id", "ts", "event_id", steps)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3).toLong)).toSet
    assert(got === Set(
      (1L, "A", 1L, 0L), (1L, "B", 2L, 0L),
      (2L, "A", 1L, 0L), (2L, "B", 3L, 0L),
      (2L, "A", 4L, 0L), (2L, "B", 5L, 0L)))
    // streaming twin over two micro-batches agrees
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep_group_guard")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (2L, 10L, 1L, "signup"), (2L, 20L, 2L, "view"))
    q.processAllAvailable()
    mem.addData((1L, 30L, 3L, "signup"), (1L, 40L, 4L, "click"),
      (1L, 50L, 5L, "error"),
      (2L, 30L, 3L, "error"), (2L, 40L, 4L, "signup"),
      (2L, 50L, 5L, "error"),
      (1L, 60L, 6L, "view"), (2L, 60L, 6L, "view"))
    q.processAllAvailable()
    val streamGot = spark.table("t_cep_group_guard").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    q.stop()
    // the trailing views close both keys' open relaxed tails
    val batchClosed = Cep.matchPattern(
      mkEvents((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
        (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "click"),
        (1L, 50L, 5L, "error"), (1L, 60L, 6L, "view"),
        (2L, 10L, 1L, "signup"), (2L, 20L, 2L, "view"),
        (2L, 30L, 3L, "error"), (2L, 40L, 4L, "signup"),
        (2L, 50L, 5L, "error"), (2L, 60L, 6L, "view")),
      "user_id", "ts", "event_id", steps).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3).toLong)).toSet
    assert(streamGot === batchClosed)
  }

  test("group pattern string: (A B)+ parses, sub-contiguity, nesting " +
      "rejected") {
    val preds: Map[String, org.apache.spark.sql.Row => Boolean] = Map(
      "A" -> (_.getString(3) == "signup"),
      "B" -> (_.getString(3) == "error"),
      "C" -> (_.getString(3) == "click"))
    val steps = Cep.pattern("(A B)+ C", preds)
    assert(steps.length === 2)
    assert(steps.head.group.map(_.name) === Seq("A", "B"))
    assert(steps.head.quant === Cep.Plus)
    // sub-step contiguity and group quantifier range
    val s2 = Cep.pattern("(A ~> B){2}", preds)
    assert(s2.head.quant === Cep.Times(2, 2))
    assert(s2.head.group(1).relaxed)
    // relaxed attach of the group itself
    val s3 = Cep.pattern("C ~> (A B)+", preds)
    assert(s3(1).relaxed && s3(1).group.nonEmpty)
    // parsed == hand-built on data
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "error"),
      (1L, 50L, 5L, "click"))
    val viaParser = Cep.matchPattern(events, "user_id", "ts", "event_id",
      steps).collect().toSet
    val viaSteps = Cep.matchPattern(events, "user_id", "ts", "event_id",
      Seq(groupAB(), Cep.Step("C", preds("C")))).collect().toSet
    assert(viaParser === viaSteps && viaParser.nonEmpty)
    intercept[IllegalArgumentException] {
      Cep.pattern("((A B)+ C)+", preds)
    }
    // unbalanced/stray parens must ERROR, not silently parse as a
    // different pattern (the tokenizer skips unmatched characters)
    assert(intercept[IllegalArgumentException] {
      Cep.pattern("A (B C", preds)
    }.getMessage.contains("unbalanced"))
    assert(intercept[IllegalArgumentException] {
      Cep.pattern("A B) C", preds)
    }.getMessage.contains("unbalanced"))
    // an iteration is a sub-pattern: it may not START with a negation
    // (the iteration-attach rewrite would change the guard's semantics)
    assert(intercept[IllegalArgumentException] {
      Cep.matchPattern(events, "user_id", "ts", "event_id",
        Cep.pattern("C ~> (!C ~> A B)+", preds))
    }.getMessage.contains("cannot start with a negation"))
  }

  test("streaming NFA sequence group stays open across batches") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val steps = Seq(groupAB())
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps)
      .writeStream.format("memory").queryName("t_cep_group")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // batch 1 completes ONE iteration — the greedy group could still
    // absorb another, so nothing may emit yet
    mem.addData((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"))
    q.processAllAvailable()
    assert(spark.table("t_cep_group").count() === 0)
    // batch 2 adds a second iteration and the click that closes the
    // island, plus a fresh open tail
    mem.addData((1L, 30L, 3L, "signup"), (1L, 40L, 4L, "error"),
      (1L, 50L, 5L, "click"),
      (1L, 60L, 6L, "signup"), (1L, 70L, 7L, "error"))
    q.processAllAvailable()
    val mid = spark.table("t_cep_group").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(mid === Set(
      (1L, "A", 1L, 0L), (1L, "B", 2L, 0L),
      (1L, "A", 3L, 0L), (1L, "B", 4L, 0L)))
    // batch 3's view closes the tail pair
    mem.addData((1L, 80L, 8L, "view"))
    q.processAllAvailable()
    val rows = spark.table("t_cep_group").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    q.stop()
    val batch = Cep.matchPattern(
      mkEvents((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
        (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "error"),
        (1L, 50L, 5L, "click"), (1L, 60L, 6L, "signup"),
        (1L, 70L, 7L, "error"), (1L, 80L, 8L, "view")),
      "user_id", "ts", "event_id", steps).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3).toLong)).toSet
    assert(rows === batch)
    assert(rows.size === 6)
  }

  test("MATCH_RECOGNIZE via spark.sql equals the NFA DataFrame API") {
    // SparkFixture's session is built with GraftExtensions, so this text
    // goes through the INJECTED parser — the real SQL surface
    val events = graft.engine.Tables.load(spark, SparkFixture.sf, "events")
    events.createOrReplaceTempView("events")
    val viaSql = spark.sql(
      """SELECT key, step, event_id, match_seq
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B+)
        |  DEFINE A AS event_type = 'signup',
        |         B AS event_type = 'error'
        |)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    val viaApi = Cep.signupThenErrors(events)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(viaSql.nonEmpty)
    assert(viaSql === viaApi)
  }

  test("MATCH_RECOGNIZE supports outer query, alias, WITHIN, and bare vars") {
    val ev = mkEvents((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"),
      (1L, 100L, 3L, "a"), (1L, 4000L, 4L, "b"))
    ev.createOrReplaceTempView("mr_events")
    // X undefined → matches any row; WITHIN 1 hour excludes the pair
    // spanning 3900 s; outer WHERE + alias exercise the splice
    val got = spark.sql(
      """SELECT m.key, m.event_id FROM mr_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  PATTERN (A X)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE A AS event_type = 'a'
        |) AS m
        |WHERE m.step = 'X' ORDER BY m.event_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // match at (1,2) survives the horizon; (3,4) is 3900 s apart → out
    assert(got === Seq((1L, 2L)))
  }

  test("MATCH_RECOGNIZE over a CTE of the same statement") {
    val events = graft.engine.Tables.load(spark, SparkFixture.sf, "events")
    events.createOrReplaceTempView("events")
    // the pattern input is a CTE (filtered + renamed), not a catalog
    // table; nested reference: ev builds on raw
    val viaSql = spark.sql(
      """WITH raw AS (
        |  SELECT user_id, ts, event_id, event_type FROM events),
        |ev AS (
        |  SELECT * FROM raw WHERE event_type IN ('signup', 'error'))
        |SELECT key, step, event_id, match_seq
        |FROM ev MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  PATTERN (A B+)
        |  DEFINE A AS event_type = 'signup',
        |         B AS event_type = 'error'
        |)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    // twin over the equivalent pre-filtered DataFrame
    val filtered = events.where(col("event_type").isin("signup", "error"))
    val viaApi = Cep.matchPattern(
      filtered.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")),
      "user_id", "ts", "event_id",
      Seq(Cep.Step("A", _.getString(3) == "signup"),
        Cep.Step("B", _.getString(3) == "error", Cep.Plus)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(viaSql.nonEmpty)
    assert(viaSql === viaApi)
  }

  test("MATCH_RECOGNIZE direct path (no extension) equals parser path") {
    val events = graft.engine.Tables.load(spark, SparkFixture.sf, "events")
    events.createOrReplaceTempView("events")
    val text =
      """SELECT key, step, event_id, match_seq
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  PATTERN (A B{1,2})
        |  DEFINE A AS event_type = 'signup',
        |         B AS event_type = 'error'
        |)""".stripMargin
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(canon(graft.cep.MatchRecognize.sql(spark, text)) ===
      canon(spark.sql(text)))
  }

  test("MATCH_RECOGNIZE MEASURES: one row per match with FIRST/LAST/COUNT") {
    val events = graft.engine.Tables.load(spark, SparkFixture.sf, "events")
    events.createOrReplaceTempView("events")
    val viaSql = spark.sql(
      """SELECT key, match_seq, a_id, last_err, n_errors
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES FIRST(A.event_id) AS a_id,
        |           LAST(B.event_id) AS last_err,
        |           COUNT(B.*) AS n_errors
        |  ONE ROW PER MATCH
        |  PATTERN (A B+)
        |  DEFINE A AS event_type = 'signup',
        |         B AS event_type = 'error'
        |)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // twin: aggregate the all-rows NFA output by hand
    val rows = Cep.signupThenErrors(events).collect()
      .groupBy(r => (r.getLong(0), r.getInt(3)))
    val want = rows.map { case ((key, seq), rs) =>
      // matchPattern emits each step's hits in timeline order
      val as = rs.filter(_.getString(1) == "A").map(_.getLong(2))
      val bs = rs.filter(_.getString(1) == "B").map(_.getLong(2))
      (key, seq, as.head, bs.last, bs.length.toLong)
    }.toSet
    assert(viaSql.nonEmpty)
    assert(viaSql === want)
  }

  test("MATCH_RECOGNIZE ALL ROWS PER MATCH: original columns + running measures") {
    val events = graft.engine.Tables.load(spark, SparkFixture.sf, "events")
    events.createOrReplaceTempView("events")
    val got = spark.sql(
      """SELECT event_id, mno, var, n_err
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS mno,
        |           CLASSIFIER() AS var,
        |           COUNT(B.*) AS n_err
        |  ALL ROWS PER MATCH
        |  PATTERN (A B+)
        |  DEFINE A AS event_type = 'signup',
        |         B AS event_type = 'error'
        |)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3))).toSet
    // twin: the raw NFA output already is one row per consumed event;
    // running COUNT(B.*) = this row's 1-based index among the match's B
    // rows for B rows, 0 for the A row (which precedes every B)
    val want = Cep.signupThenErrors(events).collect()
      .groupBy(r => (r.getLong(0), r.getInt(3))).toSeq
      .flatMap { case ((_, seq), rs) =>
        // matchPattern emits the match's rows in timeline order
        val bs = rs.filter(_.getString(1) == "B").map(_.getLong(2))
        rs.map { r =>
          val nErr = if (r.getString(1) == "A") 0L
            else bs.indexOf(r.getLong(2)) + 1L
          (r.getLong(2), seq, r.getString(1), nErr)
        }
      }.toSet
    assert(got.nonEmpty)
    assert(got === want)
    // CLASSIFIER is per-row — meaningless once the match collapses
    val err = intercept[IllegalArgumentException] {
      graft.cep.MatchRecognize.sql(spark,
        """SELECT 1 FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts, event_id
          |  MEASURES CLASSIFIER() AS var
          |  ONE ROW PER MATCH
          |  PATTERN (A)
          |  DEFINE A AS event_type = 'signup'
          |)""".stripMargin)
    }
    assert(err.getMessage.contains("ALL ROWS PER MATCH"))
  }

  test("MATCH_RECOGNIZE SUBSET: union variable in MEASURES, both modes") {
    val events = graft.engine.Tables.load(spark, SparkFixture.sf, "events")
    events.createOrReplaceTempView("events")
    // one-row mode: FIRST(S.·) must land on the A row, LAST(S.·) on the
    // final B row, COUNT(S.*) on the whole match — the union, not any
    // single variable
    val got = spark.sql(
      """SELECT key, match_seq, first_id, last_id, n_all
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES FIRST(S.event_id) AS first_id,
        |           LAST(S.event_id) AS last_id,
        |           COUNT(S.*) AS n_all
        |  ONE ROW PER MATCH
        |  PATTERN (A B+)
        |  SUBSET S = (A, B)
        |  DEFINE A AS event_type = 'signup',
        |         B AS event_type = 'error'
        |)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val byMatch = Cep.signupThenErrors(events).collect()
      .groupBy(r => (r.getLong(0), r.getInt(3)))
    val want = byMatch.map { case ((key, seq), rs) =>
      val as = rs.filter(_.getString(1) == "A").map(_.getLong(2))
      val bs = rs.filter(_.getString(1) == "B").map(_.getLong(2))
      (key, seq, as.head, bs.last, (as.length + bs.length).toLong)
    }.toSet
    assert(got.nonEmpty)
    assert(got === want)
    // all-rows mode: running COUNT(S.*) is the row's 1-based position
    // in the match (every consumed row is in the union)
    val gotAll = spark.sql(
      """SELECT event_id, mno, n_seen
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS mno, COUNT(S.*) AS n_seen
        |  ALL ROWS PER MATCH
        |  PATTERN (A B+)
        |  SUBSET S = (A, B)
        |  DEFINE A AS event_type = 'signup',
        |         B AS event_type = 'error'
        |)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val wantAll = byMatch.toSeq.flatMap { case ((_, seq), rs) =>
      // matchPattern emits each step's hits in timeline order, and the
      // A row precedes every B row in this pattern
      val a = rs.filter(_.getString(1) == "A")
      val bs = rs.filter(_.getString(1) == "B")
      (a ++ bs).zipWithIndex.map { case (r, i) =>
        (r.getLong(2), seq, i + 1L)
      }
    }.toSet
    assert(gotAll === wantAll)
    // validation: unknown member, name collision, undefined variable
    def bad(subset: String, measure: String = "COUNT(S.*) AS x"): String =
      intercept[IllegalArgumentException] {
        graft.cep.MatchRecognize.sql(spark,
          s"""SELECT 1 FROM events MATCH_RECOGNIZE (
             |  PARTITION BY user_id
             |  ORDER BY ts, event_id
             |  MEASURES $measure
             |  ONE ROW PER MATCH
             |  PATTERN (A B+)
             |  $subset
             |  DEFINE A AS event_type = 'signup',
             |         B AS event_type = 'error'
             |)""".stripMargin)
      }.getMessage
    assert(bad("SUBSET S = (A, Z)").contains("not a pattern variable"))
    assert(bad("SUBSET A = (B)").contains("collides"))
    assert(bad("SUBSET S = (A, B)", "COUNT(T.*) AS x")
      .contains("SUBSET"))
  }

  test("MATCH_RECOGNIZE: SUBSET and per-variable MEASURES compose with " +
      "sequence groups") {
    // group sub-steps are full pattern variables: COUNT(B.*) counts one
    // sub-step's rows across ALL iterations, SUBSET unions them
    mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "error"),
      (1L, 50L, 5L, "click"),
      (1L, 60L, 6L, "signup"), (1L, 70L, 7L, "error"))
      .createOrReplaceTempView("t_grp_events")
    val got = graft.cep.MatchRecognize.sql(spark,
      """SELECT key, match_seq, n_b, n_all, last_id
        |FROM t_grp_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES COUNT(B.*) AS n_b,
        |           COUNT(S.*) AS n_all,
        |           LAST(S.event_id) AS last_id
        |  ONE ROW PER MATCH
        |  PATTERN ((A B)+)
        |  SUBSET S = (A, B)
        |  DEFINE A AS event_type = 'signup',
        |         B AS event_type = 'error'
        |)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // match 0 = two iterations (ids 1-4), match 1 = one iteration (6,7)
    assert(got === Set((1L, 0, 2L, 4L, 4L), (1L, 1, 1L, 2L, 7L)))
  }

  test("MATCH_RECOGNIZE over a streaming input runs the incremental NFA") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
      .createOrReplaceTempView("stream_events")
    val out = graft.cep.MatchRecognize.sql(spark,
      """SELECT key, step, event_id, match_seq
        |FROM stream_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  PATTERN (A B+)
        |  DEFINE A AS event_type = 'signup',
        |         B AS event_type = 'error'
        |)""".stripMargin)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("t_mr_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData((1L, 10L, 1L, "signup"), (1L, 20L, 2L, "error"))
    q.processAllAvailable()
    mem.addData((1L, 30L, 3L, "error"), (1L, 40L, 4L, "click"))
    q.processAllAvailable()
    val got = spark.table("t_mr_stream").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(got === Set(("A", 1L), ("B", 2L), ("B", 3L)))
  }

  test("streaming MATCH_RECOGNIZE WITHIN flushes open tails at the horizon") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    // watermarked view → WITHIN routes to the horizon-flushing NFA
    mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
      .withWatermark("ts", "10 seconds")
      .createOrReplaceTempView("stream_within_events")
    val out = graft.cep.MatchRecognize.sql(spark,
      """SELECT key, step, event_id, match_seq
        |FROM stream_within_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  PATTERN (A B+)
        |  WITHIN INTERVAL '1' MINUTE
        |  DEFINE A AS event_type = 'signup',
        |         B AS event_type = 'error'
        |)""".stripMargin)
    val q = out.writeStream.format("memory").queryName("t_mr_within")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // greedy B+ tail stays open (no closing event for key 1 ever
    // arrives); timeline starts past epoch (EventTimeTimeout drops
    // at-or-below-watermark input)
    val h = 3600L
    mem.addData((1L, h + 10L, 1L, "signup"), (1L, h + 20L, 2L, "error"))
    q.processAllAvailable()
    val before = spark.table("t_mr_within").count()
    // an unrelated key's event pushes the watermark past key 1's
    // horizon (start + 1 min) → the open tail force-emits
    mem.addData((2L, h + 600L, 99L, "click"))
    q.processAllAvailable()
    val got = spark.table("t_mr_within").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(before === 0L, "tail emitted before its horizon expired")
    assert(got === Set(("A", 1L), ("B", 2L)))
  }

  test("streaming MATCH_RECOGNIZE on a watermarked view is event-time ordered") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
      .withWatermark("ts", "2 minutes")
      .createOrReplaceTempView("stream_rowtime_events")
    val out = graft.cep.MatchRecognize.sql(spark,
      """SELECT key, step, event_id, match_seq
        |FROM stream_rowtime_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  PATTERN (A B)
        |  DEFINE A AS event_type = 'signup',
        |         B AS event_type = 'error'
        |)""".stripMargin)
    val q = out.writeStream.format("memory").queryName("t_mr_rowtime")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // the error arrives a batch BEFORE its earlier signup (inside the
    // watermark delay); rowtime semantics must still match A then B
    val h = 3600L
    mem.addData((1L, h + 100L, 2L, "error")); q.processAllAvailable()
    mem.addData((1L, h + 50L, 1L, "signup")); q.processAllAvailable()
    mem.addData((1L, h + 500L, 9L, "view")); q.processAllAvailable()
    val got = spark.table("t_mr_rowtime").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(got === Set(("A", 1L), ("B", 2L)))
  }

  test("MATCH_RECOGNIZE NEXT navigation in DEFINE looks ahead in input order") {
    import spark.implicits._
    Seq((1L, 1L, 1L, "x", 1.0), (1L, 2L, 2L, "x", 5.0),
      (1L, 3L, 3L, "x", 3.0), (1L, 4L, 4L, "x", 7.0))
      .toDF("user_id", "secs", "event_id", "event_type", "value")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"), col("value"))
      .createOrReplaceTempView("nav_events")
    val got = graft.cep.MatchRecognize.sql(spark,
      """SELECT key, step, event_id, match_seq
        |FROM nav_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  PATTERN (A)
        |  DEFINE A AS value < NEXT(value)
        |)""".stripMargin)
      .collect().map(_.getLong(2)).toSet
    // rows whose successor has a larger value; the last row's NEXT is
    // NULL → predicate false
    assert(got === Set(1L, 3L))
  }

  test("MATCH_RECOGNIZE alternation: CLASSIFIER labels each alternative") {
    import spark.implicits._
    Seq((1L, 1L, 1L, "signup"), (1L, 2L, 2L, "error"),
      (1L, 3L, 3L, "click"), (1L, 4L, 4L, "purchase"))
      .toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
      .createOrReplaceTempView("alt_events")
    val got = graft.cep.MatchRecognize.sql(spark,
      """SELECT user_id, event_id, var, mno
        |FROM alt_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS mno, CLASSIFIER() AS var
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A (E|C)+ P)
        |  DEFINE A AS event_type = 'signup',
        |         E AS event_type = 'error',
        |         C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .collect().map(r => (r.getLong(1), r.getString(2))).toSet
    assert(got === Set((1L, "A"), (2L, "E"), (3L, "C"), (4L, "P")))
  }

  test("MATCH_RECOGNIZE navigation qualifier: self accepted, foreign rejected") {
    import spark.implicits._
    Seq((1L, 1L, 1L, "x", 1.0), (1L, 2L, 2L, "x", 5.0),
      (1L, 3L, 3L, "x", 3.0), (1L, 4L, 4L, "x", 7.0))
      .toDF("user_id", "secs", "event_id", "event_type", "value")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"), col("value"))
      .createOrReplaceTempView("nav_q_events")
    // a qualifier naming the variable being defined is the standard's
    // home-variable spelling — same result as the bare form
    val got = graft.cep.MatchRecognize.sql(spark,
      """SELECT key, step, event_id, match_seq
        |FROM nav_q_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  PATTERN (A)
        |  DEFINE A AS value < NEXT(A.value)
        |)""".stripMargin)
      .collect().map(_.getLong(2)).toSet
    assert(got === Set(1L, 3L))
    // a FOREIGN qualifier would silently run bare current-row
    // navigation — reject it, naming the offending reference
    val e = intercept[IllegalArgumentException] {
      graft.cep.MatchRecognize.sql(spark,
        """SELECT key FROM nav_q_events MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts, event_id
          |  PATTERN (A B)
          |  DEFINE A AS value > 0,
          |         B AS value > PREV(A.value)
          |)""".stripMargin)
    }
    assert(e.getMessage.contains("PREV(A.value)")
      && e.getMessage.contains("DEFINE B"))
  }

  test("MATCH_RECOGNIZE rejects PREV on a streaming input") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"),
        col("event_id").cast("double").as("value"))
      .createOrReplaceTempView("nav_stream_events")
    val e = intercept[IllegalArgumentException] {
      graft.cep.MatchRecognize.sql(spark,
        """SELECT key FROM nav_stream_events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY ts, event_id
          |  PATTERN (A) DEFINE A AS value > PREV(value))""".stripMargin)
    }
    assert(e.getMessage.contains("PREV/NEXT"))
  }

  test("MATCH_RECOGNIZE rejects an unsupported MEASURES item clearly") {
    val e = intercept[IllegalArgumentException] {
      graft.cep.MatchRecognize.sql(spark,
        """SELECT 1 FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY ts, event_id
          |  MEASURES AVG(A.value) AS a_avg
          |  PATTERN (A) DEFINE A AS true)""".stripMargin)
    }
    assert(e.getMessage.contains("MEASURES"))
  }

  test("until: the loop stops at the FIRST stop event, which the next step consumes") {
    // reference Pattern.until — the stop condition caps the loop; the
    // stop event is NOT consumed by the loop. Observable vs plain
    // greedy: without until, B+ swallows purchase(4) and C matches the
    // LAST purchase; with until, C is the FIRST purchase after signup.
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 11L, 2L, "click"),
      (1L, 12L, 3L, "error"), (1L, 13L, 4L, "purchase"),
      (1L, 14L, 5L, "click"), (1L, 15L, 6L, "purchase"))
    def steps(until: Option[org.apache.spark.sql.Row => Boolean]) = Seq(
      Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) != "signup", Cep.Plus, until = until),
      Cep.Step("C", _.getString(3) == "purchase"))
    val withUntil = Cep.matchPattern(events, "user_id", "ts", "event_id",
        steps(Some(_.getString(3) == "purchase")))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(withUntil === Set(("A", 1L), ("B", 2L), ("B", 3L), ("C", 4L)))
    val without = Cep.matchPattern(events, "user_id", "ts", "event_id",
        steps(None))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    // control: greedy-without-until consumes through purchase(4) and
    // matches the later purchase — proving until changed the semantics
    assert(without === Set(("A", 1L), ("B", 2L), ("B", 3L), ("B", 4L),
      ("B", 5L), ("C", 6L)))
  }

  test("until on a relaxed loop: the scan may not skip past the stop event") {
    // relaxed B (followedBy) skips non-matching events — but an until
    // hit is a hard stop, not skippable: error(5) after the first
    // purchase must NOT be taken even though B's relaxed scan could
    // otherwise reach it
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 11L, 2L, "click"),
      (1L, 12L, 3L, "error"), (1L, 13L, 4L, "purchase"),
      (1L, 14L, 5L, "error"), (1L, 15L, 6L, "purchase"))
    val steps = Seq(
      Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error", Cep.Plus, relaxed = true,
        until = Some(_.getString(3) == "purchase")),
      Cep.Step("C", _.getString(3) == "purchase", relaxed = true))
    val got = Cep.matchPattern(events, "user_id", "ts", "event_id", steps)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("A", 1L), ("B", 3L), ("C", 4L)))
  }

  test("timesOrMore: open-ended lower-bounded run with backtracking") {
    // user 1: three consecutive errors -> all consumed (greedy,
    // unbounded above); user 2: one error -> below the min, no match
    val events = mkEvents(
      (1L, 10L, 1L, "signup"), (1L, 11L, 2L, "error"),
      (1L, 12L, 3L, "error"), (1L, 13L, 4L, "error"),
      (1L, 14L, 5L, "purchase"),
      (2L, 10L, 6L, "signup"), (2L, 11L, 7L, "error"),
      (2L, 12L, 8L, "purchase"))
    val steps = Seq(
      Cep.Step("A", _.getString(3) == "signup"),
      Cep.Step("B", _.getString(3) == "error", Cep.timesOrMore(2)),
      Cep.Step("C", _.getString(3) == "purchase"))
    val got = Cep.matchPattern(events, "user_id", "ts", "event_id", steps)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((1L, "A", 1L), (1L, "B", 2L), (1L, "B", 3L),
      (1L, "B", 4L), (1L, "C", 5L)))
  }

  test("hot-key bound: within-horizon scan holds O(window), not O(timeline)") {
    import org.apache.spark.sql.Row
    // One key, 50k events at 1 event/second, within = 10 s. The pre-r5
    // path buffered the whole timeline in the task; the HorizonScanner's
    // high-water mark must stay at window scale (~11 in-window events,
    // doubled by compaction slack plus the 64-row floor) — three orders
    // of magnitude under the timeline — while producing exactly the
    // matches of the in-memory reference scan.
    val n = 50000
    val rows: IndexedSeq[Row] = (0 until n).map { i =>
      val t = i % 10 match {
        case 3 => "a"; case 4 => "b"; case 5 => "b"; case _ => "x"
      }
      Row(1L, new Timestamp(i * 1000L), i.toLong, t)
    }
    val steps = Seq(
      Cep.Step("A", _.getString(3) == "a"),
      Cep.Step("B", _.getString(3) == "b", quant = Cep.Plus, relaxed = true))
    val w = 10L * 1000000L
    val sc = new Cep.HorizonScanner(1L, steps, w, Cep.SkipPastLast,
      tIdx = 1, iIdx = 2)
    val got = rows.flatMap(sc.push(_)) ++ sc.finish()
    val want = Cep.scanTimeline(rows, 1L, steps, Some(w), Cep.SkipPastLast,
      1, 2).toSeq
    assert(got.nonEmpty)
    assert(got == want)
    assert(sc.peakBufferSize <= 160,
      s"peak buffer ${sc.peakBufferSize} must be window-scale, " +
        s"not timeline-scale ($n)")
  }

  test("within-horizon matchPattern equals the in-memory scan, all skips") {
    // End-to-end through the sorted-partition path: random multi-key
    // soup, every after-match skip strategy, compared against a per-key
    // scanTimeline reference on the same data.
    val rnd = new scala.util.Random(42)
    val types = Array("a", "b", "c", "x")
    val data = (0 until 600).map { i =>
      ((i % 3).toLong + 1, rnd.nextInt(300).toLong, i.toLong,
        types(rnd.nextInt(types.length)))
    }
    val df = mkEvents(data: _*)
    df.cache().count()
    val steps = Seq(
      Cep.Step("A", _.getString(3) == "a"),
      Cep.Step("B", _.getString(3) == "b", quant = Cep.Times(1, 3),
        relaxed = true),
      Cep.Step("C", _.getString(3) == "c", relaxed = true))
    val w = 30L * 1000000L
    val byKey = df.collect().groupBy(_.getLong(0))
    for (skip <- Seq(Cep.SkipPastLast, Cep.SkipToNext, Cep.SkipToFirst("B"),
        Cep.SkipToLast("B"))) {
      val got = Cep.matchPattern(df, "user_id", "ts", "event_id", steps,
        withinMicros = Some(w), skip = skip)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
        .toSet
      val want = byKey.flatMap { case (k, krows) =>
        val sorted = krows.sortBy(r => (r.getTimestamp(1).getTime,
          r.getLong(2)))
        Cep.scanTimeline(sorted.toIndexedSeq, k, steps, Some(w), skip, 1, 2)
      }.toSet
      assert(got == want, s"skip=$skip")
    }
    df.unpersist()
  }

  test("until validation: rejected on non-looping and negated steps") {
    val events = mkEvents((1L, 10L, 1L, "signup"))
    val stop: org.apache.spark.sql.Row => Boolean =
      _.getString(3) == "purchase"
    intercept[IllegalArgumentException] {
      Cep.matchPattern(events, "user_id", "ts", "event_id", Seq(
        Cep.Step("A", _.getString(3) == "signup", until = Some(stop))))
    }
    intercept[IllegalArgumentException] {
      Cep.matchPattern(events, "user_id", "ts", "event_id", Seq(
        Cep.Step("A", _.getString(3) == "signup"),
        Cep.Step("N", _.getString(3) == "error", negated = true,
          until = Some(stop))))
    }
  }

  test("streaming state telemetry: hot-key sequence-group state is " +
      "bounded by the within horizon, not by stream length") {
    // SCALE.md's sequence-group claim ("state stays O(active attempt
    // span) and the within horizon bounds it identically") measured, not
    // argued: ONE hot key streams a quantified group pattern (A B)+ C
    // for 20 batches at a constant event rate with a 2 s horizon. With
    // timer-driven horizon GC the replay buffer holds only the active
    // span, so the state store's current-version size plateaus; without
    // GC it would track total event count (~5× from the early steady
    // state to the final batch). Asserted from StreamingQueryProgress
    // state-operator metrics — the same telemetry an operator on a real
    // cluster is monitored by.
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val steps = Seq(
      Cep.group(
        Cep.Step("A", _.getString(3) == "a"),
        Cep.Step("B", _.getString(3) == "b", relaxed = true)
      ).copy(quant = Cep.Plus),
      Cep.Step("C", _.getString(3) == "c", relaxed = true))
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "ms", "event_id", "event_type")
      .select(col("user_id"),
        (col("ms") / 1000).cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
      .withWatermark("ts", "1 second")
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps,
        withinMicros = Some(2_000_000L), flushOnHorizon = true)
      .writeStream.format("memory").queryName("t_cep_state_bound")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // 20 batches × 100 events, 10 ms apart (1 s of event time per
    // batch), all on key 0: a..b..a..b with a rare c so most attempts
    // stay open until the horizon — the adversarial shape for state
    val types = Array("a", "b")
    val stateBytes = (0 until 20).map { batch =>
      val rows = (0 until 100).map { i =>
        val n = batch * 100 + i
        val t = if (n % 97 == 96) "c" else types(n % 2)
        (0L, n * 10L, n.toLong, t)
      }
      mem.addData(rows)
      q.processAllAvailable()
      val so = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
      assert(so.nonEmpty, s"no state operator progress at batch $batch")
      assert(so.map(_.numRowsTotal).sum <= 2L,
        "state rows must stay O(keys) — one hot key plus watermark slack")
      so.map { s =>
        val m = s.customMetrics
        if (m.containsKey("stateOnCurrentVersionSizeBytes"))
          m.get("stateOnCurrentVersionSizeBytes").longValue
        else s.memoryUsedBytes
      }.sum
    }
    q.stop()
    // matches actually flowed (the pattern isn't vacuously idle)
    assert(spark.table("t_cep_state_bound").count() > 0)
    // steady state by batch 3-5 (horizon = 2 s = 2 batches); the final
    // batches hold 10× the cumulative events but the same active span.
    // Plateau = late state within 2× early steady state (a no-GC buffer
    // would sit at ~4-6×); both windows are maxes to ride out snapshot
    // timing jitter in the state store's reported size.
    val early = stateBytes.slice(3, 6).max
    val late = stateBytes.slice(16, 20).max
    assert(late <= early * 2,
      s"state grew with stream length: early=$early late=$late " +
        s"(series: ${stateBytes.mkString(", ")})")
  }
}
