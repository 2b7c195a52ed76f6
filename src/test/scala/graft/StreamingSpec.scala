package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.fries.{EpochReconfig, ReconfigController}
import graft.queries.Catalog
import graft.streaming.Streams

/** Streaming layer: the same event-table operators as the batch catalog,
  * run through Structured Streaming with Trigger.AvailableNow, must agree
  * with their batch equivalents (micro-batch recomputation semantics,
  * SURVEY §1 changelog note). Plus the Fries epoch-reconfiguration hooks.
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("streaming tumble agg equals batch window agg") {
    val stream = Streams.tumbleAgg(Streams.events(spark, sf))
    val got = Streams.runToTable(spark, stream, "t_tumble", "complete")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = Catalog.byName("q_window_tumble").run(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming dedup keeps one row per event_id") {
    val events = Streams.events(spark, sf)
    val total = Streams.runToTable(spark,
      Streams.dedup(events), "t_dedup", "append").count()
    val distinct = graft.engine.Tables.load(spark, sf, "events")
      .select("event_id").distinct().count()
    assert(total === distinct)
  }

  test("count windows emit floor(n/size) windows per user") {
    val result = Streams.runToTable(spark,
      Streams.countWindows(Streams.events(spark, sf), size = 5),
      "t_cw", "append")
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val perUser = graft.engine.Tables.load(spark, sf, "events")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(result.nonEmpty)
    result.foreach { case (user, wins) =>
      assert(wins.length === (perUser(user) / 5).toInt,
        s"user $user: ${wins.length} windows for ${perUser(user)} events")
      assert(wins.forall(_._2 == 5L))
    }
  }

  test("stream-stream interval join equals batch interval join") {
    val got = Streams.runToTable(spark,
      Streams.intervalJoinStream(Streams.events(spark, sf)),
      "t_ij", "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Catalog.byName("q_interval_join").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("stream-stream LEFT OUTER interval join null-pads once the watermark seals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val q = Streams.intervalJoinLeftOuterStream(df)
      .writeStream.format("memory").queryName("t_sj_louter")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // u1 signup gets a matching error; u2 signup never does — its
    // null-padded row emits only after the watermark passes its horizon
    mem.addData((1L, 600L, 1L, "signup"), (2L, 600L, 2L, "signup"),
      (1L, 1200L, 10L, "error"))
    q.processAllAvailable()
    // push BOTH sides' watermarks far past u2's join horizon (60 min +
    // 10 min) — the join watermark is the min of the two inputs, and
    // only signup/error rows survive the pre-watermark filters
    mem.addData((3L, 90000L, 98L, "signup"), (3L, 90000L, 99L, "error"))
    q.processAllAvailable()
    mem.addData((3L, 95000L, 100L, "signup"), (3L, 95000L, 101L, "error"))
    q.processAllAvailable()
    val got = spark.table("t_sj_louter").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    q.stop()
    assert(got === Set((1L, 10L), (2L, -1L), (98L, 99L), (100L, 101L)))
  }

  test("stream-stream FULL OUTER interval join null-pads both sides") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val q = Streams.intervalJoinFullOuterStream(df)
      .writeStream.format("memory").queryName("t_sj_fouter")
      .outputMode("append").start()
    // u1: matched pair; u2: signup with no error (left null-pad);
    // u4: error with no signup (right null-pad)
    mem.addData((1L, 600L, 1L, "signup"), (2L, 600L, 2L, "signup"),
      (1L, 1200L, 10L, "error"), (4L, 1200L, 40L, "error"))
    q.processAllAvailable()
    mem.addData((3L, 90000L, 98L, "signup"), (3L, 90000L, 99L, "error"))
    q.processAllAvailable()
    mem.addData((3L, 95000L, 100L, "signup"), (3L, 95000L, 101L, "error"))
    q.processAllAvailable()
    val got = spark.table("t_sj_fouter").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    q.stop()
    assert(got === Set((1L, 10L), (2L, -1L), (-1L, 40L),
      (98L, 99L), (100L, 101L)))
  }

  test("stream-stream window join pairs only same-window events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val q = Streams.windowJoinStream(df)
      .writeStream.format("memory").queryName("t_sj_window")
      .outputMode("append").start()
    val h = 3600L
    // u1: signup+error inside hour 0 (pair) and an error in hour 1 (no
    // pair — different window despite being within any interval bound);
    // u2: signup hour 0, error hour 0 → pair
    mem.addData((1L, 600L, 1L, "signup"), (1L, 1200L, 10L, "error"),
      (1L, h + 60L, 11L, "error"),
      (2L, 1800L, 2L, "signup"), (2L, 2400L, 20L, "error"))
    q.processAllAvailable()
    mem.addData((3L, 10 * h, 98L, "signup"), (3L, 10 * h, 99L, "error"))
    q.processAllAvailable()
    val got = spark.table("t_sj_window").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got === Set((1L, 10L), (2L, 20L), (98L, 99L)))
  }

  test("broadcast control table re-reads at each epoch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    val df = mem.toDF().toDF("k", "v")
    @volatile var factor = 2.0
    val control = () =>
      Seq((1L, factor), (2L, factor * 10)).toDF("k", "mult")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]()
    val q = df.writeStream
      .foreachBatch(Streams.withBroadcastControl(control, Seq("k")) {
        (joined, _) =>
          joined.collect().foreach(r => buf.add((r.getLong(0),
            r.getDouble(1) * r.getDouble(2))))
      })
      .trigger(Trigger.ProcessingTime(0)).start()
    mem.addData((1L, 3.0)); q.processAllAvailable()
    factor = 5.0 // control update visible at the NEXT epoch
    mem.addData((2L, 3.0)); q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(buf.asScala.toSet === Set((1L, 6.0), (2L, 150.0)))
  }

  test("update-mode group agg equals batch aggregation") {
    import org.apache.spark.sql.functions._
    val got = Streams.runToTable(spark,
      Streams.groupAggUpdate(Streams.events(spark, sf)),
      "t_upd", "update")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (k, rows) => rows.last } // latest update/key
      .toSet
    val want = graft.engine.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === want)
  }

  test("streaming Top-N per batch keeps n rows per key") {
    import org.apache.spark.sql.functions.{col, desc}
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = Streams.events(spark, sf).writeStream
      .foreachBatch(Streams.topNPerBatch(2, Seq(col("user_id")),
        Seq(desc("value"), col("event_id"))) { (df, _) =>
        df.collect().foreach(r => buf.add((
          r.getAs[Long]("user_id"), r.getAs[Long]("event_id"))))
      })
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val perUser = buf.asScala.toSeq.groupBy(_._1)
    assert(perUser.nonEmpty)
    // AvailableNow on one file = one batch → global per-key top-2
    assert(perUser.values.forall(_.size <= 2))
  }

  test("incremental streaming Top-N changelog materializes to the batch top-n") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, desc}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "event_id", "value")
    val q = Streams.streamingTopN(df, "user_id", "event_id", "value", n = 2)
      .writeStream.format("memory").queryName("t_topn_inc")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // rows arrive across three batches; the standings must survive
    // boundaries and evictions must retract exactly once
    val rows = Seq(
      (1L, 1L, 5.0), (1L, 2L, 3.0),            // u1 top2 = {1, 2}
      (2L, 10L, 1.0))
    val rows2 = Seq(
      (1L, 3L, 4.0),                           // evicts 2 → top2 {1, 3}
      (2L, 11L, 2.0), (2L, 12L, 0.5))          // u2 top2 = {10, 11}
    val rows3 = Seq(
      (1L, 4L, 1.0),                           // below the bar: no output
      (2L, 13L, 3.0))                          // evicts 12→? no: {11,13}
    mem.addData(rows: _*); q.processAllAvailable()
    mem.addData(rows2: _*); q.processAllAvailable()
    mem.addData(rows3: _*); q.processAllAvailable()
    val log = spark.table("t_topn_inc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    q.stop()
    // materialize: inserts minus deletes
    val live = log.foldLeft(Set.empty[(Long, Long)]) {
      case (acc, ("+I", k, id)) => acc + ((k, id))
      case (acc, ("-D", k, id)) => acc - ((k, id))
      case (acc, _) => acc
    }
    // batch twin over all the data
    import graft.operators.Ops._
    val want = (rows ++ rows2 ++ rows3)
      .toDF("user_id", "event_id", "value")
      .topN(2, Seq(col("user_id")), Seq(desc("value"), col("event_id")))
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live === want)
    // exactly one retraction per eviction, none spurious
    assert(log.count(_._1 == "-D") === log.count(_._1 == "+I") - live.size)
  }

  test("transformWithState sessionization emits gap-split sessions with membership") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // transformWithState requires the RocksDB state store provider
    val prior = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long, Long)]
      val df = mem.toDF().toDF("user_id", "event_id", "secs")
        .select(col("user_id"), col("event_id"),
          col("secs").cast("timestamp").as("ts"))
        .withWatermark("ts", "0 seconds")
      val q = Streams.sessionizeWithState(df, gapMs = 5000L)
        .writeStream.format("memory").queryName("t_tws_session")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      // u1: two bursts separated by > gap → two sessions; membership
      // crosses a batch boundary (event 3 lands in batch 2, within the
      // batch-1 watermark of 12s)
      mem.addData((1L, 1L, 10L), (1L, 2L, 12L))
      q.processAllAvailable()
      mem.addData((1L, 3L, 14L), (1L, 4L, 60L))
      q.processAllAvailable()
      // advance the watermark far past u1's last event + gap
      mem.addData((2L, 10L, 500L))
      q.processAllAvailable()
      mem.addData((2L, 11L, 501L)) // extra batch so the timer fires
      q.processAllAvailable()
      val got = spark.table("t_tws_session").collect()
        .filter(_.getLong(0) == 1L)
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getSeq[Long](4)))
        .sortBy(_._1)
      q.stop()
      assert(got.toSeq === Seq(
        (10000L, 14000L, 3L, Seq(1L, 2L, 3L)),
        (60000L, 60000L, 1L, Seq(4L))))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sessionizeWithState keeps emitting for a continuously active key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prior = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long, Long)]
      val df = mem.toDF().toDF("user_id", "event_id", "secs")
        .select(col("user_id"), col("event_id"),
          col("secs").cast("timestamp").as("ts"))
        .withWatermark("ts", "0 seconds")
      val q = Streams.sessionizeWithState(df, gapMs = 5000L)
        .writeStream.format("memory").queryName("t_tws_active")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      // ONE key, never idle: a new session starts every batch while the
      // previous one is already sealed by the advancing watermark — the
      // regression was a timer anchored at the global max that never
      // fired for such a key
      for (i <- 0 until 5) {
        mem.addData((1L, i.toLong, i * 20L))
        q.processAllAvailable()
      }
      val emitted = spark.table("t_tws_active").collect()
        .map(r => (r.getLong(1), r.getLong(3)))
      q.stop()
      // the watermark (and so timer firing) lags one batch: after five
      // batches at 0/20/40/60/80s at least the 0s/20s/40s sessions are
      // sealed; the tail may still be open
      assert(emitted.length >= 3)
      assert(emitted.forall(_._2 == 1L))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sessionAggDynamic equals the batch dynamic-gap session window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prior = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // per-event gap: views hold a session open 10 s, clicks 3 s —
      // the q_window_session_dynamic shape at test scale
      val rnd = new scala.util.Random(42)
      val t0 = 3600L // start well past epoch: ts <= wm rows are dropped
      val rows = (1L to 6L).flatMap { k =>
        var t = t0 + rnd.nextInt(5)
        (0 until 15).map { i =>
          t += rnd.nextInt(9)
          (k, t, k * 100 + i,
            if (rnd.nextBoolean()) "view" else "click",
            rnd.nextInt(2000) / 100.0)
        }
      }
      def gapStr = when(col("event_type") === "view", "10 seconds")
        .otherwise(lit("3 seconds"))
      def gapMs = when(col("event_type") === "view", 10000L)
        .otherwise(lit(3000L))
      val batchDf = rows
        .toDF("user_id", "secs", "event_id", "event_type", "value")
        .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
          col("event_id"), col("event_type"), col("value"))
      val want = batchDf
        .groupBy(session_window(col("ts"), gapStr), col("user_id"))
        .agg(count(lit(1)).as("n"),
          graft.queries.Catalog.dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("start_ms"),
          col("n"), col("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet

      val mem = MemoryStream[(Long, Long, Long, String, Double)]
      val df = mem.toDF()
        .toDF("user_id", "secs", "event_id", "event_type", "value")
        .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
          col("event_id"), col("event_type"), col("value"))
        .withWatermark("ts", "0 seconds")
      val q = Streams.sessionAggDynamic(df, gapMs)
        .writeStream.format("memory").queryName("t_session_dyn")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      val ordered = rows.sortBy(e => (e._2, e._3))
      ordered.grouped(math.max(1, ordered.length / 4)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq); q.processAllAvailable()
      }
      // two flush batches: one to advance the watermark past every open
      // session's end, one for the timers armed by it to fire
      mem.addData((99L, t0 + 100000L, 1L, "click", 0.0))
      q.processAllAvailable()
      mem.addData((99L, t0 + 100001L, 2L, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("t_session_dyn").collect()
        .filter(_.getLong(0) < 90L)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      q.stop()
      assert(got === want)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("incremental streaming Top-N treats a re-arriving id as an update") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "event_id", "value")
    val q = Streams.streamingTopN(df, "user_id", "event_id", "value", n = 1)
      .writeStream.format("memory").queryName("t_topn_upd")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData((1L, 7L, 5.0))
    q.processAllAvailable()
    // downward update of the ranked id must retract and re-rank, not be
    // silently dropped; then a better id takes the slot
    mem.addData((1L, 7L, 4.0))
    q.processAllAvailable()
    mem.addData((1L, 8L, 4.5))
    q.processAllAvailable()
    val log = spark.table("t_topn_upd").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSeq
    q.stop()
    assert(log === Seq(
      ("+I", 7L, 5.0), ("-D", 7L, 5.0), ("+I", 7L, 4.0),
      ("-D", 7L, 4.0), ("+I", 8L, 4.5)))
  }

  test("streaming Top-N runner-up buffer resurrects the next-best on a downward update") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "event_id", "value")
    val q = Streams.streamingTopN(df, "user_id", "event_id", "value",
        n = 1, runnerUp = 1)
      .writeStream.format("memory").queryName("t_topn_resurrect")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // 7 leads, 8 is the retained runner-up; 7's downward update drops
    // it below 8 → 8 must resurrect into the standings
    mem.addData((1L, 7L, 5.0), (1L, 8L, 4.0))
    q.processAllAvailable()
    mem.addData((1L, 7L, 1.0))
    q.processAllAvailable()
    val log = spark.table("t_topn_resurrect").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSeq
    q.stop()
    assert(log === Seq(
      ("+I", 7L, 5.0),
      ("-D", 7L, 5.0), ("+I", 8L, 4.0)))
  }

  test("ChangelogIngest rejects conflicting same-key ops in one batch") {
    import spark.implicits._
    val ingest = new Streams.ChangelogIngest(Seq("k"))
    val bad = Seq(("+I", 1L, 10.0), ("-D", 1L, 10.0))
      .toDF("op", "k", "v")
    val e = intercept[IllegalArgumentException](ingest(bad))
    assert(e.getMessage.contains("multiple effective ops"))
    // -U + +U for one key (what ChangelogSink emits) stays legal
    val ok = Seq(("-U", 2L, 1.0), ("+U", 2L, 2.0)).toDF("op", "k", "v")
    ingest(ok)
    assert(ingest.materialized.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq === Seq((2L, 2.0)))
  }

  test("delta trigger fires only on moves >= delta and tracks the true sum") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    val df = mem.toDF().toDF("user_id", "value")
    val q = Streams.deltaTriggerSum(df, "user_id", "value", delta = 10.0)
      .writeStream.format("memory").queryName("t_delta_trig")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData((1L, 4.0), (1L, 3.0))   // sum 7 < 10: silent
    q.processAllAvailable()
    mem.addData((1L, 5.0))              // sum 12 ≥ 10: fire (12)
    q.processAllAvailable()
    mem.addData((1L, 9.0), (1L, 2.0))   // 21, 23: fires at 23 only
    q.processAllAvailable()
    val got = spark.table("t_delta_trig").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    q.stop()
    assert(got === Seq((1L, 12.0, 3L), (1L, 23.0, 5L)))
  }

  test("idle-timeout trigger fires only after a key goes quiet") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    val df = mem.toDF().toDF("k", "v")
      .select(col("k").cast("long").as("k"), col("v"))
    // a NONZERO trigger interval: with processing-time timeouts armed,
    // Spark schedules no-data batches to fire timers — at interval 0
    // that is a busy loop that can starve processAllAvailable (see the
    // operator's scaladoc); once timers are armed we POLL the sink with
    // a deadline instead of calling processAllAvailable at all
    val q = Streams.idleTimeoutAgg(df, "k", "v", timeoutMs = 1500)
      .writeStream.format("memory").queryName("t_idle")
      .outputMode("append").trigger(Trigger.ProcessingTime(250)).start()
    def rows() = spark.table("t_idle").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def waitFor(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!cond) {
        assert(System.nanoTime() < deadline, s"timed out waiting: $what")
        Thread.sleep(200)
      }
    }
    // both key-1 elements in ONE source offset so they land in one
    // batch atomically — separate addData calls could straddle a >1.5s
    // stall and split the burst into two flushes (a timing flake, not
    // an operator property)
    mem.addData((1L, 1.0), (1L, 2.0))
    waitFor("key 1 idle flush")(rows().exists(_._1 == 1L))
    val k1 = rows().filter(_._1 == 1L).toSeq
    assert(k1 === Seq((1L, 3.0, 2L)),
      s"key 1 must flush once with the FULL buffered (sum, n): $k1")
    // a later key flushes independently; key 1 must not fire again
    mem.addData((2L, 5.0))
    waitFor("key 2 idle flush")(rows().exists(_._1 == 2L))
    val got = rows().toSeq
    q.stop()
    assert(got.filter(_._1 == 2L) === Seq((2L, 5.0, 1L)))
    assert(got.count(_._1 == 1L) === 1, s"key 1 flushed twice: $got")
  }

  test("side-output routing partitions each batch exactly") {
    import org.apache.spark.sql.functions.col
    val counts = new java.util.concurrent.atomic.AtomicLongArray(2)
    val q = Streams.events(spark, sf).writeStream
      .foreachBatch(Streams.foreachBatchSplit(col("event_type") === "error")(
        (df, _) => counts.addAndGet(0, df.count()): Unit,
        (df, _) => counts.addAndGet(1, df.count()): Unit))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val events = graft.engine.Tables.load(spark, sf, "events")
    assert(counts.get(0) ===
      events.filter(col("event_type") === "error").count())
    assert(counts.get(0) + counts.get(1) === events.count())
  }

  test("streaming as-of join equals batch as-of join across batches") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // (key, secs, id, payload, isLeft)
    val mem = MemoryStream[(Long, Long, Long, Long, Boolean)]
    val df = mem.toDF().toDF("k", "secs", "id", "pay", "isLeft")
      .select(col("k"), col("secs").cast("timestamp").as("ts"), col("id"),
        col("pay"), col("isLeft"))
    val q = Streams.asofJoinStream(
        df.where(col("isLeft")), df.where(!col("isLeft")),
        "k", "ts", "id", "pay")
      .writeStream.format("memory").queryName("t_asof_s")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // batch 1: version v1 at t=10, probe at t=5 (before any version →
    // null), probe at t=20 → v1
    mem.addData((1L, 10L, 100L, 7L, false), (1L, 5L, 1L, 0L, true),
      (1L, 20L, 2L, 0L, true))
    q.processAllAvailable()
    // batch 2: newer version v2 at t=30 carries over state; probe t=40 → v2
    mem.addData((1L, 30L, 101L, 9L, false), (1L, 40L, 3L, 0L, true))
    q.processAllAvailable()
    val got = spark.table("t_asof_s").collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toMap
    q.stop()
    assert(got === Map(1L -> None, 2L -> Some(7L), 3L -> Some(9L)))
  }

  test("streaming OVER running agg equals batch window across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "value")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("value"))
    val q = Streams.overRunningStream(df)
      .writeStream.format("memory").queryName("t_over_run")
      .outputMode("append").start()
    // two users, running state must carry across the batch boundary;
    // batch 2 arrives out of event-time order within the batch (40 then
    // 35) to exercise the in-batch sort
    mem.addData((1L, 10L, 1L, 10.50), (1L, 20L, 2L, 0.25),
      (2L, 10L, 3L, 5.00))
    q.processAllAvailable()
    mem.addData((1L, 40L, 5L, 1.00), (1L, 35L, 4L, 2.00),
      (2L, 50L, 6L, 0.75))
    q.processAllAvailable()
    val got = spark.table("t_over_run").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    q.stop()
    // batch twin: the q_over_running decimal window over the full input
    val all = Seq((1L, 10L, 1L, 10.50), (1L, 20L, 2L, 0.25),
      (2L, 10L, 3L, 5.00), (1L, 40L, 5L, 1.00), (1L, 35L, 4L, 2.00),
      (2L, 50L, 6L, 0.75))
      .toDF("user_id", "secs", "event_id", "value")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = all.select(col("user_id"), col("event_id"),
        (sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w)).cast("double").as("running_total"),
        count(lit(1)).over(w).as("n_so_far"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got === want)
    assert(got.size === 6)
  }

  test("streaming OVER bounded ROWS-sliding frame equals batch window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "value")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("value"))
    val q = Streams.overRowsSlidingStream(df, k = 2)
      .writeStream.format("memory").queryName("t_over_slide")
      .outputMode("append").start()
    // frame must slide across the batch boundary (event 4's frame spans
    // events 2 and 4 — one from each batch) and evict beyond k
    mem.addData((1L, 10L, 1L, 10.50), (1L, 20L, 2L, 0.25),
      (2L, 10L, 3L, 5.00))
    q.processAllAvailable()
    mem.addData((1L, 40L, 5L, 1.00), (1L, 35L, 4L, 2.00),
      (2L, 50L, 6L, 0.75))
    q.processAllAvailable()
    val got = spark.table("t_over_slide").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    q.stop()
    val all = Seq((1L, 10L, 1L, 10.50), (1L, 20L, 2L, 0.25),
      (2L, 10L, 3L, 5.00), (1L, 40L, 5L, 1.00), (1L, 35L, 4L, 2.00),
      (2L, 50L, 6L, 0.75))
      .toDF("user_id", "secs", "event_id", "value")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-1, Window.currentRow)
    val want = all.select(col("user_id"), col("event_id"),
        (sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w)).cast("double").as("frame_sum"),
        count(lit(1)).over(w).as("n_in_frame"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got === want)
    assert(got.size === 6)
  }

  test("stream-stream RIGHT OUTER interval join null-pads unmatched errors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val q = Streams.intervalJoinRightOuterStream(df)
      .writeStream.format("memory").queryName("t_sj_router")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // u1: matched pair; u4: error with no signup → right null-pad (the
    // mirror of the left-outer case); u2's unmatched SIGNUP must NOT
    // emit under right-outer semantics
    mem.addData((1L, 600L, 1L, "signup"), (2L, 600L, 2L, "signup"),
      (1L, 1200L, 10L, "error"), (4L, 1200L, 40L, "error"))
    q.processAllAvailable()
    mem.addData((3L, 90000L, 98L, "signup"), (3L, 90000L, 99L, "error"))
    q.processAllAvailable()
    mem.addData((3L, 95000L, 100L, "signup"), (3L, 95000L, 101L, "error"))
    q.processAllAvailable()
    val got = spark.table("t_sj_router").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1)))
      .toSet
    q.stop()
    assert(got === Set((1L, 10L), (-1L, 40L), (98L, 99L), (100L, 101L)))
  }

  test("streaming OVER event-time RANGE frame equals batch window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "value")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("value"))
    // 60 s range; frames must prune across the batch boundary and
    // equal-ts peers (events 4/5) must share one frame
    val q = Streams.overTimeRangeStream(df, rangeMicros = 60L * 1000000L)
      .writeStream.format("memory").queryName("t_over_range")
      .outputMode("append").start()
    mem.addData((1L, 10L, 1L, 1.0), (1L, 50L, 2L, 1.0), (2L, 10L, 3L, 1.0))
    q.processAllAvailable()
    mem.addData((1L, 100L, 4L, 1.0), (1L, 100L, 5L, 1.0),
      (1L, 200L, 6L, 1.0), (2L, 300L, 7L, 1.0))
    q.processAllAvailable()
    val got = spark.table("t_over_range").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    val all = Seq((1L, 10L, 1L, 1.0), (1L, 50L, 2L, 1.0), (2L, 10L, 3L, 1.0),
      (1L, 100L, 4L, 1.0), (1L, 100L, 5L, 1.0), (1L, 200L, 6L, 1.0),
      (2L, 300L, 7L, 1.0))
      .toDF("user_id", "secs", "event_id", "value")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("value"))
    all.createOrReplaceTempView("t_over_range_in")
    val want = spark.sql(
        """SELECT user_id, event_id,
          |  COUNT(1) OVER (PARTITION BY user_id ORDER BY ts
          |    RANGE BETWEEN INTERVAL 60 SECONDS PRECEDING AND CURRENT ROW)
          |    AS n
          |FROM t_over_range_in""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    // pin the peer-group contract explicitly: events 4 and 5 both see
    // {2, 4, 5} (event 1 pruned, both peers counted)
    assert(got.contains((1L, 4L, 3L)) && got.contains((1L, 5L, 3L)))
  }

  test("streaming CUMULATE prefix windows equal the batch expansion") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    val df = mem.toDF().toDF("secs", "value")
      .select(col("secs").cast("timestamp").as("ts"), col("value"))
    // 1 h max window, 20 min steps, 1 s lateness so the watermark chases
    // event time closely
    val q = Streams.cumulateAgg(df, maxSizeMs = 3600000L,
        stepMs = 1200000L, lateness = "1 second")
      .writeStream.format("memory").queryName("t_cumulate")
      .outputMode("append").start()
    val h = 3600L
    // hour 0: events in slices 0, 1, 2; hour 1: slice 0 only; events
    // split across batches mid-hour so partials carry over
    mem.addData((600L, 1.50), (700L, 2.25))
    q.processAllAvailable()
    mem.addData((1500L, 4.00), (2500L, 8.00), (h + 60L, 16.00))
    q.processAllAvailable()
    // sentinel far in the future: pushes the watermark past every
    // prefix end of hours 0 and 1 (its own window stays open, unemitted)
    mem.addData((10 * h, 0.0))
    q.processAllAvailable()
    val got = spark.table("t_cumulate").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getTimestamp(1).getTime / 1000,
        r.getLong(2), r.getDouble(3))).toSet
    q.stop()
    // batch twin: explode each event into its prefix windows, aggregate
    val want = Set(
      (0L, 1200L, 2L, 3.75),          // [0, 20min): events at 600, 700
      (0L, 2400L, 3L, 7.75),          // [0, 40min): + 1500
      (0L, 3600L, 4L, 15.75),         // [0, 60min): + 2500
      (h, h + 1200L, 1L, 16.00),      // hour 1 prefixes all hold event 1
      (h, h + 2400L, 1L, 16.00),
      (h, h + 3600L, 1L, 16.00))
    assert(got === want)
  }

  test("events staging keys scratch dirs by full path md5 (no collisions)") {
    // two fixture dirs must stage into two distinct scratch dirs whose
    // contents match their own source (a 32-bit hashCode key could
    // collide and cross-contaminate)
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val staged = dirs.map { d =>
      Streams.events(spark, d) // stages eagerly
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft_streams", key, "events.parquet")
      assert(java.nio.file.Files.exists(p), s"not staged: $p")
      assert(java.nio.file.Files.size(p) ===
        java.nio.file.Files.size(java.nio.file.Paths.get(d, "events.parquet")))
      p
    }
    assert(staged.distinct.size === 2)
  }

  test("event-time keep-first dedup: late-but-earlier duplicate wins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "value")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("value"))
    val q = Streams.dedupKeepFirstEventTime(df, lateness = "1 minute")
      .writeStream.format("memory").queryName("t_dedup_et")
      .outputMode("append").start()
    val h = 3600L
    // batch 1: user 1's first-arriving row at t=100s
    mem.addData((1L, 100L, 10L, 1.0))
    q.processAllAvailable()
    // batch 2: an EARLIER duplicate (t=50s) arrives late but inside the
    // lateness horizon (watermark after batch 1 is 100-60=40s) — it must
    // replace the held row; a far-future row pushes the watermark past
    // 100s so user 1 finalizes
    mem.addData((1L, 50L, 9L, 2.0), (2L, 2 * h, 20L, 3.0))
    q.processAllAvailable()
    // batch 3: watermark moves past user 2's row too; also a post-emit
    // duplicate for user 1 that must NOT produce a second row
    mem.addData((1L, 150L, 11L, 4.0), (3L, 4 * h, 30L, 5.0))
    q.processAllAvailable()
    mem.addData((4L, 8 * h, 40L, 6.0))
    q.processAllAvailable()
    val got = spark.table("t_dedup_et").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    q.stop()
    // user 1 → the late-but-earlier id 9 (arrival-order dedup would keep
    // id 10); exactly one row despite the post-emission duplicate
    assert(got.contains(1L -> 9L))
    assert(!got.exists(p => p._1 == 1L && p._2 != 9L))
    assert(got.contains(2L -> 20L))
  }

  test("event-time stream sort emits rows in event-time order, not arrival order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "value")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("value"))
    val q = Streams.eventTimeSortStream(df, lateness = "1 minute")
      .writeStream.format("memory").queryName("t_et_sort")
      .outputMode("append").start()
    val h = 3600L
    // batch 1: user 1 arrives OUT of event-time order (300s before 100s);
    // after the batch the watermark advances to 300-60 = 240s, sealing
    // and emitting the 100s row while the 300s row stays held
    mem.addData((1L, 300L, 13L, 1.0), (1L, 100L, 11L, 2.0))
    q.processAllAvailable()
    // batch 2: a row BETWEEN the held row and the watermark (250s —
    // above 240s, so not late) must emit before the 300s row; a
    // far-future row then advances the watermark past both
    mem.addData((1L, 250L, 12L, 3.0), (2L, 2 * h, 20L, 4.0))
    q.processAllAvailable()
    // batch 3: drain user 2 as well
    mem.addData((3L, 4 * h, 30L, 5.0))
    q.processAllAvailable()
    mem.addData((4L, 8 * h, 40L, 6.0))
    q.processAllAvailable()
    // memory sink appends per batch in emission order; within a key the
    // emitted sequence must be event-time sorted and complete
    val u1 = spark.table("t_et_sort").collect()
      .filter(_.getLong(0) == 1L).map(_.getLong(2)).toSeq
    q.stop()
    assert(u1 === Seq(11L, 12L, 13L),
      s"arrival order was 13,11,12 — event-time order expected, got $u1")
  }

  test("changelog sink emits +I/-U/+U per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Double)]
    val agg = mem.toDF().toDF("k", "v")
      .groupBy(col("k")).count()
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    val cs = new Streams.ChangelogSink(Seq("k"))
    val q = agg.writeStream
      .outputMode("update")
      .foreachBatch(cs((df, id) => df.collect().foreach(r =>
        seen += ((id, r.getString(0), r.getString(1), r.getLong(2))))))
      .start()
    mem.addData(("a", 1.0), ("a", 2.0))
    q.processAllAvailable()
    mem.addData(("a", 3.0), ("b", 1.0))
    q.processAllAvailable()
    q.stop()
    val batch0 = seen.filter(_._1 == 0L).map(t => (t._2, t._3, t._4)).toSet
    val batch1 = seen.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).toSet
    assert(batch0 === Set(("+I", "a", 2L)))
    assert(batch1 === Set(("-U", "a", 2L), ("+U", "a", 3L), ("+I", "b", 1L)))
  }

  test("changelog round trip: sink -> ingest rebuilds the aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Double)]
    val agg = mem.toDF().toDF("k", "v").groupBy(col("k")).count()
    val cs = new Streams.ChangelogSink(Seq("k"))
    val ci = new Streams.ChangelogIngest(Seq("k"))
    val q = agg.writeStream
      .outputMode("update")
      .foreachBatch(cs((df, _) => ci(df)))
      .start()
    mem.addData(("a", 1.0), ("a", 2.0), ("c", 9.0))
    q.processAllAvailable()
    mem.addData(("a", 3.0), ("b", 1.0))
    q.processAllAvailable()
    q.stop()
    val got = ci.materialized.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // the ingested table equals the direct batch aggregation of all data
    assert(got === Set(("a", 3L), ("b", 1L), ("c", 1L)))
  }

  test("dropUpdateBefore: identical upsert materialization, -U traffic gone") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Double)]
    val agg = mem.toDF().toDF("k", "v").groupBy(col("k")).count()
    val cs = new Streams.ChangelogSink(Seq("k"))
    val ci = new Streams.ChangelogIngest(Seq("k"))
    var sawMinusU = 0L
    var total = 0L
    val q = agg.writeStream
      .outputMode("update")
      .foreachBatch(cs { (df, _) =>
        val d = df.persist()
        sawMinusU += d.where(col("op") === "-U").count()
        val pruned = Streams.dropUpdateBefore(d)
        total += pruned.count()
        ci(pruned)
        d.unpersist(): Unit
      })
      .start()
    mem.addData(("a", 1.0), ("a", 2.0), ("c", 9.0))
    q.processAllAvailable()
    mem.addData(("a", 3.0), ("b", 1.0)) // 'a' updates → a -U is emitted
    q.processAllAvailable()
    q.stop()
    val got = ci.materialized.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // same materialization as the unpruned round trip; the -U rows
    // existed upstream and none crossed the filter
    assert(got === Set(("a", 3L), ("b", 1L), ("c", 1L)))
    assert(sawMinusU > 0, "fixture produced no -U rows — vacuous test")
    assert(total > 0)
  }

  test("queryableState: external point lookups + batch time-travel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_qstate").toString
    val mem = MemoryStream[(Long, Double)]
    val agg = mem.toDF().toDF("k", "v").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val q = agg.writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    mem.addData((1L, 2.0), (1L, 3.0), (2L, 5.0))
    q.processAllAvailable()
    mem.addData((1L, 10.0))
    q.processAllAvailable()
    q.stop()
    // point lookup against the LATEST state: key 1 saw three rows
    val point = Streams.queryableState(spark, ckpt)
      .where(col("key.k") === 1L)
      .select(col("value.count"), col("value.sum")).collect()
    assert(point.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((3L, 15.0)))
    // time-travel to batch 0: key 1 had only its first two rows
    val old = Streams.queryableState(spark, ckpt, batchId = Some(0L))
      .where(col("key.k") === 1L)
      .select(col("value.count"), col("value.sum")).collect()
    assert(old.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((2L, 5.0)))
    // full-state scan: both keys present
    assert(Streams.queryableState(spark, ckpt)
      .select(col("key.k")).collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L))
  }

  test("changelogNormalizeStream: upserts, delete, out-of-order shield") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Long, Long, Long)]
    val changes = mem.toDF().toDF("op", "k", "secs", "pay")
      .select(col("op"), col("k"),
        col("secs").cast("timestamp").as("ts"), col("pay"))
    val q = Streams.changelogNormalizeStream(changes, "k", "ts", "pay")
      .writeStream.format("memory").queryName("t_chg_norm")
      .outputMode("append").start()
    mem.addData(("+I", 1L, 10L, 100L), ("+U", 1L, 20L, 101L),
      ("+I", 2L, 10L, 200L))
    q.processAllAvailable()
    // batch 2: delete key 2; a STALE upsert for key 1 (ts 15 < current
    // 20) must be ignored; -U rows change nothing
    mem.addData(("-D", 2L, 30L, 0L), ("+U", 1L, 15L, 999L),
      ("-U", 1L, 25L, 101L), ("+I", 3L, 5L, 300L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_chg_norm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // materialized view = latest emission per key
    val current = rows.groupBy(_._1).map { case (k, es) =>
      k -> es.maxBy(_._2)
    }
    assert(current(1L) === (1L, 20000L, 101L, true)) // stale 999 ignored
    assert(current(2L)._4 === false) // deleted
    assert(current(3L) === (3L, 5000L, 300L, true))
  }

  test("watermark drops late data; windows emit once finalized (append)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val df = mem.toDF()
      .toDF("event_id", "secs", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("secs").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val q = Streams.tumbleAgg(df, size = "1 hour", lateness = "10 minutes")
      .writeStream.format("memory").queryName("t_late")
      .outputMode("append").start()
    val h = 3600L
    // batch 1: events in hour 3 → watermark advances to 03:30-10min
    mem.addData((1L, 3 * h, 1L, "a", 1.0, "{}"),
      (2L, 3 * h + 1800, 1L, "a", 1.0, "{}"))
    q.processAllAvailable()
    // batch 2: an hour-0 straggler (far below watermark → dropped) and an
    // hour-5 event that pushes the watermark past hour 3's end
    mem.addData((3L, 5L, 1L, "a", 100.0, "{}"),
      (4L, 5 * h, 1L, "a", 1.0, "{}"))
    q.processAllAvailable()
    val out = spark.table("t_late").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(2)))
    q.stop()
    // hour-3 window finalized with exactly its 2 on-time rows; the late
    // hour-0 row contributed nothing anywhere
    assert(out.toSet === Set((3 * h, 2L)))
  }

  test("checkpointed parquet sink is exactly-once across restarts") {
    val base = java.nio.file.Files.createTempDirectory("graft_eo").toString
    def runOnce(): Unit = {
      val q = Streams.events(spark, sf).writeStream
        .format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val n1 = spark.read.parquet(s"$base/out").count()
    assert(n1 === graft.engine.Tables.load(spark, sf, "events").count())
    // restart against the same checkpoint: no source progress → no dupes
    runOnce()
    val n2 = spark.read.parquet(s"$base/out").count()
    assert(n2 === n1, "restart duplicated rows — exactly-once broken")
  }

  test("custom keyed state survives a checkpointed restart") {
    // the reference's state-backend recovery contract for custom keyed
    // operators: a flatMapGroupsWithState count-window buffers 2 of 3
    // events, the query STOPS, and a restarted query (same checkpoint)
    // must complete the window from RECOVERED state — an emission of
    // (n=3, sum over both runs) proves the buffer crossed the restart
    import org.apache.spark.sql.types._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_state").toString
    val srcDir = s"$base/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("value", DoubleType)))
    def run(): Unit = {
      val in = spark.readStream.schema(schema).parquet(srcDir)
      val q = Streams.countWindows(in, size = 3).writeStream
        .format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/cp")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Seq((7L, 1.0), (7L, 2.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run() // buffers 2 events in state, emits nothing
    Seq((7L, 4.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run() // restart: only the new file is unread; state must carry over
    val got = spark.read.parquet(s"$base/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((7L, 0L, 3L, 7.0)),
      s"state did not survive the restart: ${got.toSeq}")
  }

  test("epoch reconfiguration: config re-read at micro-batch boundaries") {
    val ctrl = new ReconfigController[Int](10)
    @volatile var seen = Vector.empty[(Long, Int)]
    val body = EpochReconfig.withConfig(ctrl) { (df, batchId, cfg) =>
      seen = seen :+ (batchId, cfg)
      df.count(): Unit
    }
    def runOnce(): Unit = {
      val q = Streams.events(spark, sf).writeStream
        .foreachBatch(body)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(seen.nonEmpty && seen.forall(_._2 == 10))
    val before = seen.size
    ctrl.publish(99)
    runOnce()
    // every batch after the publish epoch sees the new config, none before
    assert(seen.take(before).forall(_._2 == 10))
    assert(seen.drop(before).nonEmpty && seen.drop(before).forall(_._2 == 99))
    assert(ctrl.roundTripsMs.size == 2)
  }

  test("jdbc upsert sink: update-mode counts converge in the store; " +
      "re-delivered batches are idempotent") {
    // reference JdbcUpsertTableSink: an update-mode aggregation's
    // changed-key batches upsert into Derby; the final table equals the
    // batch aggregate of the full input, and re-applying a batch (the
    // at-least-once case) leaves the table unchanged
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val url = "jdbc:derby:memory:graft_upsert;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    // create the target with the sink's schema (empty)
    spark.emptyDataset[(String, Long)].toDF("k", "n")
      .write.mode("overwrite")
      .option("createTableColumnTypes", "k VARCHAR(16)")
      .jdbc(url, "COUNTS", props)
    import org.apache.spark.sql.functions.{count, lit}
    val mem = MemoryStream[String]
    val counts = mem.toDF().toDF("k").groupBy("k")
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream.outputMode("update")
      .foreachBatch(Streams.jdbcUpsertSink(url, "COUNTS", "k"))
      .trigger(Trigger.ProcessingTime(0)).start()
    mem.addData("a", "b", "a"); q.processAllAvailable()
    mem.addData("a", "c"); q.processAllAvailable()
    q.stop()
    def table(): Map[String, Long] =
      spark.read.jdbc(url, "COUNTS", props).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(table() === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    // idempotence: re-deliver a batch with the current values — the
    // delete+insert upsert converges to the same table
    Streams.jdbcUpsertSink(url, "COUNTS", "k")(
      Seq(("a", 3L), ("c", 1L)).toDF("k", "n"), 99L)
    assert(table() === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    // and an upsert batch with a NEW value replaces, never duplicates
    Streams.jdbcUpsertSink(url, "COUNTS", "k")(
      Seq(("a", 7L)).toDF("k", "n"), 100L)
    assert(table() === Map("a" -> 7L, "b" -> 1L, "c" -> 1L))
  }

  test("jdbc upsert sink: SQL NULL values round-trip (setObject, not " +
      "setNull(Types.NULL) which Derby rejects)") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graft_upsert_null;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    spark.emptyDataset[(String, Option[Long])].toDF("k", "n")
      .write.mode("overwrite")
      .option("createTableColumnTypes", "k VARCHAR(16)")
      .jdbc(url, "NCOUNTS", props)
    Streams.jdbcUpsertSink(url, "NCOUNTS", "k")(
      Seq(("a", Some(5L)), ("b", Option.empty[Long])).toDF("k", "n"), 0L)
    val got = spark.read.jdbc(url, "NCOUNTS", props).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(got === Map("a" -> Some(5L), "b" -> None))
    // and a null can OVERWRITE a non-null (the update path binds nulls too)
    Streams.jdbcUpsertSink(url, "NCOUNTS", "k")(
      Seq(("a", Option.empty[Long])).toDF("k", "n"), 1L)
    val got2 = spark.read.jdbc(url, "NCOUNTS", props).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(got2 === Map("a" -> None, "b" -> None))
  }

  test("jdbc upsert sink: orderCol keeps the greatest-ordered row per " +
      "key deterministically") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graft_upsert_ord;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    spark.emptyDataset[(String, Long, Long)].toDF("k", "v", "seq")
      .write.mode("overwrite")
      .option("createTableColumnTypes", "k VARCHAR(16)")
      .jdbc(url, "ORD", props)
    // 3 rows for key a in scrambled order + 1 for b: without orderCol the
    // survivor is arbitrary; with orderCol = seq the seq=30 row must win
    // regardless of partitioning or arrival order
    Streams.jdbcUpsertSink(url, "ORD", "k", orderCol = Some("seq"))(
      Seq(("a", 2L, 20L), ("b", 9L, 1L), ("a", 3L, 30L), ("a", 1L, 10L))
        .toDF("k", "v", "seq").repartition(4), 0L)
    val got = spark.read.jdbc(url, "ORD", props).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map("a" -> (3L, 30L), "b" -> (9L, 1L)))
  }

  test("jdbc upsert sink: converges under a mid-partition task failure " +
      "(chaos) via rollback + scheduler retry") {
    // the convergence claim proven, not argued: one task of the upsert
    // batch dies AFTER part of its transaction is built (chunkSize=1 →
    // earlier chunks of the same partition already executed DELETE+
    // INSERT inside the open transaction). The per-partition transaction
    // must roll back, Spark's retry (local[n, 2]) re-runs the partition,
    // and the store must equal EXACTLY the batch's keyed state — no
    // loss, no duplicates, no torn partition. Reference analogue:
    // JdbcBatchingOutputFormat's retry/flush semantics.
    import spark.implicits._
    val url = "jdbc:derby:memory:graft_upsert_chaos;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    spark.emptyDataset[(String, Long)].toDF("k", "n")
      .write.mode("overwrite")
      .option("createTableColumnTypes", "k VARCHAR(16)")
      .jdbc(url, "CHAOS", props)
    // pre-existing state: the upsert's delete path participates in the
    // rolled-back transaction too — a torn rollback would lose "a"
    Streams.jdbcUpsertSink(url, "CHAOS", "k")(
      Seq(("a", 100L), ("z", 26L)).toDF("k", "n"), 0L)
    val keys = ('a' to 'h').map(_.toString)
    val batch = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
    StreamingSpec.chaosFired.set(false)
    val hook: org.apache.spark.sql.Row => Unit = r =>
      if (r.getString(0) == "f" &&
          !StreamingSpec.chaosFired.getAndSet(true))
        throw new RuntimeException("chaos: injected mid-partition fault")
    SparkFixture.quietExpectedTaskFailures {
      Streams.jdbcUpsertSink(url, "CHAOS", "k", chunkSize = 1,
        faultHook = hook)(batch.toDF("k", "n"), 1L)
    }
    assert(StreamingSpec.chaosFired.get(), "fault was never injected")
    val got = spark.read.jdbc(url, "CHAOS", props).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = batch.toMap + ("z" -> 26L) // untouched key survives
    assert(got === want,
      s"store diverged after chaos: got $got, want $want")
  }
}

object StreamingSpec {
  /** Cross-task flag for the chaos test (same JVM in local mode). */
  val chaosFired = new java.util.concurrent.atomic.AtomicBoolean(false)
}
