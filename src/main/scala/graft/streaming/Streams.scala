package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Structured Streaming layer (SURVEY.md §2.9): the same event-table
  * operators the batch catalog exposes, run as streams — watermarks,
  * tumble/hop/session windows, streaming dedup — plus the epoch hooks in
  * graft.fries.
  *
  * Design: every batch query in graft.queries.EventQueries is a plain
  * DataFrame transform, so the streaming layer re-declares only the
  * stream-specific pieces (source, watermark, output mode); Catalyst
  * plans the rest identically. The reference needs a separate runtime
  * for this (StreamExec* vs BatchExec* nodes); Spark does not.
  *
  * Scale: file-source streams at 100 TB would set maxFilesPerTrigger to
  * bound batch size; state-store-backed aggs (window/dedup) shuffle by
  * (key, window) once per batch and keep state partitioned — identical
  * partitioning story to the batch plans.
  */
object Streams {

  /** events.parquet stream-source schema: ts declared as whatever the
    * fixture generation wrote — raw long (TIMESTAMP(NANOS) under
    * nanosAsLong — Spark rejects NANOS natively) or micros NTZ — and
    * normalized to TimestampType after the scan (graft.engine.Tables
    * documents the encodings). The file source needs the schema declared
    * up front, so the on-disk variant is probed once per call with a
    * driver-side batch footer read. */
  private def eventsRawSchema(tsType: org.apache.spark.sql.types.DataType) =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** The events fixture as a bounded stream. Spark's file stream source
    * monitors a DIRECTORY; the fixture is a single file, so it is staged
    * (hard-linked/copied once) into a scratch dir keyed by the source
    * path — exactly how a production events feed would land files. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = java.nio.file.Paths.get(dir, "events.parquet")
    // ONE scratch dir per source path, keyed by an md5 of the FULL path
    // (a 32-bit hashCode could collide across two fixture dirs and
    // cross-contaminate their staged streams); a stamp marker
    // (mtime + size) detects fixture regeneration — stale contents are
    // wiped and restaged rather than served from a dead hard link, and
    // no per-version sibling dirs accumulate in tmp
    val pathKey = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val streamDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_streams", pathKey)
    java.nio.file.Files.createDirectories(streamDir)
    val stamp = s"${java.nio.file.Files.getLastModifiedTime(src)}|" +
      s"${java.nio.file.Files.size(src)}"
    val marker = streamDir.resolve("_stamp")
    val dst = streamDir.resolve("events.parquet")
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker)) == stamp
    if (!fresh) {
      java.nio.file.Files.deleteIfExists(dst)
      try java.nio.file.Files.createLink(dst, src)
      catch {
        case _: Exception => java.nio.file.Files.copy(src, dst)
      }
      java.nio.file.Files.write(marker, stamp.getBytes)
    }
    val tsType = spark.read.parquet(src.toString).schema("ts").dataType
    graft.engine.Tables.normalizeEventTs(
      spark.readStream
        .schema(eventsRawSchema(tsType))
        .parquet(streamDir.toString))
  }

  /** Tumbling-window count/sum with event-time watermark (reference
    * WindowOperator.java:96 + WatermarkStrategy.forBoundedOutOfOrderness). */
  def tumbleAgg(events: DataFrame, size: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), size), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding (hop) window aggregation. */
  def hopAgg(events: DataFrame, size: String = "1 hour",
      slide: String = "15 minutes", lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), size, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))

  /** Session windows with a gap (reference EventTimeSessionWindows). */
  def sessionAgg(events: DataFrame, gap: String = "5 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("n"))

  /** Session windows WITH MEMBERSHIP on the transformWithState API
    * (Spark 4's arbitrary-state operator — the modern home for what the
    * reference does with keyed ListState + event-time timers in its
    * window operator, WindowOperator.java's (state, timer) pair): each
    * session emits its full member event-id list when the watermark
    * passes last-event + gap, which the built-in `session_window`
    * aggregation cannot express (it folds, it can't enumerate).
    *
    * State per key: one RocksDB-backed ListState of (ts, id) pairs for
    * OPEN sessions only (cleared on close) + one timer. Requires the
    * RocksDB state store provider (`GraftSession` config or
    * `spark.sql.streaming.stateStore.providerClass`), and a watermarked
    * `ts` on the input. Input cols: user_id, ts, event_id; output
    * (user_id, start_ms, end_ms, n_events, event_ids). */
  def sessionizeWithState(events: DataFrame, gapMs: Long): DataFrame = {
    require(gapMs > 0, s"bad gapMs=$gapMs")
    val spark = events.sparkSession
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    val proc = new StatefulProcessor[Long,
        (Long, Long, java.sql.Timestamp),
        (Long, Long, Long, Long, Seq[Long])] {
      @transient private var buf:
          org.apache.spark.sql.streaming.ListState[(Long, Long)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        buf = getHandle.getListState[(Long, Long)]("events",
          // session-independent encoder: resolving via spark.implicits
          // would close over the SparkSession and break task
          // serialization once anything (e.g. an Observation) has
          // initialized the session's lazy observation manager
          org.apache.spark.sql.Encoders.product[(Long, Long)],
          TTLConfig.NONE)
      private def split(evs: Array[(Long, Long)])
          : List[scala.collection.mutable.ArrayBuffer[(Long, Long)]] =
        if (evs.isEmpty) Nil
        else evs.tail.foldLeft(
          List(scala.collection.mutable.ArrayBuffer(evs.head))) {
          (acc, e) =>
            if (e._1 - acc.head.last._1 <= gapMs) { acc.head += e; acc }
            else scala.collection.mutable.ArrayBuffer(e) :: acc
        }.reverse
      private def rearm(): Unit = {
        getHandle.listTimers().foreach(t =>
          getHandle.deleteTimer(t.asInstanceOf[Long]))
        val evs = buf.get().toArray.sortBy(e => (e._1, e._2))
        // the timer must fire when the EARLIEST buffered session can
        // close (first session's last event + gap) — anchoring at the
        // global max would starve a continuously active key forever
        split(evs).headOption.foreach(s =>
          getHandle.registerTimer(s.last._1 + gapMs))
      }
      override def handleInputRows(key: Long,
          rows: Iterator[(Long, Long, java.sql.Timestamp)],
          timerValues: TimerValues)
          : Iterator[(Long, Long, Long, Long, Seq[Long])] = {
        rows.foreach(r => buf.appendValue((r._3.getTime, r._2)))
        rearm()
        Iterator.empty
      }
      override def handleExpiredTimer(key: Long,
          timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo)
          : Iterator[(Long, Long, Long, Long, Seq[Long])] = {
        val wm = timerValues.getCurrentWatermarkInMs()
        val evs = buf.get().toArray.sortBy(e => (e._1, e._2))
        buf.clear()
        // emit only sessions the watermark actually sealed (last event +
        // gap ≤ wm); later sessions — including a still-growing tail —
        // go back into state and the timer re-arms for the next close
        val (closed, open) = split(evs).partition(_.last._1 + gapMs <= wm)
        open.flatten.foreach(buf.appendValue)
        rearm()
        closed.iterator.map { s =>
          (key, s.head._1, s.last._1, s.length.toLong, s.map(_._2).toSeq)
        }
      }
    }
    typed.groupByKey(_._1)
      .transformWithState(proc, TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "start_ms", "end_ms", "n_events", "event_ids")
  }

  /** Session windows with a DYNAMIC per-event gap (reference
    * DynamicEventTimeSessionWindows + SessionWindowTimeGapExtractor —
    * flink-streaming-java window assigners): each event opens a window
    * [ts, ts + gap(event)); overlapping windows merge — exactly the
    * batch `session_window(ts, gapExpr)` semantics that
    * `q_window_session_dynamic` oracle-checks. The gap extractor is a
    * Column evaluated per event BEFORE the stateful operator (the
    * Spark-idiomatic analogue of the reference's extractor interface:
    * any row-derived expression works, and it runs in codegen, not in
    * the state loop).
    *
    * State per key: ListState of OPEN (ts_ms, end_ms, event_id,
    * value_cents) rows + one event-time timer just past the earliest
    * open session's max end — the first instant the watermark can seal
    * anything (anchoring later would starve a continuously active
    * key, the sessionizeWithState lesson). Merge is INCLUSIVE at the
    * boundary — an event at exactly a session's end extends it, which
    * is the batch built-in's behavior (probed: two events 5 s apart
    * with a 5 s gap form ONE session) — so a session is sealed only
    * when wm > max(end): a future event can still tie max(end) when
    * wm == max(end). Emits (user_id, s_start_ms, n, sum_value) with
    * the catalog's exact cent-scaled sum — bit-identical to the batch
    * `dsum`.
    * Input cols: user_id, ts (watermarked), event_id, value;
    * `gapMs` = per-event gap in milliseconds. */
  def sessionAggDynamic(events: DataFrame, gapMs: Column): DataFrame = {
    val spark = events.sparkSession
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
    import spark.implicits._
    val typed = events
      .select(col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        (unix_millis(col("ts")) + gapMs.cast("long")).as("end_ms"),
        col("event_id"),
        // exact 2-decimal accumulation (Catalog.scaledLong): round each
        // value to cents here so the state loop only sums longs
        (col("value") * 100 + when(col("value") < 0, lit(-0.5))
          .otherwise(lit(0.5))).cast("long").as("cents"))
      .as[(Long, Long, Long, Long, Long)]
    val proc = new StatefulProcessor[Long,
        (Long, Long, Long, Long, Long),
        (Long, Long, Long, Double)] {
      @transient private var buf:
          org.apache.spark.sql.streaming.ListState[(Long, Long, Long, Long)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        buf = getHandle.getListState[(Long, Long, Long, Long)]("open",
          // session-independent (see sessionizeWithState)
          org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)],
          TTLConfig.NONE)
      // merge-by-overlap partition: sorted by (ts, id), an event joins
      // the current session iff its ts is AT or under the running max
      // end (inclusive boundary, matching the batch built-in)
      private def split(evs: Array[(Long, Long, Long, Long)])
          : List[scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]] = {
        var out = List.empty[scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]]
        var maxEnd = Long.MinValue
        evs.foreach { e =>
          if (out.nonEmpty && e._1 <= maxEnd) {
            out.head += e
            maxEnd = math.max(maxEnd, e._2)
          } else {
            out = scala.collection.mutable.ArrayBuffer(e) :: out
            maxEnd = e._2
          }
        }
        out.reverse
      }
      private def sessions()
          : List[scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]] =
        split(buf.get().toArray.sortBy(e => (e._1, e._3)))
      private def rearm(ss: List[scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]]): Unit = {
        getHandle.listTimers().foreach(t =>
          getHandle.deleteTimer(t.asInstanceOf[Long]))
        // +1: the session stays extendable while wm == maxEnd (an event
        // at exactly maxEnd still merges), so fire strictly past it
        ss.headOption.foreach(s => getHandle.registerTimer(s.map(_._2).max + 1))
      }
      override def handleInputRows(key: Long,
          rows: Iterator[(Long, Long, Long, Long, Long)],
          timerValues: TimerValues): Iterator[(Long, Long, Long, Double)] = {
        rows.foreach(r => buf.appendValue((r._2, r._3, r._4, r._5)))
        rearm(sessions())
        Iterator.empty
      }
      override def handleExpiredTimer(key: Long,
          timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo)
          : Iterator[(Long, Long, Long, Double)] = {
        val wm = timerValues.getCurrentWatermarkInMs()
        val ss = sessions()
        val (closed, open) = ss.partition(_.map(_._2).max < wm)
        buf.clear()
        open.flatten.foreach(buf.appendValue)
        rearm(open)
        closed.iterator.map { s =>
          (key, s.head._1, s.length.toLong, s.map(_._4).sum / 100.0)
        }
      }
    }
    typed.groupByKey(_._1)
      .transformWithState(proc, TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "start_ms", "n", "sum_value")
  }

  /** Unwindowed streaming group aggregation in update mode (reference
    * StreamExecGroupAggregate.java:71 / GroupAggFunction keyed-state
    * aggregation): per-key running count/sum, each micro-batch emitting
    * updated rows only — Spark's state store holds the running aggregate
    * exactly as the reference's keyed ValueState does. */
  def groupAggUpdate(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))

  /** Streaming dedup on event_id within the watermark horizon (reference
    * StreamExecDeduplicate.java:70 / RowTimeDeduplicateFunction). */
  def dedup(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicates("event_id")

  /** Event-time keep-first dedup (reference RowTimeDeduplicateFunction
    * keep-first-row under out-of-orderness, SURVEY §7 hard item 7):
    * unlike [[dedup]] (which emits whichever duplicate ARRIVES first),
    * this holds each key's minimum-event-time row in keyed state and
    * emits it only when the watermark passes that row's timestamp — so a
    * late-arriving but earlier-timestamped duplicate still wins. State
    * per key is one row + one event-time timer; the state clears on
    * emission, exactly the reference's keyed-state + timer shape. Emits
    * (user_id, ts, event_id, value). */
  def dedupKeepFirstEventTime(events: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .withWatermark("ts", lateness)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    // state: (eventMs, id, value, emitted) — after emission the entry
    // stays as a tombstone so later rows for the key are recognized as
    // duplicates, exactly the reference's state-TTL contract (clear it
    // with a TTL policy when the dedup horizon passes)
    val out = typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Double, Boolean), (Long, java.sql.Timestamp, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long, Double)],
            state: GroupState[(Long, Long, Double, Boolean)]) =>
          if (state.hasTimedOut) {
            // watermark passed the held row's event time: no earlier
            // duplicate can arrive — emit once, tombstone the key
            val (ms, id, v, _) = state.get
            state.update((ms, id, v, true))
            Iterator.single((user, new java.sql.Timestamp(ms), id, v))
          } else if (state.getOption.exists(_._4)) {
            Iterator.empty // already emitted: every later row is a dup
          } else {
            val best = (it.map(e => (e._2.getTime, e._3, e._4)) ++
              state.getOption.iterator.map(s => (s._1, s._2, s._3)))
              .minBy(r => (r._1, r._2))
            state.update((best._1, best._2, best._3, false))
            // fire once the watermark clears the held event time (the
            // timer must sit strictly above the current watermark)
            state.setTimeoutTimestamp(
              math.max(best._1, state.getCurrentWatermarkMs + 1))
            Iterator.empty
          }
      }
    out.toDF("user_id", "ts", "event_id", "value")
  }

  /** Event-time stream sort (reference RowTimeSortOperator / a
    * StreamExecSort on a rowtime key): emits each key's rows in EVENT-time
    * order, not arrival order, holding a row only until the watermark
    * passes its timestamp (at which point nothing earlier can arrive).
    * The reference sorts per parallel instance; here the unit is the key
    * — keys scale out, and per-key output order is total: a batch emits
    * only rows at-or-below the current watermark (sorted), and every
    * later-arriving row is strictly above that watermark, so appended
    * emissions never interleave backwards. State per key = the rows
    * inside the watermark horizon (bounded by lateness × rate) + one
    * event-time timer that drains the buffer as the watermark advances
    * even when the key goes quiet. Emits (user_id, ts, event_id, value).
    *
    * CONSUME FROM A SINK (or a non-event-time operator): rows emit with
    * timestamps at-or-below this operator's current watermark, so a
    * downstream event-time stateful operator (window agg, stream-stream
    * join, another watermark) would classify the ENTIRE output as late
    * and drop it — Spark propagates watermarks through chained stateful
    * operators, unlike the reference's rowtime sort, which forwards
    * elements just ahead of the watermark. Sort last, not mid-pipeline. */
  def eventTimeSortStream(events: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .withWatermark("ts", lateness)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    val out = typed.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long, Double)], (Long, java.sql.Timestamp, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        // state: (eventMs, id, value) rows inside the watermark horizon
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long, Double)],
            state: GroupState[List[(Long, Long, Double)]]) =>
          val buf = state.getOption.getOrElse(Nil) ++
            it.map(e => (e._2.getTime, e._3, e._4))
          val wm = state.getCurrentWatermarkMs
          val (ready, open) = buf.partition(_._1 <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // drain on the next watermark advance past the earliest
            // held row (timers must sit strictly above the watermark)
            state.setTimeoutTimestamp(
              math.max(open.map(_._1).min, wm + 1))
          }
          ready.sortBy(r => (r._1, r._2)).iterator
            .map(r => (user, new java.sql.Timestamp(r._1), r._2, r._3))
      }
    out.toDF("user_id", "ts", "event_id", "value")
  }

  /** STREAMING sequence packing — the ingest-time twin of
    * `Ops.packByTokenBudget` (greedy reset-on-overflow packing of
    * documents into ≤`budget`-token bins): arriving documents append to
    * their shard's open bin, a doc that would overflow it opens the next
    * bin. The shard column is the parallel unit (the batch operator's
    * id-range block analogue — at ingest the shard is whatever routing
    * key the feed carries, e.g. `doc_id % nShards`); bins never span
    * shards and bin_id = shard << 32 | local, the batch encoding.
    * State per shard is O(1): (open-bin seq, open-bin fill). Docs are
    * packed in id order WITHIN a batch and arrival order across batches
    * — feed id-ordered shards and the assignment equals the batch
    * operator's exactly (PipelineStreamSpec pins it). Output:
    * (shard, id, n_tokens, bin_id), one row per input doc. */
  def packByTokenBudgetStream(docs: DataFrame, budget: Long,
      shardCol: String = "shard", idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = docs.select(col(shardCol).cast("long").as("shard"),
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("n"))
      .as[(Long, Long, Long)]
    val out = typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, it: Iterator[(Long, Long, Long)],
            state: GroupState[(Long, Long)]) =>
          // (open bin seq, open bin fill); a fresh shard starts with an
          // EMPTY bin 0 that the first doc always enters — the batch
          // fold's block-boundary reset, reproduced bump-rule and all
          var (bin, filled) = state.getOption.getOrElse((0L, 0L))
          var fresh = !state.exists
          val emitted = scala.collection.mutable.ListBuffer
            .empty[(Long, Long, Long, Long)]
          it.toArray.sortBy(_._2).foreach { case (_, id, n) =>
            require(n >= 0, s"packByTokenBudgetStream: negative token " +
              s"count $n for id $id")
            if (!fresh && filled + n > budget) { bin += 1; filled = 0L }
            fresh = false
            filled += n
            emitted += ((shard, id, n, (shard << 32) | bin))
          }
          state.update((bin, filled))
          emitted.iterator
      }
    out.toDF("shard", "id", "n_tokens", "bin_id")
  }

  /** Count-based tumbling windows per key (DataStream countWindow —
    * reference flink-streaming-java CountTrigger/GlobalWindows; Spark has
    * no native count windows). Custom keyed state via
    * flatMapGroupsWithState: emits one row per completed window of `size`
    * events, carrying (window seq, count, sum). Window membership is
    * processing-order-dependent, exactly as in the reference. */
  def countWindows(events: DataFrame, size: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val out = events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Double), (Long, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Double)],
            state: GroupState[(Long, Long, Double)]) =>
          var (seq, cnt, sum) = state.getOption.getOrElse((0L, 0L, 0.0))
          val emitted = scala.collection.mutable.ListBuffer
            .empty[(Long, Long, Long, Double)]
          it.foreach { case (_, v) =>
            cnt += 1; sum += v
            if (cnt == size) {
              emitted += ((user, seq, cnt, sum))
              seq += 1; cnt = 0; sum = 0.0
            }
          }
          state.update((seq, cnt, sum))
          emitted.iterator
      }
    out.toDF("user_id", "win_seq", "n", "sum_value")
  }

  /** Stream-stream interval join (reference TimeIntervalJoin.java:51):
    * errors within [0, 60 min] after a signup of the same user, both
    * sides watermarked so join state is bounded. */
  def intervalJoinStream(events: DataFrame, horizon: String = "60 minutes",
      lateness: String = "10 minutes"): DataFrame =
    intervalJoin(events, "inner", horizon, lateness)

  /** Stream-stream LEFT OUTER interval join (reference
    * StreamingJoinOperator.java:36 outer mode / OuterJoinRecordStateViews):
    * signups with their in-horizon errors, or null once the watermark
    * proves no error can arrive — Spark emits the null-padded row when
    * the left row's state expires, the same late-null contract as the
    * reference's outer state views. */
  def intervalJoinLeftOuterStream(events: DataFrame): DataFrame =
    intervalJoin(events, "left_outer")

  /** Stream-stream FULL OUTER interval join — both sides null-pad at
    * watermark seal (the reference's symmetric OuterJoinRecordStateViews
    * mode): a signup with no in-horizon error AND an error with no
    * preceding in-horizon signup each emit exactly once. */
  def intervalJoinFullOuterStream(events: DataFrame): DataFrame =
    intervalJoin(events, "full_outer")

  /** Stream-stream RIGHT OUTER interval join — the mirror of
    * [[intervalJoinLeftOuterStream]] (reference OuterJoinRecordStateViews
    * right mode): every error emits, null-padded once the watermark
    * proves no in-horizon signup preceded it. */
  def intervalJoinRightOuterStream(events: DataFrame): DataFrame =
    intervalJoin(events, "right_outer")

  private def intervalJoin(events: DataFrame, joinType: String,
      horizon: String = "60 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val signups = events.where(col("event_type") === "signup")
      .select(col("user_id").as("u"), col("event_id").as("a_id"),
        col("ts").as("a_ts"))
      .withWatermark("a_ts", lateness)
    val errors = events.where(col("event_type") === "error")
      .select(col("user_id").as("u2"), col("event_id").as("b_id"),
        col("ts").as("b_ts"))
      .withWatermark("b_ts", lateness)
    signups.join(errors, col("u") === col("u2")
      && col("b_ts") >= col("a_ts")
      && col("b_ts") <= col("a_ts") + expr(s"interval $horizon"),
      joinType)
      .select(col("a_id"), col("b_id"))
  }

  /** Stream-stream WINDOW join (reference DataStream JoinedStreams /
    * CoGroupedStreams — pair elements of two streams that fall in the
    * SAME tumbling window): the window assignment joins as an equality
    * key next to the user key, which is exactly Spark's documented
    * time-window-join shape — the window struct equality doubles as the
    * time constraint, so both sides' state is bounded to the watermark
    * horizon without an explicit range predicate. Emits
    * (a_id, b_id, w_start) for signup×error pairs per (user, hour). */
  def windowJoinStream(events: DataFrame,
      size: String = "1 hour", lateness: String = "10 minutes"): DataFrame = {
    val signups = events.where(col("event_type") === "signup")
      .select(col("user_id").as("u"), col("event_id").as("a_id"),
        col("ts").as("a_ts"))
      .withWatermark("a_ts", lateness)
      .withColumn("w", window(col("a_ts"), size))
    val errors = events.where(col("event_type") === "error")
      .select(col("user_id").as("u2"), col("event_id").as("b_id"),
        col("ts").as("b_ts"))
      .withWatermark("b_ts", lateness)
      .withColumn("w2", window(col("b_ts"), size))
    signups.join(errors,
        col("u") === col("u2") && col("w") === col("w2"))
      .select(col("a_id"), col("b_id"), col("w.start").as("w_start"))
  }

  /** Broadcast-state pattern (reference BroadcastState /
    * BroadcastConnectedStream): a slow-changing control table re-read
    * and re-BROADCAST at every micro-batch epoch, joined against the
    * stream without any stream-side shuffle. `control` is re-evaluated
    * per batch (Fries-style epoch config pickup — EpochReconfig applies
    * the same idea to operator config), so a control update takes
    * effect at the next batch boundary. Use from foreachBatch. */
  def withBroadcastControl(control: () => DataFrame, joinKeys: Seq[String])(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      sink(batch.join(broadcast(control()), joinKeys, "left_outer"), batchId)

  /** Streaming as-of (temporal) join (reference
    * TemporalRowTimeJoinOperator.java:78, FOR SYSTEM_TIME AS OF): left
    * rows join the latest right-side version at-or-before their event
    * time. Both sides arrive as one keyed stream (union), state per key
    * is ONE row — the current version — exactly the reference's
    * versioned-table state after cleanup. Events are ordered within each
    * batch; cross-batch order follows arrival (align source order with
    * time for event-time behavior, as with matchPatternStream).
    *
    * left/right must share: keyCol, tsCol, idCol; right additionally
    * carries payloadCol. Output: (key, left id, asof payload or null).
    */
  def asofJoinStream(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, idCol: String, payloadCol: String): DataFrame = {
    val spark = left.sparkSession
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val l = left.select(col(keyCol).as("k"), col(tsCol).as("ts"),
      col(idCol).as("id"), lit(null).cast("long").as("pay"),
      lit(1).as("side"))
    val r = right.select(col(keyCol).as("k"), col(tsCol).as("ts"),
      col(idCol).as("id"), col(payloadCol).cast("long").as("pay"),
      lit(0).as("side"))
    val out = l.unionByName(r)
      .groupByKey(_.getLong(0))
      .flatMapGroupsWithState[(Long, Long, Boolean), (Long, Long, Option[Long])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Row], state: GroupState[(Long, Long, Boolean)]) =>
          // state: (version ts millis, version payload, hasVersion)
          var (vTs, vPay, has) = state.getOption.getOrElse((0L, 0L, false))
          val emitted = scala.collection.mutable.ListBuffer
            .empty[(Long, Long, Option[Long])]
          // rights before lefts at equal ts → inclusive as-of
          it.toArray.sortBy(e => (e.getTimestamp(1).getTime, e.getInt(4),
            e.getLong(2))).foreach { e =>
            val ms = e.getTimestamp(1).getTime
            if (e.getInt(4) == 0) {
              if (!has || ms >= vTs) { vTs = ms; vPay = e.getLong(3); has = true }
            } else {
              emitted += ((key, e.getLong(2), if (has) Some(vPay) else None))
            }
          }
          state.update((vTs, vPay, has))
          emitted.iterator
      }
    out.toDF("key", "left_id", "asof_value")
  }

  /** Streaming OVER aggregation (reference StreamExecOverAggregate.java:70 /
    * RowTimeRowsUnboundedPrecedingFunction.java:40): per-key `ROWS
    * UNBOUNDED PRECEDING` running sum + count, one output row per event,
    * with the running state carried across micro-batches in keyed state —
    * the streaming twin of the batch `q_over_running` window. Events are
    * event-time-ordered within each batch and arrival-ordered across
    * batches (the reference buffers on event time until the watermark;
    * here batch boundaries play that role — align file/offset order with
    * time for full event-time semantics). The money sum accumulates as a
    * scaled long (hundredths), so the running total is bit-identical to
    * the batch window's decimal formulation no matter how the stream is
    * batched. O(1) state per key. */
  def overRunningStream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    val out = typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Double, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long, Double)],
            state: GroupState[(Long, Long)]) =>
          var (sumScaled, n) = state.getOption.getOrElse((0L, 0L))
          val ordered = it.toArray.sortBy(e => (e._2.getTime, e._3))
          val emitted = ordered.map { case (_, _, id, v) =>
            // round-half-away-from-zero to hundredths, like Catalog.dsum
            sumScaled += (v * 100 + (if (v < 0) -0.5 else 0.5)).toLong
            n += 1
            (user, id, sumScaled / 100.0, n)
          }
          state.update((sumScaled, n))
          emitted.iterator
      }
    out.toDF("user_id", "event_id", "running_total", "n_so_far")
  }

  /** Incremental streaming OVER with a bounded ROWS-sliding frame
    * (reference RowTimeRowsBoundedPrecedingFunction.java:55 — the
    * bounded twin of [[overRunningStream]]): per key and per event, the
    * sum/count over `ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`. The
    * keyed state is the last k−1 scaled values (a bounded deque — the
    * reference keeps the same retract buffer), so state per key is O(k)
    * regardless of stream length. Cents-scaled integer arithmetic keeps
    * the running sums exact (same discipline as Catalog.dsum). Ordering:
    * event time within a batch, arrival across batches. Emits
    * (user_id, event_id, frame_sum, n_in_frame). */
  def overRowsSlidingStream(events: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"bad frame size k=$k")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    val out = typed.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], (Long, Long, Double, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long, Double)],
            state: GroupState[Seq[Long]]) =>
          // deque of the frame's scaled values, oldest first, ≤ k entries
          var frame = state.getOption.getOrElse(Seq.empty[Long]).toVector
          val ordered = it.toArray.sortBy(e => (e._2.getTime, e._3))
          val emitted = ordered.map { case (_, _, id, v) =>
            val scaled = (v * 100 + (if (v < 0) -0.5 else 0.5)).toLong
            frame = (frame :+ scaled).takeRight(k)
            (user, id, frame.sum / 100.0, frame.length.toLong)
          }
          // the next event's frame needs only the last k−1 values
          state.update(frame.takeRight(math.max(0, k - 1)))
          emitted.iterator
      }
    out.toDF("user_id", "event_id", "frame_sum", "n_in_frame")
  }

  /** Incremental streaming OVER with an event-time RANGE frame
    * (reference RowTimeRangeBoundedPrecedingFunction.java:55 — the
    * value-based sibling of [[overRowsSlidingStream]]): per key and per
    * event, the count over `RANGE BETWEEN <range> PRECEDING AND CURRENT
    * ROW`. Keyed state is the (ts, id) history inside the range horizon
    * of the latest seen timestamp — O(events per range window) per key,
    * pruned as time advances, exactly the reference's retract-list
    * cleanup. A RANGE frame is value-based, so equal-timestamp peers all
    * share one frame (the whole peer group counts for each of its rows);
    * peers are grouped within a batch — cross-batch peer splits follow
    * the file's arrival-order contract (align source order with time for
    * full event-time semantics). Emits (user_id, event_id, n_last_range).
    * Timestamp arithmetic is in MICROSECONDS (the fixture precision), so
    * boundaries agree with the batch RANGE window to the microsecond. */
  def overTimeRangeStream(events: DataFrame, rangeMicros: Long): DataFrame = {
    require(rangeMicros > 0, s"bad range $rangeMicros")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long)]
    def micros(t: java.sql.Timestamp): Long =
      // floorDiv: getTime truncates toward zero, which mis-converts
      // pre-epoch timestamps with fractional seconds (getNanos is always
      // the positive sub-second part, so the millis must floor)
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val out = typed.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Long)], (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
            state: GroupState[Seq[(Long, Long)]]) =>
          var hist = state.getOption.getOrElse(Seq.empty[(Long, Long)]).toVector
          val ordered = it.toArray.map(e => (micros(e._2), e._3))
            .sortBy(identity)
          val emitted = scala.collection.mutable.ListBuffer
            .empty[(Long, Long, Long)]
          var i = 0
          while (i < ordered.length) {
            // one peer group = all rows at this exact timestamp
            val t = ordered(i)._1
            var j = i
            while (j < ordered.length && ordered(j)._1 == t) j += 1
            hist = hist.dropWhile(_._1 < t - rangeMicros) ++
              ordered.slice(i, j)
            val n = hist.length.toLong
            ordered.slice(i, j).foreach(e => emitted += ((user, e._2, n)))
            i = j
          }
          state.update(hist)
          emitted.iterator
      }
    out.toDF("user_id", "event_id", "n_last_range")
  }

  /** Streaming CUMULATE windows (reference SqlCumulateTableFunction.java:37
    * + the cumulative slice assigner): expanding prefix windows
    * `[W, W + i·step)` inside each max-size window, each prefix emitted
    * when the watermark passes its end — the reference's fire-per-step
    * contract. Keyed by the max-window start; state = per-step partial
    * (count, cents-scaled sum) plus the emit cursor, O(maxSize/step) per
    * open window, removed after the final prefix fires. An event landing
    * in an already-emitted prefix (late within the allowed lateness)
    * still counts toward the remaining prefixes — emitted rows are
    * immutable, as in the reference. Max-window alignment is epoch-based
    * (floor(ts / maxSize)) — the UTC-hour alignment of the batch twin.
    * Emits (w_start, w_end, n, sum_value). */
  def cumulateAgg(events: DataFrame, maxSizeMs: Long = 3600000L,
      stepMs: Long = 1200000L, lateness: String = "10 minutes"): DataFrame = {
    require(maxSizeMs > 0 && stepMs > 0 && maxSizeMs % stepMs == 0,
      s"cumulate: step $stepMs must divide max size $maxSizeMs")
    val nSteps = (maxSizeMs / stepMs).toInt
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .withWatermark("ts", lateness)
      .select(col("ts"), col("value"))
      .as[(java.sql.Timestamp, Double)]
    // state: (per-step counts, per-step cents-scaled sums, prefixes emitted)
    val out = typed
      .groupByKey(e => Math.floorDiv(e._1.getTime, maxSizeMs) * maxSizeMs)
      .flatMapGroupsWithState[(Seq[Long], Seq[Long], Int),
          (java.sql.Timestamp, java.sql.Timestamp, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wStart: Long, it: Iterator[(java.sql.Timestamp, Double)],
            state: GroupState[(Seq[Long], Seq[Long], Int)]) =>
          var (ns, sums, done) = state.getOption.getOrElse(
            (Seq.fill(nSteps)(0L), Seq.fill(nSteps)(0L), 0))
          val emitted = scala.collection.mutable.ListBuffer
            .empty[(java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
          if (!state.hasTimedOut) {
            val na = ns.toArray; val sa = sums.toArray
            it.foreach { case (t, v) =>
              val slot = ((t.getTime - wStart) / stepMs).toInt
              na(slot) += 1
              sa(slot) += (v * 100 + (if (v < 0) -0.5 else 0.5)).toLong
            }
            ns = na.toSeq; sums = sa.toSeq
          }
          // emit every prefix the watermark has passed (also on data
          // batches — a prefix may have expired while events for later
          // slots of the same window were arriving)
          val wm = state.getCurrentWatermarkMs
          while (done < nSteps && wStart + (done + 1L) * stepMs <= wm) {
            done += 1
            emitted += ((new java.sql.Timestamp(wStart),
              new java.sql.Timestamp(wStart + done.toLong * stepMs),
              ns.take(done).sum, sums.take(done).sum / 100.0))
          }
          if (done >= nSteps) state.remove()
          else {
            state.update((ns, sums, done))
            state.setTimeoutTimestamp(math.max(
              wStart + (done + 1L) * stepMs, wm + 1))
          }
          emitted.iterator
      }
    out.toDF("w_start", "w_end", "n", "sum_value")
  }

  /** Streaming Top-N (reference StreamExecRank.java:69): per micro-batch
    * ROW_NUMBER()<=N — SURVEY §4's documented fallback (semantically the
    * per-epoch materialization of the incremental Top-N state). Use from
    * foreachBatch: `.foreachBatch(topNPerBatch(...)(sinkFn))`. */
  def topNPerBatch(n: Int, partitionBy: Seq[Column], order: Seq[Column])(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (df: DataFrame, batchId: Long) =>
      import graft.operators.Ops._
      sink(df.topN(n, partitionBy, order), batchId)
  }

  /** INCREMENTAL streaming Top-N (reference StreamExecRank.java:69 with
    * RankProcessStrategy's no-rank-number output): per key, keep the
    * current top-n (score desc, id asc tiebreak) across micro-batches
    * and emit a changelog — `+I` when a row enters the top-n, `-D` when
    * one leaves. Skipping output rank numbers is the reference's own
    * optimization: it avoids the cascade of rank-shift updates, and a
    * consumer materializes the standings as inserts minus deletes.
    *
    * A re-arriving id is an UPDATE (latest value wins — the reference's
    * UpdatableTopNFunction); `runnerUp` extra retained rows let a
    * downward update resurrect the next-best candidate (the reference
    * keeps the same bounded buffer — beyond it, a dropped id cannot
    * restore the unknown runner-up). State per key is ≤ n + runnerUp
    * (score, id) pairs — O(keys · (n + runnerUp)). Input: (keyCol long,
    * idCol long, scoreCol double) updates; output (op, key, id, score). */
  def streamingTopN(updates: DataFrame, keyCol: String, idCol: String,
      scoreCol: String, n: Int, runnerUp: Int = 0): DataFrame = {
    require(n >= 1 && runnerUp >= 0, s"bad n=$n runnerUp=$runnerUp")
    val spark = updates.sparkSession
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    val fields = updates.schema.fieldNames
    val kIdx = fields.indexOf(keyCol)
    val iIdx = fields.indexOf(idCol)
    val sIdx = fields.indexOf(scoreCol)
    require(kIdx >= 0 && iIdx >= 0 && sIdx >= 0)
    // ordering: higher score first, then smaller id (deterministic ties)
    implicit val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])
    val out = updates.groupByKey(_.getLong(kIdx))
      .flatMapGroupsWithState[Seq[(Double, Long)], (String, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Row],
            state: org.apache.spark.sql.streaming.GroupState[Seq[(Double, Long)]]) =>
          var retained = state.getOption.getOrElse(Seq.empty[(Double, Long)])
          val emitted = scala.collection.mutable.ListBuffer
            .empty[(String, Long, Long, Double)]
          it.foreach { r =>
            val entry = (r.getDouble(sIdx), r.getLong(iIdx))
            val before = retained.take(n)
            // latest value per id wins; the retained set is the top
            // n + runnerUp by ordering
            retained = ((retained.filterNot(_._2 == entry._2) :+ entry)
              .sorted.take(n + runnerUp))
            val after = retained.take(n)
            // changelog = standings diff: departures first, then entries
            before.filterNot(after.contains).foreach(d =>
              emitted += (("-D", key, d._2, d._1)))
            after.filterNot(before.contains).foreach(e =>
              emitted += (("+I", key, e._2, e._1)))
          }
          state.update(retained)
          emitted.iterator
      }
    out.toDF("op", "key", "id", "score")
  }

  /** Delta trigger (reference flink-streaming-java DeltaTrigger.java):
    * per key, re-emit the running aggregate only when it has moved at
    * least `delta` since the last emission — the trigger taxonomy's
    * data-driven member (count and timeout triggers live in
    * countWindows / dedupKeepFirstEventTime). Emits (key, total, n) on
    * each firing; state is two doubles + a count per key. Input:
    * (keyCol long, valueCol double). */
  def deltaTriggerSum(updates: DataFrame, keyCol: String,
      valueCol: String, delta: Double): DataFrame = {
    require(delta > 0, s"bad delta=$delta")
    val spark = updates.sparkSession
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    val fields = updates.schema.fieldNames
    val kIdx = fields.indexOf(keyCol)
    val vIdx = fields.indexOf(valueCol)
    require(kIdx >= 0 && vIdx >= 0)
    val out = updates.groupByKey(_.getLong(kIdx))
      .flatMapGroupsWithState[(Double, Double, Long), (Long, Double, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Row],
            state: org.apache.spark.sql.streaming.GroupState[(Double, Double, Long)]) =>
          // (running sum, sum at last firing, rows seen); the first row
          // ever always fires (lastFired starts at 0 → fires when the
          // first value itself reaches delta — Flink's contract: the
          // trigger compares against the last FIRED element)
          var (sum, lastFired, cnt) = state.getOption.getOrElse((0.0, 0.0, 0L))
          val emitted = scala.collection.mutable.ListBuffer
            .empty[(Long, Double, Long)]
          it.foreach { r =>
            sum += r.getDouble(vIdx)
            cnt += 1
            if (math.abs(sum - lastFired) >= delta) {
              emitted += ((key, sum, cnt))
              lastFired = sum
            }
          }
          state.update((sum, lastFired, cnt))
          emitted.iterator
      }
    out.toDF("key", "total", "n")
  }

  /** Processing-timeout trigger (reference flink-streaming-java
    * ProcessingTimeoutTrigger.java — fire when a key has been IDLE for
    * `timeoutMs` of processing time, regardless of watermarks): per key,
    * buffer a running (sum, n) and emit it only when no new element has
    * arrived for the timeout. The wall-clock member of the trigger
    * taxonomy (count → countWindows, event-time → window aggs, delta →
    * deltaTriggerSum). State per key: two numbers + one processing-time
    * timer; cleared on firing, so each burst of activity yields exactly
    * one row. Input: (keyCol long, valueCol double); emits (key, total,
    * n). Timers fire at the NEXT micro-batch after expiry (micro-batch
    * granularity — same contract as every timer here).
    *
    * Run the query with a NONZERO processing-time trigger interval:
    * while any timeout is armed Spark schedules no-data batches to fire
    * timers, and at `Trigger.ProcessingTime(0)` that degenerates into a
    * busy loop of empty batches (observed to starve
    * `processAllAvailable`). An interval of the timeout's order bounds
    * both the firing latency and the idle batch rate. */
  def idleTimeoutAgg(updates: DataFrame, keyCol: String,
      valueCol: String, timeoutMs: Long): DataFrame = {
    require(timeoutMs > 0, s"bad timeoutMs=$timeoutMs")
    val spark = updates.sparkSession
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    val fields = updates.schema.fieldNames
    val kIdx = fields.indexOf(keyCol)
    val vIdx = fields.indexOf(valueCol)
    require(kIdx >= 0 && vIdx >= 0)
    val out = updates.groupByKey(_.getLong(kIdx))
      .flatMapGroupsWithState[(Double, Long), (Long, Double, Long)](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: Long, it: Iterator[Row],
            state: org.apache.spark.sql.streaming.GroupState[(Double, Long)]) =>
          if (state.hasTimedOut) {
            val (sum, n) = state.get
            state.remove()
            Iterator.single((key, sum, n))
          } else {
            var (sum, n) = state.getOption.getOrElse((0.0, 0L))
            it.foreach { r => sum += r.getDouble(vIdx); n += 1 }
            state.update((sum, n))
            // every new element re-arms the idle clock — the reference's
            // trigger resets its timer on each registered element
            state.setTimeoutDuration(timeoutMs)
            Iterator.empty
          }
      }
    out.toDF("key", "total", "n")
  }

  /** Changelog emission (reference's +I/-U/+U retraction stream —
    * StreamExecChangelogNormalize / RowKind.java; SURVEY §1's documented
    * delta, made concrete): wraps an update-mode aggregation's foreachBatch
    * so each micro-batch emits RowKind-tagged rows — `+I` for a key's
    * first result, `-U` carrying the prior value and `+U` the new one on
    * every change. Downstream consumers (a materialized view, an
    * incremental sink) get exactly the reference's retraction contract on
    * micro-batch boundaries.
    *
    * The previous snapshot is a persisted DataFrame keyed by `keys`,
    * diffed against each update batch with one shuffle join — at scale
    * the snapshot is the same size as the aggregation state the engine
    * already holds, partitioned on the same keys. Update-mode batches
    * carry only changed keys, so the join is |changed| vs |snapshot|
    * (broadcast-able when a batch touches few keys). */
  final class ChangelogSink(keys: Seq[String]) extends Serializable {
    @volatile private var snapshot: DataFrame = _
    /** foreachBatch body: tag ops, hand them to `sink`, advance state. */
    def apply(sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
      (batch: DataFrame, batchId: Long) => {
        val b = batch.persist()
        val out =
          if (snapshot == null) b.select(lit("+I").as("op"), col("*"))
          else {
            val prevHit = snapshot.join(b.select(keys.map(col): _*), keys,
              "left_semi")
            val minus = prevHit.select(lit("-U").as("op"), col("*"))
            val newKeys = b.join(snapshot.select(keys.map(col): _*), keys,
              "left_anti")
            val plusI = newKeys.select(lit("+I").as("op"), col("*"))
            val plusU = b.join(newKeys.select(keys.map(col): _*), keys,
              "left_anti").select(lit("+U").as("op"), col("*"))
            minus.union(plusU).union(plusI)
          }
        sink(out, batchId)
        val next = (if (snapshot == null) b
          else snapshot.join(b.select(keys.map(col): _*), keys, "left_anti")
            .union(b)).persist()
        next.count() // materialize before unpersisting the sources
        if (snapshot != null) snapshot.unpersist()
        // on the first batch next IS b — unpersisting it would evict the
        // snapshot cache just materialized
        if (!(next eq b)) b.unpersist()
        snapshot = next
      }
  }

  /** Idempotent JDBC upsert sink (reference JdbcUpsertTableSink +
    * JdbcBatchingOutputFormat — flink-connector-jdbc's sink path): a
    * foreachBatch body that UPSERTs each micro-batch's rows into
    * `table` by `keyCol`. Per partition, ONE transaction of chunked
    * DELETE-by-key + batched INSERTs — so an at-least-once re-delivered
    * batch CONVERGES to the same table instead of duplicating, the
    * upsert contract that makes foreachBatch's at-least-once
    * effectively exactly-once for keyed results. The batch is
    * deduplicated on the key and repartitioned BY the key first (a
    * key must land in exactly one partition or two partitions'
    * delete/insert pairs could interleave); update-mode aggregation
    * batches already carry one row per changed key, so that shuffle
    * moves only changed keys. WHICH row survives a multi-row-per-key
    * batch: with `orderCol = Some(c)` the row with the greatest `c`
    * (ties by arbitrary pick among the tied — give `c` unique values),
    * computed with one rank window on the same key partitioning; with
    * `orderCol = None` the pick is ARBITRARY (`dropDuplicates`) — only
    * use None when the upstream guarantees one row per key per batch,
    * i.e. update-mode aggregates or a [[ChangelogSink]] diff.
    * Identifiers are ANSI double-quoted, case-exact — match what
    * Spark's JDBC writer created. Works against any JDBC url whose
    * driver is on the executor classpath; tested on the embedded Derby
    * in the Spark distribution.
    *
    * `faultHook` is failure-injection instrumentation (called once per
    * row inside the partition transaction, before its INSERT binds):
    * the convergence-under-retry contract above is proven by a test
    * that throws from here mid-partition and asserts the store still
    * converges after Spark's task retry. Production callers leave the
    * default no-op.
    *
    * Usage: `.writeStream.outputMode("update")
    * .foreachBatch(Streams.jdbcUpsertSink(url, "T", "k"))`. */
  def jdbcUpsertSink(url: String, table: String, keyCol: String,
      chunkSize: Int = 256, orderCol: Option[String] = None,
      faultHook: Row => Unit = _ => ()): (DataFrame, Long) => Unit = {
    require(chunkSize >= 1)
    (batch0: DataFrame, _: Long) => {
      val cols = batch0.schema.fieldNames.toSeq
      require(cols.contains(keyCol),
        s"jdbcUpsertSink: no $keyCol in ${cols.mkString(",")}")
      require(orderCol.forall(cols.contains),
        s"jdbcUpsertSink: no ${orderCol.get} in ${cols.mkString(",")}")
      val kIdx = cols.indexOf(keyCol)
      val batch = orderCol match {
        case Some(oc) =>
          // deterministic last-wins: greatest orderCol per key. The
          // window partitions on the SAME key the sink repartitions on,
          // so AQE reuses one shuffle for both.
          import org.apache.spark.sql.expressions.Window
          batch0
            .withColumn("__graft_rn", row_number().over(
              Window.partitionBy(col(keyCol)).orderBy(col(oc).desc)))
            .where(col("__graft_rn") === 1).drop("__graft_rn")
            .repartition(col(keyCol))
        case None => batch0.dropDuplicates(Seq(keyCol))
          .repartition(col(keyCol))
      }
      batch.foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          def q(id: String) = "\"" + id + "\""
          val conn = java.sql.DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val insertSql = s"INSERT INTO ${q(table)} " +
              s"(${cols.map(q).mkString(", ")}) " +
              s"VALUES (${cols.map(_ => "?").mkString(",")})"
            rows.grouped(chunkSize).foreach { chunk =>
              val ph = chunk.map(_ => "?").mkString(",")
              val del = conn.prepareStatement(
                s"DELETE FROM ${q(table)} WHERE ${q(keyCol)} IN ($ph)")
              try {
                chunk.zipWithIndex.foreach { case (r, i) =>
                  del.setObject(i + 1, r.get(kIdx))
                }
                del.executeUpdate()
              } finally del.close()
              val ins = conn.prepareStatement(insertSql)
              try {
                chunk.foreach { r =>
                  faultHook(r)
                  // setObject(_, null) for SQL NULL: the driver resolves
                  // the type from parameter metadata. setNull(_,
                  // Types.NULL) looks equivalent but Derby rejects type
                  // code 0 ("The data type 0 is not supported"), so a
                  // null in ANY column would fail the whole micro-batch.
                  cols.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
                  ins.addBatch()
                }
                ins.executeBatch()
              } finally ins.close()
            }
            conn.commit()
          } catch {
            case e: Throwable =>
              try conn.rollback() catch { case _: Exception => }
              throw e
          } finally conn.close()
        }
      }
    }
  }

  /** Changelog ingest — the INVERSE of [[ChangelogSink]] (reference
    * StreamExecChangelogNormalize.java:61: materialize an upsert/retract
    * stream back into a table). Feed each op-tagged micro-batch (`op` ∈
    * +I/+U/-U/-D plus the key and payload columns) to `apply`;
    * `materialized` is the current table: last upsert per key wins,
    * a `-D` drops the key, `-U` rows are informational (they carry the
    * prior value and change nothing here).
    *
    * Contract: at most ONE effective op (+I/+U/-D) per key per batch —
    * exactly what [[ChangelogSink]] emits (it diffs snapshots, so each
    * batch carries one logical change per key). A batch violating that
    * has no well-defined "last" op without a sequence column, so it is
    * rejected loudly instead of materializing an arbitrary winner.
    *
    * Scale shape mirrors the sink: the materialized table is persisted,
    * keyed by `keys`, and each batch applies with ONE anti-join on the
    * touched keys plus a union — |batch| vs |table|, broadcast-able when
    * a batch touches few keys. */
  final class ChangelogIngest(keys: Seq[String]) extends Serializable {
    @volatile private var table: DataFrame = _
    def apply(batch: DataFrame): Unit = {
      // the batch feeds three consumers (conflict guard, upserts,
      // touched) — persist once instead of recomputing the upstream
      val b = batch.persist()
      try {
        val conflicted = b.where(col("op") =!= "-U")
          .groupBy(keys.map(col): _*).count()
          .where(col("count") > 1).limit(1).collect()
        require(conflicted.isEmpty,
          s"ChangelogIngest: multiple effective ops for key " +
            s"${conflicted.headOption.map(_.toString).getOrElse("")} in " +
            "one batch — order is undefined without a sequence column")
        val upserts = b.where(col("op").isin("+I", "+U")).drop("op")
        val touched = b.where(col("op") =!= "-U")
          .select(keys.map(col): _*).distinct()
        val next = (if (table == null) upserts
          else table.join(touched, keys, "left_anti").union(upserts))
          .persist()
        next.count() // materialize before releasing the previous snapshot
        if (table != null) table.unpersist()
        table = next
      } finally b.unpersist()
    }
    /** Current materialized table (null-safe: empty before any batch). */
    def materialized: DataFrame = {
      require(table != null, "ChangelogIngest: no batch applied yet")
      table
    }
  }

  /** Drop UPDATE_BEFORE rows from an op-tagged changelog (reference
    * StreamExecDropUpdateBefore.java — the planner inserts it when the
    * downstream consumes the changelog as UPSERT, i.e. keyed last-wins):
    * `-U` rows carry the retracted prior value, which an upsert consumer
    * ([[ChangelogIngest]], [[changelogNormalizeStream]]) never reads, so
    * dropping them upstream halves every update's changelog traffic with
    * an identical materialization. A narrow filter — fuses into the
    * scan/exchange, no shuffle, no state. Do NOT use before a consumer
    * that aggregates the changelog itself (a true retraction consumer
    * needs the -U to subtract). */
  def dropUpdateBefore(changes: DataFrame,
      opCol: String = "op"): DataFrame =
    changes.where(col(opCol) =!= "-U")

  /** Streaming upsert-source normalization (reference
    * StreamExecChangelogNormalize.java:61 as a source-side operator): a
    * keyed stream of upserts/deletes becomes a stream of the key's
    * CURRENT row after each change — downstream sees clean last-row
    * semantics regardless of how noisy the upsert feed is. State per key
    * is one row (ts + payload + liveness), exactly the reference's
    * ValueState<RowData>. Emits (key, ts, payload, live); the latest
    * emission per key IS the materialized row (live=false → deleted).
    * Events are event-time-ordered within each batch; an upsert older
    * than the key's current version is ignored (out-of-order shield). */
  def changelogNormalizeStream(changes: DataFrame, keyCol: String,
      tsCol: String, payloadCol: String,
      opCol: String = "op"): DataFrame = {
    val spark = changes.sparkSession
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val typed = changes.select(col(opCol), col(keyCol).as("k"),
      col(tsCol).as("ts"), col(payloadCol).cast("long").as("pay"))
    val out = typed.groupByKey(_.getLong(1))
      .flatMapGroupsWithState[(Long, Long, Boolean), (Long, Long, Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Row], state: GroupState[(Long, Long, Boolean)]) =>
          var (vTs, vPay, live) = state.getOption.getOrElse((Long.MinValue, 0L, false))
          val emitted = scala.collection.mutable.ListBuffer
            .empty[(Long, Long, Long, Boolean)]
          it.toArray.sortBy(e => e.getTimestamp(2).getTime).foreach { e =>
            val ms = e.getTimestamp(2).getTime
            if (ms >= vTs) e.getString(0) match {
              case "+I" | "+U" =>
                vTs = ms; vPay = e.getLong(3); live = true
                emitted += ((key, ms, vPay, true))
              case "-D" =>
                vTs = ms; live = false
                emitted += ((key, ms, 0L, false))
              case _ => // -U: informational retraction, no state change
            }
          }
          state.update((vTs, vPay, live))
          emitted.iterator
      }
    out.toDF("key", "ts_ms", "payload", "live")
  }

  /** Queryable state (reference QueryableStateClient — the queryable
    * state API): read a streaming query's KEYED STATE from outside the
    * query, via Spark's state-store data source over the checkpoint.
    * Where the reference serves point lookups from the live
    * TaskManager's state backend, Spark reads the persisted state-store
    * snapshot — the same state, at most one micro-batch behind the hot
    * path (the micro-batch model's freshness bound). Returns
    * (key struct, value struct, partition_id); filter on `key.*` for a
    * point lookup, or time-travel with `batchId`. `operatorId` selects
    * the stateful operator in a multi-operator query (plan order). */
  def queryableState(spark: SparkSession, checkpoint: String,
      batchId: Option[Long] = None, operatorId: Int = 0): DataFrame = {
    val r = spark.read.format("statestore")
      .option("operatorId", operatorId)
    batchId.foreach(b => r.option("batchId", b))
    r.load(checkpoint)
  }

  /** Side-output routing (reference OutputTag/getSideOutput): one pass per
    * micro-batch, rows matching `cond` to the main handler, the rest to
    * the side handler — two filtered writes from one foreachBatch. */
  def foreachBatchSplit(cond: Column)(
      main: (DataFrame, Long) => Unit,
      side: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (df: DataFrame, batchId: Long) => {
      main(df.where(cond), batchId)
      side(df.where(!cond), batchId)
    }

  /** Run a (bounded) streaming DataFrame to completion with
    * Trigger.AvailableNow into an in-memory table; returns the result.
    * outputMode: "complete" for aggregations, "append" otherwise. */
  def runToTable(spark: SparkSession, stream: DataFrame, name: String,
      outputMode: String): DataFrame = {
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** A continuously-ingested, query-optimized TABLE: append each
    * micro-batch to `dir` as parquet and reconcile the per-file stats
    * manifest incrementally — readers get
    * [[graft.sources.StatsManifest.scan]]'s planning-time file pruning
    * over a LIVE directory, the streaming half of the lakehouse write
    * path (`Layout.optimize` is the batch half that periodically
    * re-clusters what this sink appends).
    *
    * Replay-exact: files are named deterministically in (batchId, part)
    * through the staged-rename protocol, so a replayed micro-batch
    * REPLACES its own files; the replaced paths are passed to
    * `StatsManifest.update(invalidate = …)` so their stats are
    * recomputed from the rewritten bytes — a replay can change file
    * boundaries, and stale stats are the one way a conservative pruner
    * goes wrong. Readers racing a batch see either the old or the new
    * manifest; a file newer than the manifest simply isn't pruned
    * (missing stats keep the file). Per-batch manifest cost: one scan of
    * the batch's own files + a driver-side merge — O(batch), never
    * O(table). */
  /** CDC-APPLY sink: MERGE each micro-batch into a manifested table by
    * key — the streaming materialization of a changelog into a stored,
    * query-optimized table ([[graft.sources.RowOps.upsert]] per batch:
    * manifest-pruned candidate discovery, copy-on-write rewrite of only
    * the files holding matched keys, one atomic tombstone+adopt commit).
    * The reference's changelog-upsert materialization
    * (`flink-table-runtime-blink/…/deduplicate/
    * DeduplicateKeepLastRowFunction.java`) holds the upserted table in
    * keyed state; here it lands in the manifested layout where batch
    * readers get file pruning, snapshots, and CDC over it.
    *
    * Within a batch, several updates for one key collapse to the LAST
    * by `seqCol` (keep-last — the changelog convention); `upsert`'s
    * duplicate-key guard then runs on an already-unique source.
    * Replay-safe WITHOUT file-name tricks: upsert is idempotent — a
    * replayed batch re-matches the keys it already wrote and replaces
    * them with identical rows (the CDC feed nets the no-op rewrite to
    * zero). Keys never seen insert; keys already applied converge.
    * Deletes ride the same batch as a `deleteCol = true` flag
    * ([[graft.sources.RowOps.deleteKeys]] on that slice) — the +I/+U/-D
    * changelog split, applied deletes-last so a (upsert, delete) pair
    * for one key in one batch lands deleted. */
  def upsertToManifestedTable(spark: SparkSession, stream: DataFrame,
      dir: String, keys: Seq[String], seqCol: String,
      statsCols: Seq[String], deleteCol: Option[String] = None,
      triggerMs: Long = 500L,
      checkpointDir: Option[String] = None,
      manifestVersionsToKeep: Int = 16,
      /** CDC change files keep a LONGER window than the manifest (a
        * changesStream consumer lagging past manifest retention must
        * still find every change file it has not discovered yet);
        * size this to several multiples of the subscriber's worst-case
        * lag in batches. The files are O(changes) — cheap to keep. */
      cdcVersionsToKeep: Int = 256): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.expressions.Window
        val spk = batch.sparkSession
        // keep-last per key within the batch (ties broken by seqCol);
        // persisted: the merge consumes it through several actions and
        // an uncached plan would re-read the micro-batch source and
        // re-run this window shuffle for each
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(seqCol).desc)
        val last = batch.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn", seqCol)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
        val ups = deleteCol match {
          case Some(dc) => last.where(!coalesce(col(dc), lit(false)))
            .drop(dc)
          case None => last
        }
        // bootstrap: the first non-empty batch CREATES the manifested
        // table (idempotent under replay — overwrite mode)
        val exists =
          graft.sources.StatsManifest.latestVersion(spk, dir).isDefined
        if (!exists) {
          if (!ups.isEmpty) {
            ups.write.mode("overwrite").parquet(dir)
            graft.sources.StatsManifest.write(spk, dir, statsCols)
          }
        } else {
          // a CONCURRENT writer (batch DML, maintenance) can win the
          // version race mid-batch; the op's own rebase absorbs
          // disjoint interims, but a key-dependent conflict aborts with
          // ConcurrentModificationException — re-running the whole op
          // re-analyzes against the new latest, and keep-last keys make
          // the retry semantically identical. Bounded: a genuinely
          // contended table should fail the query loudly, not livelock.
          def retrying(body: => Unit): Unit = {
            var attempts = 0
            while (true) {
              try { body; return }
              catch {
                case e: java.util.ConcurrentModificationException =>
                  attempts += 1
                  if (attempts > 8) throw e
                  Thread.sleep(50L * attempts)
              }
            }
          }
          deleteCol match {
            // upserts AND deletes in ONE merge: one find phase, one
            // copy-on-write rewrite, one manifest commit, one CDC feed
            // per batch — the previous upsert-then-deleteKeys pair paid
            // every fixed cost twice, which dominated batch latency at
            // modest rates (r10 verdict: cdc_apply p50 3x its
            // siblings). keep-last above collapsed each key to one
            // row, so a key is EITHER an upsert or a delete here —
            // clause order only settles the del-flag dispatch, not
            // cross-row races.
            case Some(dc) if !last.isEmpty =>
              import graft.sources.RowOps
              val isDel = coalesce(RowOps.srcCol(dc), lit(false))
              // the target columns ARE the stream's columns minus the
              // delete flag (the bootstrap write defined the table from
              // this very shape) — deriving them from the stream schema
              // skips a per-batch parquet footer inference
              val cols = last.columns.toSeq.filterNot(_ == dc)
              retrying(RowOps.merge(spk, dir, last, keys, statsCols,
                matched = Seq(
                  RowOps.MergeDelete(Some(isDel)),
                  RowOps.MergeUpdate(None,
                    cols.map(c => c -> RowOps.srcCol(c)))),
                notMatched = Seq(RowOps.MergeInsert(Some(!isDel),
                  cols.map(c => c -> RowOps.srcCol(c)))),
                validate = false, // keep-last guarantees unique keys
                countInserts = false)) // per-batch: skip the count
            case _ =>
              if (!ups.isEmpty)
                retrying(graft.sources.RowOps.upsert(spk, dir, ups, keys,
                  statsCols, validate = false))
          }
        }
        // lazy retention: per-batch cost stays O(delta) — the manifest
        // log's own checkpoint cadence bounds the window at
        // keep..keep+interval−1 versions without a per-batch fold.
        // Table properties override the sink parameters (r13)
        val props = graft.sources.StatsManifest.tableProps(spk, dir)
        graft.sources.StatsManifest.expire(spk, dir,
          props.get("retention.versions").map(_.toInt)
            .getOrElse(manifestVersionsToKeep),
          props.get("retention.cdcVersions").map(_.toInt)
            .getOrElse(cdcVersionsToKeep),
          exact = false)
        } finally { last.unpersist(false); () }
        ()
      }
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** One append-sink micro-batch commit — the EXACT code
    * [[appendToManifestedTable]]'s writer loop runs, extracted so the
    * auto-compaction policy spec and probe can drive hundreds of
    * commits through the real path without Structured Streaming
    * trigger overhead. Stage-renames the batch's files (deterministic
    * in batchId — replays replace), reconciles the manifest
    * incrementally, expires lazily, then applies the commit-time
    * auto-compaction policy:
    *
    *  - `spark.graft.autoCompact.minFiles` (default 16; `0` disables):
    *    when any partition dir (or the root) holds at least this many
    *    live sub-target files, [[graft.operators.Layout.autoCompact]]
    *    bin-packs them under one deferDelete commit — so a stream that
    *    appends tiny files forever keeps its live file count (and every
    *    reader's task count) BOUNDED at ~minFiles per partition.
    *  - `spark.graft.autoCompact.targetBytes` (default 64 MiB): packed
    *    output size; files at or above it never compact.
    *
    * The current batch's own files are EXCLUDED from compaction (a
    * replayed batch rewrites them by deterministic name — compacting
    * them first would duplicate their rows on replay; they become
    * eligible the moment the NEXT batch commits). A concurrent-writer
    * conflict skips the compaction — the next commit retries. */
  private[graft] def appendCommitToManifestedTable(
      fs: org.apache.hadoop.fs.FileSystem,
      dirPath: org.apache.hadoop.fs.Path,
      stagingRoot: org.apache.hadoop.fs.Path, dir: String,
      batchId: Long, batch: DataFrame, statsCols: Seq[String],
      manifestVersionsToKeep: Int): Unit = {
    val spk = batch.sparkSession
    // CHECK constraints validate inline in the batch's write job
    // (r13) — a violating streamed row fails the query loudly rather
    // than landing bad data the table's contract forbids
    val batchChecked =
      graft.sources.Constraints.enforce(spk, dir, batch)
    // a renamed table's data files carry PHYSICAL column names — map
    // the batch at the write boundary (no-op for never-renamed tables,
    // at zero inference cost: the map reads the sidecar only)
    val batchPhys = graft.sources.StatsManifest.writePhysicalMap(
      batchChecked, graft.sources.StatsManifest.tableNameMap(spk, dir))
    val written = IterativeStream.writeFeedback(
      fs, dirPath, stagingRoot, batchId, batchPhys, prefix = "tb")
    if (written.isEmpty) return
    graft.sources.StatsManifest.update(spk, dir, statsCols,
      invalidate = written
        .map(graft.sources.StatsManifest.fileKey).toSet)
    // each batch commits one manifest version; keep a bounded
    // time-travel window rather than a version per batch forever
    // (lazy: no per-batch fold — overshoot bounded by the
    // manifest log's checkpoint interval). Policy: table property
    // first, session conf second, default/parameter last (r13 —
    // one sidecar read per batch serves every key)
    val props = graft.sources.StatsManifest.tableProps(spk, dir)
    def pol(key: String, dflt: String): String =
      props.getOrElse(key, spk.conf.get("spark.graft." + key, dflt))
    graft.sources.StatsManifest.expire(spk, dir,
      pol("retention.versions", manifestVersionsToKeep.toString).toInt,
      exact = false)
    val minFiles = pol("autoCompact.minFiles", "16").toInt
    if (minFiles > 0) {
      val target = pol("autoCompact.targetBytes",
        (1L << 26).toString).toLong
      try graft.operators.Layout.autoCompact(spk, dir, minFiles,
        targetBytes = target,
        exclude = written.map(graft.sources.StatsManifest.fileKey).toSet)
      catch {
        // a conflicting concurrent writer won the slot — skip; the
        // policy re-fires at the next commit
        case _: java.util.ConcurrentModificationException => ()
      }
      ()
    }
  }

  def appendToManifestedTable(spark: SparkSession, stream: DataFrame,
      dir: String, statsCols: Seq[String], triggerMs: Long = 500L,
      checkpointDir: Option[String] = None,
      manifestVersionsToKeep: Int = 16): StreamingQuery = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    val stagingRoot = new org.apache.hadoop.fs.Path(dir + ".staging")
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendCommitToManifestedTable(fs, dirPath, stagingRoot, dir,
          batchId, batch, statsCols, manifestVersionsToKeep)
      }
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }
}
