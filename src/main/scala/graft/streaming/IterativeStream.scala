package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** Streaming iteration — the feedback-edge analogue of the reference's
  * `DataStream.iterate` (`DataStream.java:531-559`): part of each
  * transformed micro-batch is FED BACK into the stream's own head, the
  * rest is emitted, and the query self-terminates once no data (external
  * or fed-back) has arrived for `maxWaitMs` — the reference's
  * `iterate(maxWaitTimeMillis)` termination contract.
  *
  * Structured Streaming's dataflow graph is acyclic, so the cycle is
  * closed OUTSIDE the plan, through storage the engine already treats as
  * a source: the iteration head is `input UNION readStream(feedbackDir)`,
  * and the foreachBatch sink routes feedback rows back by writing them as
  * new files into `feedbackDir`, where the file source discovers them on
  * a later trigger. That is the same head/tail decomposition the
  * reference runs inside its runtime (a feedback channel buffering
  * records back to the head) — here the channel is a file queue, which
  * buys two properties the in-memory channel lacks: the feedback edge is
  * checkpoint-durable (a crashed query resumes the loop from files +
  * offsets), and it is naturally backpressured (a trigger ingests at the
  * file source's own rate limits).
  *
  * Delivery: the feedback write is idempotent by construction — every
  * part file is staged and then renamed to a name deterministic in
  * (batchId, part index), so a replayed micro-batch (foreachBatch is
  * at-least-once) OVERWRITES its own previous feedback files instead of
  * enqueueing duplicates, and the file source's seen-paths log ignores
  * the re-appearance. With a deterministic `body` the loop is therefore
  * effectively exactly-once end-to-end; `out` carries the usual
  * foreachBatch at-least-once contract and should be an idempotent sink
  * (e.g. [[Streams.jdbcUpsertSink]]).
  *
  * Scale: the fed-back volume per trigger is exactly the rows still
  * iterating — the analogue of a delta iteration's workset — and the
  * files hold only those rows, so a loop whose population converges
  * shrinks its own feedback traffic to zero (an empty feedback frame
  * enqueues NO file at all — see [[writeFeedback]]; a footer-only file
  * would re-trigger the source and the loop would churn empty batches
  * forever). All routing is one filtered
  * write per side per batch; nothing collects to the driver. Paths go
  * through the Hadoop FileSystem API, so `feedbackDir` may be any DFS a
  * cluster shares (renames are atomic on HDFS; on local fs they are the
  * same-volume moves the sandbox uses).
  *
  * Rows where `isFeedback` evaluates null are emitted, not fed back
  * (null-safe: feedback requires an explicit `true`).
  *
  * @param input      streaming DataFrame — the external arrivals edge
  * @param feedbackDir directory (created if absent) for the feedback edge;
  *                    must be query-private
  * @param body       per-micro-batch transform applied at the head; its
  *                    output schema must stay union-compatible with
  *                    `input` (the reference's same-type default — a
  *                    `withFeedbackType` analogue would union a second
  *                    schema, declared out)
  * @param isFeedback predicate over `body`'s output: `true` → fed back
  * @param out        sink for emitted (non-feedback) rows, per batch
  * @param maxWaitMs  self-termination: stop once the query has been IDLE
  *                    — no trigger ingested rows, no trigger in flight,
  *                    no source data pending — for this long (> 0); a
  *                    single batch PROCESSING longer than this never
  *                    trips it (the reference's maxWaitTimeMillis is
  *                    wait-for-input time, not processing time). `0`
  *                    returns immediately with the live query (the
  *                    reference's never-terminating default); the caller
  *                    manages stop(), and a termination listener cleans
  *                    the staging dir once the query ends
  */
object IterativeStream {

  /** Enqueue one micro-batch's feedback rows: stage, then rename to names
    * deterministic in (batchId, part index) — so a replayed micro-batch
    * (foreachBatch is at-least-once) REPLACES its previous feedback files
    * instead of appending duplicates. A replay may produce FEWER part
    * files than the failed attempt (different post-restart parallelism),
    * so every existing fb-<batchId>-* file is deleted first — per-index
    * overwrite alone would leave the stale higher-indexed parts enqueued
    * as duplicate feedback rows. Package-visible for the replay spec. */
  private[graft] def writeFeedback(fs: FileSystem, fbPath: Path,
      stagingRoot: Path, batchId: Long, feedback: DataFrame,
      prefix: String = "fb"): Seq[Path] = {
    // the stale sweep runs even when this attempt's feedback is empty —
    // a replay that CONVERGED (non-empty original, empty replay) must
    // still retract the failed attempt's files
    val stale = fs.globStatus(new Path(fbPath, f"$prefix%s-$batchId%012d-*"))
    if (stale != null) stale.foreach(s => fs.delete(s.getPath, false))
    // An EMPTY feedback frame must enqueue NOTHING — a parquet write of
    // an empty frame still creates one footer-only part file, the file
    // source counts that new FILE as new data, the resulting 0-row batch
    // writes another empty file, and the loop feeds itself empty files
    // every trigger forever: unbounded file churn, and source idleness
    // (the self-termination signal) never arrives. O(1) probe: `feedback`
    // filters the foreachBatch-persisted batch, so isEmpty is a limit-1
    // scan of cached blocks.
    if (feedback.isEmpty) return Seq.empty
    val staging = new Path(stagingRoot, s"b$batchId")
    feedback.write.mode("overwrite").parquet(staging.toString)
    val parts = fs.listStatus(staging)
      .map(_.getPath).filter(_.getName.startsWith("part-"))
      .sortBy(_.getName)
    val dests = parts.zipWithIndex.map { case (src, i) =>
      val dst = new Path(fbPath, f"$prefix%s-$batchId%012d-$i%05d.parquet")
      // some FileSystems signal failure as `false` instead of throwing;
      // a silently missing part would drop feedback rows (an incomplete
      // iteration) or index appendices (re-admitted duplicates). Failing
      // the batch is safe: the replay's glob-delete replaces the batch's
      // files wholesale.
      require(fs.rename(src, dst), s"feedback rename $src -> $dst failed")
      dst
    }
    fs.delete(staging, true)
    dests.toSeq
  }

  def iterate(spark: SparkSession, input: DataFrame, feedbackDir: String,
      body: DataFrame => DataFrame, isFeedback: Column,
      out: (DataFrame, Long) => Unit, maxWaitMs: Long = 10000L,
      triggerMs: Long = 200L,
      checkpointDir: Option[String] = None): StreamingQuery = {
    require(maxWaitMs >= 0, s"maxWaitMs < 0: $maxWaitMs")
    val hconf = spark.sparkContext.hadoopConfiguration
    val fbPath = new Path(feedbackDir)
    val fs = fbPath.getFileSystem(hconf)
    fs.mkdirs(fbPath)
    val stagingRoot = new Path(feedbackDir + ".staging")

    val feedbackStream = spark.readStream.schema(input.schema)
      .parquet(feedbackDir)
    val head = input.unionByName(feedbackStream)

    val writer = head.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t = body(batch).persist()
        try {
          // fail fast on schema drift: the feedback files are read back
          // with the HEAD's schema, so a body that renames or retypes a
          // column would otherwise null-fill silently on the next trip
          val headFields = input.schema.fields
            .map(f => (f.name, f.dataType)).toSet
          val bodyFields = t.schema.fields
            .map(f => (f.name, f.dataType)).toSet
          require(bodyFields == headFields,
            s"iterate body changed the schema: head ${input.schema.sql} " +
              s"vs body ${t.schema.sql} — feedback rows must stay " +
              "union-compatible with the iteration head")
          writeFeedback(fs, fbPath, stagingRoot, batchId,
            t.where(isFeedback <=> lit(true)))
          out(t.where(!(isFeedback <=> lit(true))), batchId)
        } finally t.unpersist()
      }
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    val q = writer.start()
    if (maxWaitMs == 0) {
      // Caller-managed mode: clean the staging dir when the query ends,
      // whichever way it ends (stop(), exception, or a crash-restart's
      // eventual stop) — the self-termination path below isn't running
      // to do it. The listener removes itself once it has fired.
      val listener: StreamingQueryListener =
        new StreamingQueryListener {
          override def onQueryStarted(
              e: StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(
              e: StreamingQueryListener.QueryProgressEvent): Unit = ()
          override def onQueryTerminated(
              e: StreamingQueryListener.QueryTerminatedEvent): Unit =
            if (e.id == q.id) {
              try fs.delete(stagingRoot, true) catch { case _: Exception => }
              spark.streams.removeListener(this)
            }
        }
      spark.streams.addListener(listener)
      return q
    }

    // Self-termination (reference iterate(maxWaitTimeMillis)): watch
    // trigger progress; any trigger that ingested rows re-arms the clock.
    // recentProgress (not lastProgress) so a data-bearing batch can't
    // slip between two polls behind a zero-row successor; batches are
    // counted once by id. The reference's maxWaitTimeMillis measures
    // IDLE time waiting for input, not processing time — so a batch
    // whose execution outlasts maxWaitMs must not be killed mid-flight:
    // the deadline only fires while no trigger is active and no source
    // data is pending, and is re-checked after a final progress drain
    // (a batch completing between the drain and the status read would
    // otherwise be lost).
    var lastDataNanos = System.nanoTime()
    var lastSeenBatch = -1L
    def drainProgress(): Unit =
      q.recentProgress.filter(_.batchId > lastSeenBatch)
        .sortBy(_.batchId).foreach { p =>
          lastSeenBatch = p.batchId
          if (p.numInputRows > 0) lastDataNanos = System.nanoTime()
        }
    def idleMs: Long = (System.nanoTime() - lastDataNanos) / 1000000L
    var quiesced = false
    while (q.isActive && !quiesced) {
      Thread.sleep(math.min(triggerMs, 100L))
      drainProgress()
      if (idleMs >= maxWaitMs && !q.status.isTriggerActive &&
          !q.status.isDataAvailable) {
        drainProgress()
        quiesced = idleMs >= maxWaitMs
      }
    }
    if (q.isActive) q.stop()
    q.awaitTermination()
    fs.delete(stagingRoot, true)
    q
  }
}
