package graft.fries

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Epoch-based runtime reconfiguration for Structured Streaming.
  *
  * The reference delivers a `ControlMessage` through checkpoint-barrier
  * epochs so every worker switches configuration at the same consistent
  * cut (`flink-runtime/.../controller/Controller.scala:137-147`,
  * `flink-streaming-java/.../tasks/StreamTask.java:385-415`). In Spark's
  * micro-batch model every batch boundary IS a global epoch barrier, so
  * the idiomatic equivalent is: publish a new config version, and have
  * the query re-read it at the top of each `foreachBatch` — all operators
  * in batch N+1 see the new config, none in batch N do. That reproduces
  * the reference's `epoch` scheduler exactly; the `fries` scheduler's
  * smaller blast radius (only the MCS quiesces) has no Spark analogue to
  * exploit because Spark already doesn't quiesce anything between
  * batches — [[Mcs.computeMCS]] is still provided (over [[PlanDag]]) for
  * scope introspection and parity tests.
  */
final class ReconfigController[C](initial: C) {

  final case class Versioned(version: Long, config: C, publishedAtNanos: Long)

  private val state = new AtomicReference(
    Versioned(0L, initial, System.nanoTime()))

  /** Round-trip latencies (publish → first batch applying the version),
    * mirroring the avg round-trip metric the reference prints
    * (`Controller.scala:140-152`). */
  private val applied = new AtomicReference(Map.empty[Long, Long])

  def publish(config: C): Long = {
    val next = state.get().version + 1
    state.set(Versioned(next, config, System.nanoTime()))
    next
  }

  def current: Versioned = state.get()

  /** Record that a batch just started with the given version; returns the
    * publish→apply latency in ms the first time a version is observed. */
  def noteApplied(v: Versioned): Option[Double] = {
    val seen = applied.get()
    if (seen.contains(v.version)) None
    else {
      val latencyNanos = System.nanoTime() - v.publishedAtNanos
      applied.set(seen + (v.version -> latencyNanos))
      Some(latencyNanos / 1e6)
    }
  }

  /** publish→first-apply latency per version, ms, in version order. */
  def roundTripsMs: Seq[Double] = {
    val seen = applied.get()
    seen.keys.toSeq.sorted.map(v => seen(v) / 1e6)
  }
}

/** MCS-scoped reconfiguration (the Fries scheduler proper —
  * Controller.scala:120-126 `reconfScheduler=fries` vs the whole-DAG
  * `epoch` default): a config update TARGETS a set of operators, and at
  * the next epoch it applies to exactly the operators inside the MCS
  * computed over the dataflow DAG — every operator outside the scope
  * keeps its previous config, mirroring the reference's scoped
  * pause/reconfigure/resume without touching the rest of the job.
  *
  * The per-operator config map is versioned atomically, so one epoch
  * either sees a scope's update completely or not at all — the
  * consistency property Fries' scoped epochs provide.
  */
final class ScopedReconfigController[C](dag: Mcs.Dag, initial: C,
    oneToMany: Set[String] = Set.empty[String]) {
  import java.util.concurrent.atomic.AtomicReference

  final case class Snapshot(version: Long, configs: Map[String, C],
      publishedAtNanos: Long)

  private val state = new AtomicReference[Snapshot](
    Snapshot(0L, Mcs.vertices(dag).map(_ -> initial).toMap,
      System.nanoTime()))
  private val lastApplied = new AtomicReference[Long](0L)
  private val trips = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]

  /** Publish `config` for `targets`; applies to the full MCS of the
    * targets (returned), leaving every other operator untouched. */
  def publish(targets: Set[String], config: C): Set[String] = {
    val scope = Mcs.vertices(Mcs.computeMCS(dag, targets, oneToMany))
    state.updateAndGet { s =>
      Snapshot(s.version + 1, s.configs ++ scope.map(_ -> config),
        System.nanoTime())
    }
    scope
  }

  def current: Snapshot = state.get()

  /** Per-operator config at this epoch. */
  def configFor(op: String): C = state.get().configs(op)

  /** Record the first epoch that observed a new version (round-trip). */
  def noteApplied(s: Snapshot): Option[Double] = {
    val prev = lastApplied.getAndUpdate(v => math.max(v, s.version))
    if (s.version > prev) {
      val ms = (System.nanoTime() - s.publishedAtNanos) / 1e6
      trips.add(ms)
      Some(ms)
    } else None
  }

  def roundTripsMs: Seq[Double] = {
    import scala.jdk.CollectionConverters._
    trips.asScala.map(_.doubleValue).toSeq
  }
}

object EpochReconfig {

  /** Wrap a per-batch body so it re-reads the controller at every epoch:
    * `writeStream.foreachBatch(EpochReconfig.withConfig(ctrl) { (df, id, cfg) => … })`.
    */
  def withConfig[C](ctrl: ReconfigController[C])(
      body: (DataFrame, Long, C) => Unit): (DataFrame, Long) => Unit = {
    (df: DataFrame, batchId: Long) =>
      val v = ctrl.current
      ctrl.noteApplied(v).foreach { ms =>
        // first batch on a new config version = reconfiguration complete
        println(f"[fries] config v${v.version} applied at batch $batchId " +
          f"(round-trip ${ms}%.1f ms)")
      }
      body(df, batchId, v.config)
  }

  /** Like [[withConfig]] but MCS-scoped: the body receives the full
    * per-operator config map of the epoch; each operator stage reads its
    * own entry, so a scoped publish changes behavior for exactly the MCS
    * members from the next batch on. */
  def withScopedConfig[C](ctrl: ScopedReconfigController[C])(
      body: (DataFrame, Long, Map[String, C]) => Unit): (DataFrame, Long) => Unit = {
    (df: DataFrame, batchId: Long) =>
      val s = ctrl.current
      ctrl.noteApplied(s).foreach { ms =>
        println(f"[fries] scoped config v${s.version} applied at batch " +
          f"$batchId (round-trip ${ms}%.1f ms)")
      }
      body(df, batchId, s.configs)
  }

  /** Listener logging per-batch progress — the observability half of the
    * reference controller's stdout metrics. */
  final class EpochListener extends StreamingQueryListener {
    @volatile var batches: Long = 0L
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = batches += 1
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}
