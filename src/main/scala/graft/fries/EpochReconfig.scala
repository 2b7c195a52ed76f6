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
