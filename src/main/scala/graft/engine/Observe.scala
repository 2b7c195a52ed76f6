package graft.engine

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Operator/pipeline observability — the Spark-native counterpart of the
  * reference's metric system (flink-metrics/flink-metrics-core, operator
  * `numRecordsIn/Out` counters, and user accumulators surfaced per job).
  * Three layers, all zero-extra-pass:
  *
  *  1. [[observed]] — named aggregate metrics collected WHILE an action
  *     runs, via Catalyst's `CollectMetrics` node (`df.observe`). This is
  *     the production shape for pipeline counters: a 100 TB curation run
  *     writes its output AND reports its funnel (docs in, dups dropped,
  *     docs/tokens accepted) from the SAME scan — no second report job
  *     re-reading the corpus. Metrics are computed by the executor-side
  *     aggregate the plan already runs, so the cost is one accumulator
  *     merge, not a pass.
  *  2. [[StreamObserver]] — the same `observe` on a STREAMING frame,
  *     harvested per micro-batch from `StreamingQueryProgress
  *     .observedMetrics` by a query listener: the reference's per-operator
  *     throughput counters at micro-batch granularity, without touching
  *     the query's sinks.
  *  3. [[nodeMetrics]] — the physical plan's own SQL metrics (rows
  *     output, shuffle bytes, spill…) read back AFTER execution: what the
  *     reference's web UI shows per operator, as a queryable Seq — the
  *     programmatic form of the PlanSpec audits.
  */
object Observe {

  /** Run `action` on `df` while collecting `metrics` (global aggregate
    * expressions — `count`, `sum`, `min`…) in the same pass; returns the
    * action's result and the observed metric row (name → value by the
    * aliases given on the metric columns).
    *
    * The metrics see exactly the rows that FLOW at this point of the
    * plan under the columns `df` exposes — place the observe where the
    * count should be taken (e.g. after a filter to count survivors). */
  def observed[T](df: DataFrame, name: String, metrics: Seq[Column])(
      action: DataFrame => T): (T, Map[String, Any]) = {
    require(metrics.nonEmpty, "observed: no metrics")
    val obs = Observation(name)
    val out = df.observe(obs, metrics.head, metrics.tail: _*)
    val r = action(out)
    (r, obs.get)
  }

  /** Per-micro-batch harvest of a streaming `df.observe(name, …)`:
    * attach with [[StreamObserver.listen]], read
    * [[StreamObserver.rows]] ((runId, batchId) → observed Row) or
    * [[StreamObserver.sumLong]] afterwards. Keyed by the query RUN as
    * well as the batch id — a session-wide listener sees every query,
    * and two queries (or a restart) emitting the same observation name
    * both restart batch ids at 0, so batchId alone would silently
    * last-write-win across queries and corrupt the counters. One
    * listener instance per observation name; detach with
    * [[StreamObserver.stop]]. */
  final class StreamObserver(spark: SparkSession, name: String) {
    private val byBatch = TrieMap.empty[(String, Long), Row]
    // (query id, batchId) → latest observed row. The query ID is stable
    // across restarts of the same checkpoint while runId changes per
    // restart — so a batch REPLAYED after a crash-restart (new runId)
    // overwrites the failed run's row here instead of being counted
    // twice. Progress events arrive in wall-clock order, so last-write
    // IS the surviving attempt. Two concurrent queries sharing an
    // observation name stay separate (distinct query ids).
    private val byQueryBatch = TrieMap.empty[(String, Long), Row]
    private val l = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics
        if (m != null && m.containsKey(name)) {
          byBatch.put((e.progress.runId.toString, e.progress.batchId),
            m.get(name))
          byQueryBatch.put((e.progress.id.toString, e.progress.batchId),
            m.get(name))
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(l)

    /** (runId, batchId) → observed row (last write wins under replay —
      * replays re-observe within one run, so the surviving value matches
      * the surviving batch). The per-run forensic view: a crashed run's
      * rows survive here under the old runId. */
    def rows: Map[(String, Long), Row] = byBatch.toMap
    /** Sum of a long metric across observed batches, one value per
      * (query, batchId) — a batch replayed under a restart (new runId)
      * counts ONCE, with the surviving attempt's value. */
    def sumLong(metric: String): Long =
      byQueryBatch.values.map(r => r.getAs[Long](metric)).sum
    def stop(): Unit = spark.streams.removeListener(l)
  }

  object StreamObserver {
    def listen(spark: SparkSession, name: String): StreamObserver =
      new StreamObserver(spark, name)
  }

  /** The executed plan's per-node SQL metrics after an action has run:
    * (nodeName, metricName, value). AQE-final plan; metric names are
    * Spark's own ("number of output rows", "shuffle bytes written", …).
    * Zero values are kept — absence of a metric is information too. */
  def nodeMetrics(df: DataFrame): Seq[(String, String, Long)] = {
    val plan = df.queryExecution.executedPlan
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[(String, String, Long)] = {
      val here = p.metrics.toSeq.map { case (k, m) =>
        (p.nodeName, m.name.getOrElse(k), m.value)
      }
      val kids = p match {
        // adaptive wrapper: descend into the final physical plan
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case other => other.children.flatMap(walk)
      }
      // scalar/IN subquery plans execute and report metrics too, but
      // hang off expressions, not children — without this walk a scan
      // inside `WHERE x > (SELECT …)` would silently vanish from the
      // metric view
      val subs = p.subqueries.flatMap(walk)
      here ++ kids ++ subs
    }
    walk(plan)
  }
}
