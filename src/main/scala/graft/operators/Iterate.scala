package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General-purpose batch iteration combinators — the engine's analogue of
  * the reference's DataSet bulk/delta iterations (`DataSet.iterate`
  * `DataSet.java:1181`, `DataSet.iterateDelta` `DataSet.java:1234`,
  * termination contract `IterativeDataSet.closeWith`).
  *
  * Where the reference runs the loop inside its own runtime (an iteration
  * head/tail pair with a feedback channel), Spark's natural expression is a
  * DRIVER-side loop over DataFrames: each round declares one more
  * micro-plan and Catalyst/AQE optimize it independently. Two disciplines
  * make that loop scale (both learned on `Ops.connectedComponents`):
  *
  *  - `localCheckpoint` every round. Without it round N's plan replays
  *    rounds 1..N-1 — plan size, task-serialization cost and scheduler
  *    overhead all grow linearly in rounds.
  *  - O(1)-output convergence probes. Emptiness/count checks collapse to a
  *    single aggregate row on the driver; no data rows ever collect.
  *
  * `Ops.connectedComponents` and `KMeans.fit` remain hand-rolled instances
  * of this pattern (they interleave extra per-round state); these
  * combinators are the reusable library surface for everything simpler.
  */
object Iterate {

  /** Bulk iteration (reference `DataSet.iterate(maxIterations)`): applies
    * `step` exactly `maxIterations` times — the reference's semantics when
    * no termination criterion is attached. Each round is checkpointed so
    * plan depth stays O(1) in rounds. */
  def iterate(initial: DataFrame, maxIterations: Int)(
      step: DataFrame => DataFrame): DataFrame = {
    require(maxIterations >= 0, s"maxIterations < 0: $maxIterations")
    var cur = initial
    var round = 0
    while (round < maxIterations) {
      val next = step(cur).localCheckpoint()
      if (round > 0) cur.unpersist() // previous round's checkpoint blocks
      cur = next
      round += 1
    }
    cur
  }

  /** Bulk iteration with a dynamic termination criterion (reference
    * `IterativeDataSet.closeWith(iteration, terminationCriterion)`): each
    * round `step` returns `(next, criterion)`; the loop stops after the
    * round whose criterion set is EMPTY, or at `maxIterations` as the
    * fallback guard — exactly the reference's contract. The emptiness
    * probe is an O(1)-output `isEmpty` (limit-1 scan), not a count. */
  def iterateWithCriterion(initial: DataFrame, maxIterations: Int)(
      step: DataFrame => (DataFrame, DataFrame)): DataFrame = {
    require(maxIterations >= 0, s"maxIterations < 0: $maxIterations")
    var cur = initial
    var round = 0
    var done = false
    while (!done && round < maxIterations) {
      val (next0, criterion) = step(cur)
      val next = next0.localCheckpoint()
      done = criterion.isEmpty
      if (round > 0) cur.unpersist()
      cur = next
      round += 1
    }
    cur
  }

  /** Delta iteration (reference `DataSet.iterateDelta` +
    * `DeltaIteration.closeWith(delta, feedback)`): maintains a keyed
    * SOLUTION set across rounds and a WORKSET that shrinks toward empty.
    * Per round `step(solution, workset)` returns `(delta, nextWorkset)`;
    * the delta is merged into the solution by `keys` — same-key rows
    * REPLACE the old ones, the reference's solution-set-update rule — and
    * the loop ends when the new workset is empty (or at `maxIterations`,
    * the fallback guard). Returns the final solution set. The delta must
    * carry AT MOST ONE row per key (enforced per round, fail-fast): a
    * multi-row delta has no defined replace winner in a keyed solution
    * set, mirroring the reference's unique-key requirement on the
    * solution-set delta. The probe is one extra groupBy job per round;
    * pass `validate = false` on hot iteration paths where the step
    * guarantees the contract by construction (e.g. the delta IS a
    * `groupBy(keys).agg(min…)`) — the default stays on, matching the
    * reference's always-on solution-set key check.
    *
    * The scale contract mirrors the reference's rationale for delta over
    * bulk: per round only `|delta| + |workset|` rows move; the solution
    * merge is one anti-join + union on `keys` (a key-partitioned shuffle
    * whose left side is the stable solution), so quiescent keys cost
    * nothing but the join probe. Both sides are checkpointed per round. */
  def iterateDelta(initialSolution: DataFrame, initialWorkset: DataFrame,
      maxIterations: Int, keys: Seq[String], validate: Boolean = true)(
      step: (DataFrame, DataFrame) => (DataFrame, DataFrame)): DataFrame = {
    require(maxIterations >= 0, s"maxIterations < 0: $maxIterations")
    require(keys.nonEmpty, "iterateDelta: empty key list")
    keys.foreach(k => require(initialSolution.columns.contains(k),
      s"iterateDelta: key $k not in solution schema " +
        initialSolution.columns.mkString("(", ",", ")")))
    var solution = initialSolution.localCheckpoint()
    var workset = initialWorkset.localCheckpoint()
    var round = 0
    var done = workset.isEmpty
    while (!done && round < maxIterations) {
      val (delta0, nextWs0) = step(solution, workset)
      val delta = delta0.localCheckpoint()
      val nextWs = nextWs0.localCheckpoint()
      // contract: the solution set is KEYED — one tuple per key (the
      // reference's solution-set replace rule). A delta carrying two rows
      // for one key has no well-defined winner, so fail fast instead of
      // silently accumulating duplicate-key rows. O(1)-output probe over
      // the (small, checkpointed) delta, same discipline as `isEmpty` —
      // but still one Spark job per round, hence gateable (see Scaladoc).
      if (validate) {
        val dup = delta.groupBy(keys.map(col): _*).count()
          .where(col("count") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"iterateDelta: step emitted ${dup.head.getLong(keys.size)} delta " +
            s"rows for key ${keys.zipWithIndex.map { case (k, i) =>
              s"$k=${dup.head.get(i)}" }.mkString("(", ",", ")")} at round " +
            s"$round — the solution set is keyed, return at most one delta " +
            "row per key (aggregate first, e.g. groupBy(keys).agg(min(...)))")
      }
      // solution-set update: same-key delta rows replace existing rows
      val merged = solution
        .join(delta.select(keys.map(col): _*).distinct(), keys, "left_anti")
        .unionByName(delta)
        .localCheckpoint()
      done = nextWs.isEmpty
      solution.unpersist(); workset.unpersist(); delta.unpersist()
      solution = merged
      workset = nextWs
      round += 1
    }
    solution
  }
}
