package graft.fries

import scala.collection.mutable

/** Minimal Covering Subgraph (MCS) computation for scoped runtime
  * reconfiguration — the core Fries algorithm, re-expressed as a pure
  * function over an adjacency-map DAG.
  *
  * Reference behavior (not code): Fries-Flink
  * `flink-runtime/src/main/scala/org/apache/flink/runtime/controller/FriesAlg.java:12-70`:
  * seed M with the reconfigured workers; add every one-to-many worker that
  * has a reconfigured descendant; the MCS is the set of vertices both
  * forward-reachable from M and backward-reachable to M (M itself
  * included), with the induced edges. `sources` (:72-81) returns the
  * in-degree-0 vertices of a scope — where control messages are injected.
  *
  * In the Spark engine this runs over an operator DAG extracted from a
  * physical plan (see [[PlanDag]]) to decide which operators an
  * epoch-scoped reconfiguration must quiesce; the graph algorithm is
  * engine-agnostic.
  */
object Mcs {

  type Dag = Map[String, Set[String]]

  /** All vertices: keys plus edge targets. */
  def vertices(dag: Dag): Set[String] =
    dag.keySet ++ dag.values.flatten

  /** Reverse adjacency (child -> parents). */
  def reversed(dag: Dag): Dag = {
    val rev = mutable.Map.empty[String, Set[String]]
    vertices(dag).foreach(v => rev(v) = Set.empty)
    for ((p, cs) <- dag; c <- cs) rev(c) = rev(c) + p
    rev.toMap
  }

  /** Kahn topological order; throws on cycles (the plan DAG is acyclic). */
  def topological(dag: Dag): Seq[String] = {
    val inDeg = mutable.Map.empty[String, Int].withDefaultValue(0)
    val vs = vertices(dag)
    vs.foreach(v => inDeg(v) = 0)
    for (cs <- dag.values; c <- cs) inDeg(c) += 1
    val queue = mutable.Queue(vs.filter(inDeg(_) == 0).toSeq.sorted: _*)
    val out = mutable.ArrayBuffer.empty[String]
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      out += v
      for (c <- dag.getOrElse(v, Set.empty)) {
        inDeg(c) -= 1
        if (inDeg(c) == 0) queue.enqueue(c)
      }
    }
    require(out.size == vs.size, s"cycle in DAG: ${vs -- out}")
    out.toSeq
  }

  /** Vertices reachable from `seed` (inclusive) following edges forward. */
  def descendantsOf(dag: Dag, seed: Set[String]): Set[String] = {
    val topo = topological(dag)
    val parentsOf = reversed(dag)
    topo.foldLeft(Set.empty[String]) { (acc, v) =>
      if (seed(v) || parentsOf.getOrElse(v, Set.empty).exists(acc)) acc + v
      else acc
    }
  }

  /** Vertices that can reach `seed` (inclusive) following edges forward. */
  def ancestorsOf(dag: Dag, seed: Set[String]): Set[String] = {
    val topo = topological(dag).reverse
    topo.foldLeft(Set.empty[String]) { (acc, v) =>
      if (seed(v) || dag.getOrElse(v, Set.empty).exists(acc)) acc + v
      else acc
    }
  }

  /** The Minimal Covering Subgraph: given the worker DAG, the set of
    * workers being reconfigured, and the set of one-to-many (fan-out
    * repartitioning) workers, return the minimal subgraph that a scoped
    * epoch must cover for the reconfiguration to be consistent.
    */
  def computeMCS(
      dag: Dag,
      reconfigWorkers: Set[String],
      oneToManyWorkers: Set[String] = Set.empty): Dag = {
    // M = reconfigured workers + one-to-many workers with a reconfigured
    // descendant (their routing decision affects the reconfigured scope).
    val m = reconfigWorkers ++ oneToManyWorkers.filter { w =>
      (descendantsOf(dag, Set(w)) - w).exists(reconfigWorkers)
    }
    val scope = descendantsOf(dag, m) intersect ancestorsOf(dag, m)
    val inducedEdges = for {
      (p, cs) <- dag.toSeq
      if scope(p)
      c <- cs
      if scope(c)
    } yield p -> c
    val adjacency = inducedEdges.groupMap(_._1)(_._2)
      .view.mapValues(_.toSet).toMap
    // every scope (and M) vertex appears as a key, even if edge-less
    (scope ++ m).map(v => v -> adjacency.getOrElse(v, Set.empty)).toMap
  }

  /** In-degree-0 vertices of a scope — the injection points for an
    * epoch-scoped control message. */
  def sources(dag: Dag): Set[String] = {
    val targets = dag.values.flatten.toSet
    vertices(dag).filterNot(targets)
  }
}
