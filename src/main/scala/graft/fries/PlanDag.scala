package graft.fries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Bridge from a Spark physical plan to the worker-level dataflow DAG the
  * MCS algorithm runs on.
  *
  * The reference builds this DAG from the ExecutionGraph
  * (`flink-runtime/.../controller/Controller.scala:70-82`, worker-level
  * vertices); in Spark the analogous runtime DAG is the executed
  * `SparkPlan` tree. Edges follow dataflow direction: child operator →
  * parent operator (sources are scan leaves, the sink is the root).
  */
object PlanDag {

  /** Stable vertex label: nodeName + plan id. */
  def label(p: SparkPlan): String = s"${p.nodeName}#${p.id}"

  /** Dataflow DAG (child → parent edges) of a physical plan. */
  def fromPlan(plan: SparkPlan): Mcs.Dag = {
    val edges = scala.collection.mutable.Map.empty[String, Set[String]]
    def walk(p: SparkPlan): Unit = {
      edges.getOrElseUpdate(label(p), Set.empty)
      p.children.foreach { c =>
        edges(label(c)) = edges.getOrElse(label(c), Set.empty) + label(p)
        walk(c)
      }
    }
    walk(plan)
    edges.toMap
  }

  /** Uses the pre-adaptive physical plan: with AQE on, executedPlan is a
    * single opaque AdaptiveSparkPlanExec node until execution finishes. */
  def fromDataFrame(df: DataFrame): Mcs.Dag =
    fromPlan(df.queryExecution.sparkPlan)

  /** Vertices whose nodeName matches any of the given operator-name
    * substrings (case-insensitive) — how callers pick reconfig targets,
    * mirroring the reference's `reconfTargets` worker-name matching
    * (`Controller.scala:37-45`). */
  def matching(dag: Mcs.Dag, nameSubstrings: Seq[String]): Set[String] =
    Mcs.vertices(dag).filter(v =>
      nameSubstrings.exists(s => v.toLowerCase.contains(s.toLowerCase)))
}
