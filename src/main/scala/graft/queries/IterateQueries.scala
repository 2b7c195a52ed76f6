package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Iterate

/** Catalog rows for the batch iteration combinators (reference DataSet
  * bulk/delta iteration, `DataSet.java:1181-1234`) — oracle-checked
  * against DuckDB recursive CTEs so the Iterations inventory row carries
  * a hash-matched correctness entry, not only ScalaTests.
  *
  * The graph is derived deterministically from the `nation` fixture
  * (25 rows at every SF): each nationkey k contributes the two weighted
  * edges k → (2k+1) mod 25 (weight k mod 7 + 1) and k → (k+3) mod 25
  * (weight k mod 5 + 1). The +3 edges alone cycle through all residues
  * (gcd(3, 25) = 1), so every node is reachable from source 0 and both
  * engines emit all 25 nodes. */
object IterateQueries {

  /** Single-source shortest paths via `Iterate.iterateDelta` — the
    * reference's own canonical delta-iteration example: the workset is
    * the frontier of improved nodes, the solution merge replaces only
    * relaxed distances, and the loop ends when no relaxation fires.
    * The DuckDB oracle enumerates bounded-cost path extensions with a
    * recursive CTE and takes the per-node minimum — same answers, from
    * the definitional recurrence rather than the engine under test. */
  private val ssspOracle =
    """WITH RECURSIVE
      |e AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS a,
      |         CAST((n_nationkey * 2 + 1) % 25 AS BIGINT) AS b,
      |         CAST(n_nationkey % 7 + 1 AS BIGINT) AS w FROM nation
      |  UNION ALL
      |  SELECT CAST(n_nationkey AS BIGINT),
      |         CAST((n_nationkey + 3) % 25 AS BIGINT),
      |         CAST(n_nationkey % 5 + 1 AS BIGINT) FROM nation
      |),
      |p(node, dist) AS (
      |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |  UNION
      |  SELECT e.b, p.dist + e.w FROM p JOIN e ON e.a = p.node
      |  WHERE p.dist + e.w < 200
      |)
      |SELECT node, MIN(dist) AS dist FROM p GROUP BY node ORDER BY node
      |""".stripMargin

  val queries: Seq[Query] = Seq(
    Query("q_iterate_sssp", (spark, dir) => {
      val nation = Catalog.t(spark, dir, "nation")
      val k = col("n_nationkey").cast("long")
      val edges = nation.select(k.as("a"), ((k * 2 + 1) % 25).as("b"),
          (k % 7 + 1).as("w"))
        .unionByName(nation.select(k.as("a"), ((k + 3) % 25).as("b"),
          (k % 5 + 1).as("w")))
      // unreachable sentinel: any value above every true distance works;
      // the bound below matches the oracle's path-cost cutoff
      val inf = 200L
      val sol0 = nation.select(k.as("node"),
        when(k === 0, 0L).otherwise(inf).as("dist"))
      val ws0 = sol0.where(col("node") === 0)
      val res = Iterate.iterateDelta(sol0, ws0, 50, Seq("node")) {
        (sol, ws) =>
          val cand = ws.join(edges, ws("node") === edges("a"))
            .select(col("b").as("node"), (ws("dist") + col("w")).as("nd"))
            .groupBy("node").agg(min("nd").as("cand"))
          val delta = cand
            .join(sol.withColumnRenamed("dist", "cur"), "node")
            .where(col("cand") < col("cur"))
            .select(col("node"), col("cand").as("dist"))
          (delta, delta)
      }
      res.where(col("dist") < inf).orderBy("node")
    }, Some(ssspOracle)))
}
