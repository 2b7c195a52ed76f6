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

  /** Connected components via `Iterate.iterateDelta` — min-label
    * propagation where the workset is the frontier of re-labeled nodes.
    * The graph (symmetric closure of k → (k+5) mod 25 and
    * k → (3k+10) mod 25 over nation) has exactly TWO components by
    * construction: the +5 edges preserve k mod 5, and the 3k+10 edges
    * map residue class c → 3c mod 5, whose orbit merges classes
    * {1,2,3,4} and fixes {0} — so the loop must genuinely propagate
    * across several rounds (component diameter > 1), unlike a
    * single-component graph where round 1 already floods label 0.
    * Oracle: DuckDB recursive reachability closure + per-node MIN. */
  private val ccOracle =
    """WITH RECURSIVE
      |e0 AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS a,
      |         CAST((n_nationkey + 5) % 25 AS BIGINT) AS b FROM nation
      |  UNION ALL
      |  SELECT CAST(n_nationkey AS BIGINT),
      |         CAST((n_nationkey * 3 + 10) % 25 AS BIGINT) FROM nation
      |),
      |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      |r(node, lbl) AS (
      |  SELECT a, a FROM e
      |  UNION
      |  SELECT e.b, r.lbl FROM r JOIN e ON e.a = r.node
      |)
      |SELECT node, MIN(lbl) AS comp FROM r GROUP BY node ORDER BY node
      |""".stripMargin

  val queries: Seq[Query] = Seq(
    Query("q_iterate_cc", (spark, dir) => {
      val nation = Catalog.t(spark, dir, "nation")
      val k = col("n_nationkey").cast("long")
      val e0 = nation.select(k.as("a"), ((k + 5) % 25).as("b"))
        .unionByName(nation.select(k.as("a"), ((k * 3 + 10) % 25).as("b")))
      val edges = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      val sol0 = nation.select(k.as("node"), k.as("comp"))
      // validate = false: the delta is groupBy(node).agg(min) inner-joined
      // to the keyed solution — one row per key by construction, so the
      // per-round contract probe would be a pure extra job
      val labels = Iterate.iterateDelta(sol0, sol0, 50, Seq("node"),
        validate = false) {
        (sol, ws) =>
          // propagate each frontier label across its edges, keep only
          // strict improvements — the delta IS the next frontier
          val cand = edges.join(ws, edges("a") === ws("node"))
            .groupBy(col("b").as("node0")).agg(min("comp").as("cand"))
            .withColumnRenamed("node0", "node")
          val delta = cand
            .join(sol.withColumnRenamed("comp", "cur"), "node")
            .where(col("cand") < col("cur"))
            .select(col("node"), col("cand").as("comp"))
          (delta, delta)
      }
      labels.orderBy("node")
    }, Some(ccOracle)),
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
      // validate = false: same by-construction uniqueness as q_iterate_cc
      val res = Iterate.iterateDelta(sol0, ws0, 50, Seq("node"),
        validate = false) {
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
