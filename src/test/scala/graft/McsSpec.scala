package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fries.{Mcs, PlanDag}
import graft.queries.Catalog

/** Fries MCS semantics (reference FriesAlg.java:12-70 behavior):
  * M seeds with reconfig workers + one-to-many workers with a reconfig
  * descendant; scope = forward-reachable(M) ∩ backward-reachable(M). */
class McsSpec extends AnyFunSuite {

  //      a → b → c → e
  //           ↘ d ↗
  private val diamond: Mcs.Dag = Map(
    "a" -> Set("b"), "b" -> Set("c", "d"),
    "c" -> Set("e"), "d" -> Set("e"), "e" -> Set.empty)

  test("single reconfig worker → singleton MCS") {
    val mcs = Mcs.computeMCS(diamond, Set("c"))
    assert(mcs.keySet === Set("c"))
    assert(mcs("c").isEmpty)
  }

  test("two reconfig workers → covering subgraph between them") {
    val mcs = Mcs.computeMCS(diamond, Set("b", "e"))
    // everything on any b→e path is covered
    assert(mcs.keySet === Set("b", "c", "d", "e"))
    assert(mcs("b") === Set("c", "d"))
    assert(mcs("c") === Set("e"))
  }

  test("one-to-many worker joins M only with a reconfig descendant") {
    val withFanout = Mcs.computeMCS(diamond, Set("e"), oneToManyWorkers = Set("b"))
    assert(withFanout.keySet === Set("b", "c", "d", "e"))
    val noDescendant = Mcs.computeMCS(diamond, Set("a"), oneToManyWorkers = Set("b"))
    assert(noDescendant.keySet === Set("a"))
  }

  test("sources of a scope are its in-degree-0 vertices") {
    assert(Mcs.sources(diamond) === Set("a"))
    val mcs = Mcs.computeMCS(diamond, Set("b", "e"))
    assert(Mcs.sources(mcs) === Set("b"))
  }

  test("plan DAG extraction covers the physical plan of a real query") {
    val df = Catalog.byName("q_join_inner").run(SparkFixture.spark, SparkFixture.sf)
    val dag = PlanDag.fromDataFrame(df)
    assert(Mcs.vertices(dag).size > 3)
    assert(Mcs.sources(dag).nonEmpty)
    // scoping to the scan sources yields a non-empty covering subgraph
    val scans = PlanDag.matching(dag, Seq("Scan"))
    assert(scans.nonEmpty)
    val mcs = Mcs.computeMCS(dag, scans)
    assert(Mcs.vertices(mcs).nonEmpty)
  }
}
