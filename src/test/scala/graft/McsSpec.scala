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

  test("scoped publish reconfigures exactly the MCS, atomically per epoch") {
    import graft.fries.ScopedReconfigController
    // src -> map -> agg -> sink; a side branch src -> other
    val dag: Mcs.Dag = Map(
      "src" -> Set("map", "other"), "map" -> Set("agg"),
      "agg" -> Set("sink"), "other" -> Set.empty[String],
      "sink" -> Set.empty[String])
    val ctrl = new ScopedReconfigController[Int](dag, initial = 1)
    assert(ctrl.configFor("map") === 1 && ctrl.configFor("other") === 1)
    // target map+agg: the MCS is the chain between them only
    val scope = ctrl.publish(Set("map", "agg"), config = 9)
    assert(scope === Set("map", "agg"))
    assert(ctrl.configFor("map") === 9 && ctrl.configFor("agg") === 9)
    // operators outside the scope keep the prior config
    assert(ctrl.configFor("src") === 1)
    assert(ctrl.configFor("other") === 1)
    assert(ctrl.configFor("sink") === 1)
    // the snapshot an epoch reads is a single consistent version
    val snap = ctrl.current
    assert(snap.version === 1L)
    assert(ctrl.noteApplied(snap).isDefined)   // first epoch records trip
    assert(ctrl.noteApplied(snap).isEmpty)     // later epochs don't
    assert(ctrl.roundTripsMs.size === 1)
  }
}
