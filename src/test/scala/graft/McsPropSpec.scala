package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fries.Mcs

/** Property tests for the MCS algorithm over random DAGs (SURVEY §5:
  * property tests where cheap). DAGs are generated with edges only from
  * lower to higher vertex ids — acyclic by construction; 200 seeded
  * cases per property. */
class McsPropSpec extends AnyFunSuite {

  private def randomCase(seed: Int): (Mcs.Dag, Set[String]) = {
    val rnd = new scala.util.Random(seed)
    val n = 2 + rnd.nextInt(9)
    val vs = (0 until n).map(i => s"v$i")
    val dag = vs.zipWithIndex.map { case (v, i) =>
      v -> (i + 1 until n).filter(_ => rnd.nextDouble() < 0.3)
        .map(j => s"v$j").toSet
    }.toMap
    val reconfig = vs.filter(_ => rnd.nextDouble() < 0.4).toSet match {
      case s if s.nonEmpty => s
      case _ => Set(vs(rnd.nextInt(n)))
    }
    (dag, reconfig)
  }

  private def forAllCases(f: (Mcs.Dag, Set[String]) => Unit): Unit =
    (1 to 200).foreach { seed =>
      val (dag, reconfig) = randomCase(seed)
      try f(dag, reconfig)
      catch {
        case e: Throwable =>
          fail(s"seed=$seed dag=$dag reconfig=$reconfig: ${e.getMessage}", e)
      }
    }

  test("MCS contains every reconfigured worker") {
    forAllCases { (dag, reconfig) =>
      val mcs = Mcs.computeMCS(dag, reconfig)
      assert(reconfig.subsetOf(Mcs.vertices(mcs)))
    }
  }

  test("MCS vertices lie on paths between members (covering property)") {
    forAllCases { (dag, reconfig) =>
      val scope = Mcs.vertices(Mcs.computeMCS(dag, reconfig))
      scope.foreach { v =>
        assert(Mcs.descendantsOf(dag, reconfig).contains(v))
        assert(Mcs.ancestorsOf(dag, reconfig).contains(v))
      }
    }
  }

  test("MCS is idempotent: recomputing over the scope shrinks nothing new") {
    forAllCases { (dag, reconfig) =>
      val mcs = Mcs.computeMCS(dag, reconfig)
      val again = Mcs.computeMCS(mcs, reconfig intersect Mcs.vertices(mcs))
      assert(Mcs.vertices(again).subsetOf(Mcs.vertices(mcs)))
    }
  }

  test("singleton reconfig with no one-to-many yields a singleton scope") {
    forAllCases { (dag, _) =>
      val v = Mcs.vertices(dag).head
      assert(Mcs.vertices(Mcs.computeMCS(dag, Set(v))) === Set(v))
    }
  }

  test("one-to-many ancestors of a reconfig worker join the scope") {
    forAllCases { (dag, reconfig) =>
      val oneToMany = Mcs.vertices(dag)
      val mcs = Mcs.computeMCS(dag, reconfig, oneToMany)
      // every vertex with a reconfig descendant is in M, so the scope
      // must contain all such vertices
      val expected = oneToMany.filter(w =>
        (Mcs.descendantsOf(dag, Set(w)) - w).exists(reconfig))
      assert(expected.subsetOf(Mcs.vertices(mcs)))
    }
  }
}
