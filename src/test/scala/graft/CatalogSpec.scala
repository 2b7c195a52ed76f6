package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Catalog

/** Layer-3 ITCase sweep (SURVEY §5): every declared-inventory query runs
  * end to end on the sf0.001 fixtures. Value-level correctness is the
  * DuckDB oracle's job (tools/check_oracle.py); this guards the Scala
  * surface: analysis errors, schema breaks, empty results.
  */
class CatalogSpec extends AnyFunSuite {

  test("catalog names are unique and oracles exist for most queries") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size === names.size)
    val withOracle = Catalog.all.count(_.oracle.nonEmpty)
    assert(withOracle >= names.size - 5,
      s"only $withOracle/${names.size} queries oracle-checked")
  }

  test("documented counts cannot drift: catalog size, README, PLANS.md " +
      "sections all agree") {
    val n = Catalog.all.size
    assert(n === 232,
      "catalog size changed — update this pin, README's 'catalog " +
        "queries' count, and regenerate PLANS.md")
    def read(p: String): String = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      "UTF-8")
    assert(read("README.md").contains(s"$n catalog queries"),
      s"README.md must state the true catalog count ($n)")
    val sections = "(?m)^## q_".r.findAllIn(read("PLANS.md")).size
    assert(sections === n,
      s"PLANS.md has $sections '## q_' sections for $n catalog " +
        "queries — regenerate (sbt 'Test/runMain graft.tools.DumpPlans')")
  }

  for (q <- Catalog.all) {
    test(s"${q.name} executes and returns rows") {
      val df = q.run(SparkFixture.spark, SparkFixture.sf)
      val n = df.count()
      assert(n > 0, s"${q.name} returned 0 rows at sf0.001")
    }
  }
}
