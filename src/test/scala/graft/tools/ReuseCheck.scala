package graft.tools

import graft.engine.GraftSession
import graft.queries.Catalog

/** Dev probe: print the FINAL (post-AQE) physical plan of a catalog query
  * to check runtime exchange reuse. Usage: Test/runMain graft.tools.ReuseCheck <q> */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val name = args.headOption.getOrElse("q_knn_pq")
    val df = Catalog.all.find(_.name == name).get.run(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println(s"[reuse] ReusedExchange: ${"ReusedExchange".r.findAllIn(plan).size}")
    println(s"[reuse] Scan parquet: ${"Scan parquet".r.findAllIn(plan).size}")
    spark.stop()
  }
}
