package graft.tools

import graft.engine.GraftSession
import graft.queries.Catalog

/** Execute a catalog query and print the FINAL adaptive plan (after AQE
  * stage materialization), where exchange reuse is visible. */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.tail.toSeq
    val spark = GraftSession.local(8)
    names.foreach { n =>
      println(s"\n======== $n ========")
      val df = Catalog.byName(n).run(spark, dir)
      df.collect()
      val ep = df.queryExecution.executedPlan
      println(ep.toString.take(8000))
    }
    spark.stop()
  }
}
