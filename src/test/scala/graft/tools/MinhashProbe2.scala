package graft.tools

import graft.engine.GraftSession
import graft.queries.Catalog

/** Dev probe: fresh-DataFrame repeated runs of q_dedup_minhash_lsh. */
object MinhashProbe2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val q = Catalog.byName("q_dedup_minhash_lsh")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      q.run(spark, d).count()
      println(f"[probe] run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    println(Catalog.byName("q_dedup_minhash_lsh").run(spark, d)
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan") || l.contains("Join"))
      .mkString("\n"))
    spark.stop()
  }
}
