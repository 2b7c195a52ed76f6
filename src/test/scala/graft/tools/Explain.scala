package graft.tools

import graft.engine.GraftSession
import graft.queries.Catalog

/** Dev tool: print the formatted physical plan of named catalog queries.
  * Usage: runMain graft.tools.Explain <sfDir> <queryName>... */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Catalog.all.map(_.name)
    val spark = GraftSession.local(8)
    names.foreach { n =>
      println(s"\n======== $n ========")
      Catalog.byName(n).run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
