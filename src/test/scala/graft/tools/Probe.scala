package graft.tools

import graft.engine.GraftSession
import graft.queries.Catalog

/** Dev-only scratch probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val d = "/root/testdata/sf0.01"
    val name = args.headOption.getOrElse("q_cep_sql_all_rows")
    val q = Catalog.all.find(_.name == name).get
    val df = q.run(spark, d)
    df.show(10, false)
    df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/probe_$name")
    q.oracle.foreach(sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/probe_$name.sql"), sql))
    spark.stop()
  }
}
