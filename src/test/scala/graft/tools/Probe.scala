package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.GraftSession

/** Dev-only scratch probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val d = "/root/testdata/sf0.01"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    li.printSchema()
    val ev = spark.read.parquet(s"$d/events.parquet")
    ev.printSchema()
    ev.select(col("ts")).show(3, false)
    // grouping_id convention
    val g = li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    g.show(30, false)
    // write a timestamp col and inspect what lands in parquet
    li.select(col("l_shipdate")).limit(5)
      .write.mode("overwrite").parquet("/tmp/probe_ts")
    spark.read.parquet("/tmp/probe_ts").printSchema()
    spark.stop()
  }
}
