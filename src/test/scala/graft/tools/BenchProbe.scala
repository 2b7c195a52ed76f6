package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off timing breakdown for bench queries (not part of the driver
  * contract): compares noop-sink vs count() forcing and isolates scan,
  * filter, and aggregate cost for the slow queries. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.all.foreach(t =>
      graft.engine.Tables.load(spark, sfDir, t).count())

    def time(label: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-40s best=${runs.min}%.3f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = graft.engine.Tables.load(spark, sfDir, "lineitem")
    time("lineitem scan count")(li.count())
    time("lineitem scan noop all cols")(noop(li))
    val filtered = li.where(col("l_shipdate") <= lit("2002-09-02").cast("timestamp"))
    time("filter count")(filtered.count())
    import graft.queries.Catalog.{dsum, dsum4, davg}
    val aggD = filtered.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
    time("tpch1 agg decimal noop")(noop(aggD))
    time("tpch1 agg decimal + orderBy noop")(noop(aggD.orderBy(col("l_returnflag"), col("l_linestatus"))))
    val aggDouble = filtered.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
    time("tpch1 agg double noop")(noop(aggDouble))
    val aggLong = filtered.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg((sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("sum_base_price"),
        (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")) / 10000.0).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    time("tpch1 agg scaled-long noop")(noop(aggLong))

    // q_agg_having shape
    val q = graft.queries.Catalog.byName("q_agg_having")
    time("q_agg_having noop")(noop(q.run(spark, sfDir)))
    val q2 = graft.queries.Catalog.byName("q_agg_distinct")
    time("q_agg_distinct noop")(noop(q2.run(spark, sfDir)))
    spark.stop()
  }
}
