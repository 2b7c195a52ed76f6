package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe join-order variants for the heavy bench joins. */
object BenchProbe2 {
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
    import graft.queries.Catalog.{t, dsum4}

    // current q_agg_having (fact-first)
    time("having current")(noop(
      graft.queries.Catalog.byName("q_agg_having").run(spark, sfDir)))
    // dim-first: customer⋈nation⋈orders built first, fact joins once
    def havingDimFirst(): DataFrame = {
      val li = t(spark, sfDir, "lineitem")
      val o = t(spark, sfDir, "orders")
      val c = t(spark, sfDir, "customer")
      val n = t(spark, sfDir, "nation")
      val dim = o.join(c.join(broadcast(n),
          col("c_nationkey") === col("n_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("n_name"))
      li.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_items"))
        .where(col("n_items") > 100)
        .orderBy(desc("revenue"), col("n_name"))
    }
    time("having dim-first")(noop(havingDimFirst()))

    time("q_join_inner current")(noop(
      graft.queries.Catalog.byName("q_join_inner").run(spark, sfDir)))
    time("q_join_q10 current")(noop(
      graft.queries.Catalog.byName("q_join_q10").run(spark, sfDir)))
    // q10 dim-first
    def q10DimFirst(): DataFrame = {
      val c = t(spark, sfDir, "customer")
      val o = t(spark, sfDir, "orders")
        .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      val l = t(spark, sfDir, "lineitem").where(col("l_returnflag") === "R")
      val n = t(spark, sfDir, "nation")
      val dim = o.join(c.join(broadcast(n),
          col("c_nationkey") === col("n_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("n_name"))
      l.join(dim, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }
    time("q10 dim-first")(noop(q10DimFirst()))
    time("minhash")(noop(
      graft.queries.Catalog.byName("q_dedup_minhash_lsh").run(spark, sfDir)))
    time("knn_native")(noop(
      graft.queries.Catalog.byName("q_knn_native").run(spark, sfDir)))
    spark.stop()
  }
}
