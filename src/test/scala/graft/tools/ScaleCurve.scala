package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Catalog

/** Dev probe: the 3-point scaling curve (sf0.1 → sf1 → sf10, each a
  * deterministic 10× ScaleData step) for a subset of headline queries.
  * One-off evidence for SCALE.md — the per-round bench carries the
  * sf0.1 + sf1 sections; this adds the 100× point (60M-row lineitem,
  * 50k-key dimensions, 500k docs) to show the curve goes linear once
  * the 32 local cores saturate — the slope a cluster scales out.
  *
  * Usage: SPARK_DRIVER_MEM=24g sbt "Test/runMain graft.tools.ScaleCurve"
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = new java.io.File("target/scaledata/sf1").getAbsolutePath
    val sf10 = new java.io.File("target/scaledata/sf10").getAbsolutePath
    val queries = args.toSeq match {
      case Nil => Seq("q_join_inner", "q_agg_tpch1", "q_agg_distinct",
        "q_ds_inventory_ahead", "q_dedup_exact", "q_dedup_minhash_lsh",
        "q_text_lm_score", "q_knn_native", "q_topn", "q_window_tumble")
      case qs => qs
    }
    val spark = graft.engine.GraftSession.local()
    val t0 = System.nanoTime()
    ScaleData.ensure(spark, sf01, sf1, 10)
    val g1 = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    ScaleData.ensure(spark, sf1, sf10, 10)
    val g10 = (System.nanoTime() - t1) / 1e9
    println(f"[curve] gen sf1=$g1%.0f s sf10=$g10%.0f s")

    def run(name: String, dir: String): Double = {
      val t = System.nanoTime()
      Catalog.byName(name).run(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    println(f"${"query"}%-24s ${"sf0.1"}%8s ${"sf1"}%8s ${"sf10"}%8s " +
      f"${"r(1/0.1)"}%9s ${"r(10/1)"}%9s")
    queries.foreach { q =>
      run(q, sf01) // warmup: codegen + JIT
      val a = Seq.fill(2)(run(q, sf01)).min
      val b = Seq.fill(2)(run(q, sf1)).min
      val c = Seq.fill(2)(run(q, sf10)).min
      println(f"[curve] $q%-22s $a%8.2f $b%8.2f $c%8.2f " +
        f"${b / a}%9.2f ${c / b}%9.2f")
    }
    spark.stop()
  }
}
