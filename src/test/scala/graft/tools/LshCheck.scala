package graft.tools
object LshCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.local()
    // semantics: new plan's result == old dump at sf0.01
    val now = graft.queries.Catalog.byName("q_sim_pairs_lsh")
      .run(spark, "/root/testdata/sf0.01").collect()
      .map(_.toString).sorted
    val old = spark.read.parquet("/tmp/verify_out/q_sim_pairs_lsh")
      .collect().map(_.toString).sorted
    println(s"[lsh] rows now=${now.length} old=${old.length} equal=${now.sameElements(old)}")
    // timing at sf1
    def time(d: String): Double = {
      val t0 = System.nanoTime()
      graft.queries.Catalog.byName("q_sim_pairs_lsh").run(spark, d)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[lsh] sf0.1 ${time("/root/testdata/sf0.1")}%.1f s")
    println(f"[lsh] sf1   ${time("/root/repo/target/scaledata/sf1")}%.1f s")
    spark.stop()
  }
}
