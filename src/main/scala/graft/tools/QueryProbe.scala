package graft.tools

/** Focused A/B timing probe for attributing single-query regressions
  * (VERDICT r8 what's-wrong #2): run a named subset of catalog queries
  * at a load-gated moment with more repetitions than the bench's five —
  * per-run times, min, median, and the recorded load per run — so a
  * cross-session uptick can be attributed to load/JVM state vs plan.
  *   sbt "runMain graft.tools.QueryProbe q_a,q_b [sfDir] [reps]"
  * Prints one JSON line and writes target/queryprobe.json.
  */
object QueryProbe {

  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .getOrElse("q_ds_inventory_ahead,q_dedup_minhash_lsh,q_agg_tpch1")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(7)
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def load: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    // same gate discipline as Bench
    val t0 = System.nanoTime()
    while (load > 2.5 && (System.nanoTime() - t0) / 1e9 < 300)
      Thread.sleep(5000)
    graft.engine.Tables.all.foreach(t =>
      graft.engine.Tables.load(spark, sfDir, t).count())
    val entries = names.map { name =>
      val fn = graft.queries.Catalog.byName(name).run
      def once(): (Double, Double) = {
        val t = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t) / 1e9
        System.gc()
        (sec, load)
      }
      once(); once() // two warmups (codegen + C2, see Bench run-order notes)
      val runs = Seq.fill(reps)(once())
      val ts = runs.map(_._1)
      val med = ts.sorted.apply(ts.size / 2)
      s""""$name":{"min":${f"${ts.min}%.3f"},"median":${f"$med%.3f"},""" +
        s""""runs":${ts.map(t => f"$t%.3f").mkString("[", ",", "]")},""" +
        s""""load":${runs.map(r => f"${r._2}%.1f").mkString("[", ",", "]")}}"""
    }
    val line = s"""{"sf":"$sfDir",${entries.mkString(",")}}"""
    val out = new java.io.File("target/queryprobe.json")
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(line) finally w.close()
    println(line)
    spark.stop()
  }
}
