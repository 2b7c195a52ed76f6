package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic for the round-5 within-JVM bench degradation
  * (q_text_lm_score runs [1.31, 2.68, 3.91] — monotonic growth).
  *
  * Runs one heavy-shuffle query N times in a single JVM and records,
  * after each run: wall time, JVM heap in use, and the size/count of
  * the Spark block-manager local dirs (shuffle + broadcast files).
  * Pass `gc` as arg(1) to System.gc() between runs — if the growth
  * curve flattens, the cause is ContextCleaner backlog (shuffle files
  * and broadcasts are only released when their owning objects are
  * GC'd; without a GC between runs, N runs of state accumulate).
  *
  * Usage: Test/runMain graft.DegradeDiag <queryName> [gc] [nRuns]
  */
object DegradeDiag {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_text_lm_score"
    val doGc = args.contains("gc")
    val n = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(6)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def blockDirs(): Seq[java.io.File] = {
      val tmp = new java.io.File(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"))
      Option(tmp.listFiles()).getOrElse(Array.empty).toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("blockmgr-"))
    }
    def dirStats(): (Long, Long) = {
      def walk(f: java.io.File): (Long, Long) =
        if (f.isFile) (f.length(), 1L)
        else Option(f.listFiles()).getOrElse(Array.empty)
          .map(walk).foldLeft((0L, 0L)) {
            case ((b1, n1), (b2, n2)) => (b1 + b2, n1 + n2)
          }
      blockDirs().map(walk).foldLeft((0L, 0L)) {
        case ((b1, n1), (b2, n2)) => (b1 + b2, n1 + n2)
      }
    }
    def heapUsed(): Long = {
      val rt = Runtime.getRuntime
      rt.totalMemory() - rt.freeMemory()
    }

    val fn = SparkEntry.queries(name)
    // warmup (codegen/JIT), untimed — same as Bench
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"run,sec,heapMB,shuffleMB,shuffleFiles,gcBetween=$doGc%s")
    for (i <- 1 to n) {
      if (doGc) { System.gc(); Thread.sleep(1000) }
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val (bytes, files) = dirStats()
      println(f"$i%d,$sec%.3f,${heapUsed() / 1024 / 1024}%d," +
        f"${bytes / 1024 / 1024}%d,$files%d")
    }
    spark.stop()
  }
}
