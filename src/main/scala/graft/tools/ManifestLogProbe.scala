package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.StatsManifest

/** Proves the manifest LOG stays flat over a long-lived table (VERDICT
  * r10 ask #1's "Done" evidence): 1,000 incremental commits — the
  * per-micro-batch streaming-sink shape, one tiny appended file +
  * `StatsManifest.update` each — with per-commit wall time and
  * read-path (plan + count, snapshot read, latest resolution) sampled
  * at milestones. Pre-r11, every commit re-collected and rewrote the
  * full carried entry set (O(files)) and every latest-resolution listed
  * the version directory (O(versions)); now commits write O(delta)
  * versions with an every-16th checkpoint fold and reads gallop from
  * the `_latest_hint`, so the curves must be flat.
  *
  *   sbt "runMain graft.tools.ManifestLogProbe [commits]"
  *
  * Prints one JSON line and writes target/manifestlogprobe.json. */
object ManifestLogProbe {

  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = new java.io.File("target/manifestlogprobe/t").getAbsolutePath
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    (0 until 1000).map(i => (i.toLong, i % 7)).toDF("k", "m")
      .repartition(2).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))

    val milestones = Seq(50, 100, 250, 500, 750, commits).distinct
      .filter(_ <= commits)
    val commitSec = new Array[Double](commits + 1)
    val samples = scala.collection.mutable.ArrayBuffer.empty[String]

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }

    (1 to commits).foreach { i =>
      (100000 + i to 100000 + i).map(j => (j.toLong, 0)).toDF("k", "m")
        .coalesce(1).write.mode("append").parquet(dir)
      val t = System.nanoTime()
      StatsManifest.update(spark, dir, Seq("k"))
      commitSec(i) = (System.nanoTime() - t) / 1e9
      if (milestones.contains(i)) {
        // read path at this log length: pruned point scan (plan+exec),
        // latest resolution, full driver manifest read
        val t1 = System.nanoTime()
        val n = StatsManifest.scan(spark, dir)
          .where(col("k") === (100000L + i)).count()
        val scanSec = (System.nanoTime() - t1) / 1e9
        require(n == 1L, s"probe: point scan at $i returned $n rows")
        val t2 = System.nanoTime()
        val latest = StatsManifest.latestVersion(spark, dir).get
        val latestSec = (System.nanoTime() - t2) / 1e9
        val t3 = System.nanoTime()
        val sz = StatsManifest.readAt(spark, dir, latest).size
        val readSec = (System.nanoTime() - t3) / 1e9
        require(sz == 2 + i, s"probe: manifest at $i has $sz entries")
        val win = ((i - 19) to i).map(commitSec)
        samples += f"""{"commits":$i,"commit_sec_p50_last20":${med(win)}%.3f,""" +
          f""""scan_point_sec":$scanSec%.3f,"latest_sec":$latestSec%.4f,""" +
          f""""manifest_read_sec":$readSec%.3f}"""
      }
    }

    // latest-resolution microbenchmark at full log length: hint-gallop
    // vs the raw directory listing it replaced
    def avgMs(reps: Int)(body: => Unit): Double = {
      body // warm
      val t = System.nanoTime()
      (0 until reps).foreach(_ => body)
      (System.nanoTime() - t) / 1e6 / reps
    }
    val hintMs = avgMs(50)(StatsManifest.latestVersion(spark, dir))
    val listMs = avgMs(50)(StatsManifest.versions(spark, dir))

    val early = med(((commits / 10 - 19) to commits / 10).map(commitSec))
    val late = med(((commits - 19) to commits).map(commitSec))
    val line = f"""{"commits":$commits,""" +
      f""""commit_sec_p50_early":$early%.3f,"commit_sec_p50_late":$late%.3f,""" +
      f""""late_over_early":${late / early}%.2f,""" +
      f""""latest_hint_ms":$hintMs%.2f,"latest_listing_ms":$listMs%.2f,""" +
      s""""milestones":[${samples.mkString(",")}]}"""
    val out = new java.io.File("target/manifestlogprobe.json")
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(line) finally w.close()
    println(line)
    spark.stop()
  }
}
