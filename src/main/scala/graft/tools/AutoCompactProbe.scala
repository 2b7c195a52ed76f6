package graft.tools

import java.nio.file.{Files, Paths}

import graft.sources.StatsManifest
import graft.streaming.Streams

/** Measures the round-12 auto-compaction story: a per-micro-batch
  * append sink must keep a long-lived table's LIVE file count — and
  * therefore every reader's scan planning and task count — BOUNDED,
  * with no one running OPTIMIZE.
  *
  *   sbt "runMain graft.tools.AutoCompactProbe [commits] [rowsPerBatch]"
  *
  * Drives `commits` (default 500) micro-batch commits through the
  * EXACT sink code path ([[Streams.appendCommitToManifestedTable]] —
  * stage-rename, incremental manifest reconcile, lazy expire,
  * commit-time compaction policy) and records, at every commit: live
  * file count (from the manifest), and at every 50th: a full
  * scanWithIndex planning sample (ms) plus the listed-file count a
  * reader would schedule tasks for. Writes one JSON line to stdout and
  * `target/autocompactprobe.json`. Flat live-file and plan-time curves
  * = the policy works; the policy OFF control (same loop,
  * minFiles = 0, commits/5 iterations) shows the unbounded growth it
  * removes. */
object AutoCompactProbe {

  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(500)
    val rowsPerBatch = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def run(minFiles: Int, n: Int): (Seq[Int], Seq[(Int, Double, Long)],
        Double) = {
      val root = Files.createTempDirectory("graft_autocompact").toString
      val dir = root + "/t"
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val fs = dirPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(dirPath)
      val staging = new org.apache.hadoop.fs.Path(dir + ".staging")
      spark.conf.set("spark.graft.autoCompact.minFiles",
        minFiles.toString)
      val live = scala.collection.mutable.ArrayBuffer.empty[Int]
      val plans =
        scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Long)]
      val t0 = System.nanoTime()
      try {
        (0 until n).foreach { i =>
          val batch = (0 until rowsPerBatch)
            .map(j => (i.toLong * rowsPerBatch + j, j.toLong))
            .toDF("k", "v").coalesce(1) // one file per commit — the
            // steady micro-batch shape; the policy then fires every
            // ~minFiles commits rather than every commit
          Streams.appendCommitToManifestedTable(fs, dirPath, staging,
            dir, i.toLong, batch, Seq("k"),
            manifestVersionsToKeep = 16)
          live += StatsManifest.read(spark, dir).size
          if (i % 50 == 0 || i == n - 1) {
            val p0 = System.nanoTime()
            val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
            scan.where(org.apache.spark.sql.functions.col("v") >= 0L)
              .count() // forces the listing (v is not a stats column)
            plans += ((i, (System.nanoTime() - p0) / 1e6,
              idx.total.get()))
          }
        }
      } finally spark.conf.unset("spark.graft.autoCompact.minFiles")
      (live.toSeq, plans.toSeq, (System.nanoTime() - t0) / 1e9)
    }

    val (liveOn, plansOn, wallOn) = run(minFiles = 8, commits)
    val (liveOff, _, _) = run(minFiles = 0, math.max(1, commits / 5))

    def arr(xs: Seq[Int]): String = xs.mkString("[", ",", "]")
    val planStr = plansOn.map { case (i, ms, files) =>
      s"""{"commit":$i,"plan_ms":${f"$ms%.0f"},"listed_files":$files}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"commits":$commits,"rows_per_batch":$rowsPerBatch,""" +
      s""""wall_sec":${f"$wallOn%.1f"},""" +
      s""""live_files_max":${liveOn.max},""" +
      s""""live_files_last":${liveOn.last},""" +
      s""""live_files_every_25":${arr(
        liveOn.zipWithIndex.collect { case (v, i) if i % 25 == 0 => v })},""" +
      s""""plan_samples":$planStr,""" +
      s""""control_off_commits":${math.max(1, commits / 5)},""" +
      s""""control_off_live_files_last":${liveOff.last}}"""
    Files.createDirectories(Paths.get("target"))
    Files.write(Paths.get("target", "autocompactprobe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
