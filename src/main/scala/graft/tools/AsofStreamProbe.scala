package graft.tools

import java.lang.management.ManagementFactory

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.GraftSession
import graft.streaming.Streams

/** Matched-load A/B for the STREAMING as-of join (VERDICT r9 what's-
  * wrong #3 / next-round #6): the per-round bench measured the HDFS-
  * provider asof op at 297k (r8) then 210k (r9) rows/s while its
  * RocksDB twin moved the opposite way — a pattern that reads as
  * cross-session scheduling noise at 2-batch sample sizes. This probe
  * is the streaming analogue of `QueryProbe`: the SAME op body as
  * StreamBench's `asof_join`, run `reps` times back-to-back in one JVM
  * with per-run system load recorded, so the run-to-run spread under
  * matched conditions is measurable. If the spread covers the r8→r9
  * move, the move was environment, not code.
  * `sbt "runMain graft.tools.AsofStreamProbe [reps] [durSec]"` →
  * target/asofprobe.json. */
object AsofStreamProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val durSec = args.lift(1).map(_.toInt).getOrElse(12)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val os = ManagementFactory.getOperatingSystemMXBean

    def rateEvents() = {
      val v = col("value")
      spark.readStream.format("rate")
        .option("rowsPerSecond", 100000)
        .option("numPartitions", 8).load()
        .select(v.as("event_id"), col("timestamp").as("ts"),
          (v % 8192).as("user_id"),
          (v % 97).cast("double").as("value"))
    }

    val runs = (0 until reps).map { i =>
      val cp = java.nio.file.Files
        .createTempDirectory(s"graft_asofprobe_$i").toString
      val load0 = os.getSystemLoadAverage
      val ev = rateEvents()
      val q = Streams.asofJoinStream(
        ev.where(col("event_id") % 2 === 0),
        ev.where(col("event_id") % 2 === 1),
        "user_id", "ts", "event_id", "value")
        .writeStream.format("noop").outputMode("append")
        .trigger(Trigger.ProcessingTime(500L))
        .option("checkpointLocation", cp).start()
      Thread.sleep(durSec * 1000L)
      q.stop(); q.awaitTermination()
      val steady = q.recentProgress.filter(p =>
        p.batchId >= 2 && p.numInputRows > 0)
      val rows = steady.map(_.numInputRows).sum
      val execMs = steady.map(_.durationMs.asScala
        .getOrElse("triggerExecution", java.lang.Long.valueOf(0L))
        .longValue).sum
      val rps = rows.toDouble / math.max(execMs, 1L) * 1000.0
      (rps, load0, steady.length)
    }
    val rps = runs.map(_._1)
    val line =
      s"""{"probe":"asof_join_stream","reps":$reps,"dur_sec":$durSec,""" +
      s""""rows_per_sec":[${rps.map(r => f"$r%.0f").mkString(",")}],""" +
      s""""min":${f"${rps.min}%.0f"},"max":${f"${rps.max}%.0f"},""" +
      s""""spread_pct":${f"${(rps.max - rps.min) / rps.min * 100}%.0f"},""" +
      s""""load_at_start":[${runs.map(r => f"${r._2}%.1f").mkString(",")}],""" +
      s""""batches":[${runs.map(_._3).mkString(",")}]}"""
    val out = new java.io.File("target/asofprobe.json")
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(line) finally w.close()
    println(line)
    spark.stop()
  }
}
