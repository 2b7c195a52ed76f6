package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{RowOps, StatsManifest}

/** Measures the round-11b catch-up story end to end: a version-offset
  * stream pointed at a LONG backlog must (a) drain it in bounded,
  * rate-limited batches rather than one giant one, and (b) plan each
  * batch at O(delta) — the per-batch planning cost must not grow with
  * the backlog's length or the table's total size.
  *
  *   sbt "runMain graft.tools.CatchupProbe [versions] [rowsPerCommit]"
  *
  * Builds a fresh manifested table with `versions` streaming-shaped
  * commits (default 120 × 2,000 rows: appends with a row-op every
  * 10th commit, the mix a CDC-fed table sees), then drains it twice
  * with Trigger.AvailableNow:
  *
  *   - the TABLE stream (`ignoreChanges=true`) under
  *     `maxFilesPerTrigger=4`
  *   - the CDC stream (`readChangeFeed=true`) under the same cap
  *
  * recording batch count, rows, wall seconds, and per-batch wall ms
  * (p50/max — the planning + execution cost of a bounded batch).
  * Writes one JSON line to stdout and `target/catchupprobe.json`.
  * Compare p50 batch time of the FIRST third vs the LAST third of the
  * drain: flat = planning does not accumulate with progress. */
object CatchupProbe {

  def main(args: Array[String]): Unit = {
    val versions = args.headOption.map(_.toInt).getOrElse(120)
    val rowsPerCommit = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("graft_catchup").toString
    val dir = root + "/t"

    // ---- build the backlog: streaming-shaped commits ----
    val tBuild = System.nanoTime()
    (0 until rowsPerCommit).map(i => (i.toLong, 0L)).toDF("k", "m")
      .coalesce(1).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    var nextK = rowsPerCommit.toLong
    (2 to versions).foreach { v =>
      if (v % 10 == 0)
        RowOps.delete(spark, dir, col("k") < nextK - (rowsPerCommit * 9L),
          Seq("k"))
      else {
        (0 until rowsPerCommit).map(i => (nextK + i, v.toLong))
          .toDF("k", "m").coalesce(1).write.mode("append").parquet(dir)
        StatsManifest.update(spark, dir, Seq("k"))
        nextK += rowsPerCommit
      }
    }
    val buildSec = (System.nanoTime() - tBuild) / 1e9
    val latest = StatsManifest.latestVersion(spark, dir).get

    // ---- drain with AvailableNow under a file cap ----
    def drain(opts: Map[String, String]): (Long, Long, Double,
        Seq[Double]) = {
      // batch time = gap between consecutive sink entries, so each
      // sample includes the NEXT batch's offset resolution + split
      // planning, not just its execution — planning cost is the thing
      // under test
      val entries = new java.util.concurrent.ConcurrentLinkedQueue[Long]
      val rows = new java.util.concurrent.atomic.AtomicLong
      var r = spark.readStream.format("graft-manifest-stream")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val t0 = System.nanoTime()
      val q = r.load(dir).writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          entries.add(System.nanoTime())
          rows.addAndGet(df.count()); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      import scala.jdk.CollectionConverters._
      val ts = (t0 +: entries.asScala.toSeq :+ System.nanoTime())
      val ms = ts.sliding(2).map { case Seq(a, b) => (b - a) / 1e6 }.toSeq
      (math.max(0L, ts.length - 2L), rows.get(),
        (System.nanoTime() - t0) / 1e9, ms)
    }

    def stats(ms: Seq[Double]): (Double, Double, Double, Double) = {
      val s = ms.sorted
      def p50(xs: Seq[Double]) =
        if (xs.isEmpty) 0.0 else xs.sorted.apply(xs.length / 2)
      val third = math.max(1, ms.length / 3)
      (p50(s), if (s.isEmpty) 0.0 else s.last,
        p50(ms.take(third)), p50(ms.takeRight(third)))
    }

    val (tb, tr, ts, tms) = drain(Map(
      "ignoreChanges" -> "true", "maxFilesPerTrigger" -> "4"))
    val (tp50, tmax, tEarly, tLate) = stats(tms)
    val (cb, cr, cs, cms) = drain(Map(
      "readChangeFeed" -> "true", "maxFilesPerTrigger" -> "4"))
    val (cp50, cmax, cEarly, cLate) = stats(cms)

    val json =
      s"""{"versions":$latest,"rows_per_commit":$rowsPerCommit,""" +
      s""""build_sec":${f"$buildSec%.1f"},""" +
      s""""table_stream":{"batches":$tb,"rows":$tr,""" +
      s""""wall_sec":${f"$ts%.1f"},"batch_ms_p50":${f"$tp50%.0f"},""" +
      s""""batch_ms_max":${f"$tmax%.0f"},""" +
      s""""batch_ms_p50_first_third":${f"$tEarly%.0f"},""" +
      s""""batch_ms_p50_last_third":${f"$tLate%.0f"}},""" +
      s""""cdc_stream":{"batches":$cb,"rows":$cr,""" +
      s""""wall_sec":${f"$cs%.1f"},"batch_ms_p50":${f"$cp50%.0f"},""" +
      s""""batch_ms_max":${f"$cmax%.0f"},""" +
      s""""batch_ms_p50_first_third":${f"$cEarly%.0f"},""" +
      s""""batch_ms_p50_last_third":${f"$cLate%.0f"}}}"""
    Files.createDirectories(Paths.get("target"))
    Files.write(Paths.get("target", "catchupprobe.json"),
      json.getBytes("UTF-8"))
    // scalastyle:off println
    println(json)
    // scalastyle:on println
    spark.stop()
  }
}
