package graft.tools

import java.nio.file.Paths

import org.apache.spark.sql.functions._

/** Phase attribution for the streaming CDC-apply sink (VERDICT r10 ask
  * #4): run the bench's exact op — a keyed changelog merged into a
  * manifested table per micro-batch — and split every batch's wall time
  * into the row-op phases ([[graft.sources.RowOps.PhaseStats]]): open
  * (snapshot resolution), find (touch detection + insert
  * determination), stage (replacement write), commit (stats scan +
  * manifest commit + renames), cdc (netting + change-file write).
  *
  *   sbt "runMain graft.tools.CdcApplyProbe [durSec] [rate]"
  *
  * Prints one JSON line and writes target/cdcapplyprobe.json. */
object CdcApplyProbe {

  def main(args: Array[String]): Unit = {
    val durSec = args.headOption.map(_.toInt).getOrElse(45)
    val rate = args.lift(1).map(_.toLong).getOrElse(20000L)
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    val tblDir = {
      val p = Paths.get("target", "cdcapplyprobe", "t").toAbsolutePath
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(p.getParent.toFile)
      p.toString
    }
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Long, Long, Long, Long)]()
    import graft.sources.RowOps.PhaseStats
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryProgressEvent): Unit = {
          val trig = Option(e.progress.durationMs
            .get("triggerExecution")).map(_.longValue).getOrElse(-1L)
          samples.add((PhaseStats.open.get, PhaseStats.find.get,
            PhaseStats.stage.get, PhaseStats.commit.get,
            PhaseStats.cdc.get, trig))
        }
      })

    val changes = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      .option("numPartitions", 8).load()
      .select(pmod(col("value") * 2654435761L, lit(50000L)).as("k"),
        col("value").as("v"),
        col("value").as("seq"),
        (pmod(col("value"), lit(97L)) === 0L).as("del"))
    val q = graft.streaming.Streams.upsertToManifestedTable(spark,
      changes, tblDir, keys = Seq("k"), seqCol = "seq",
      statsCols = Seq("k"), deleteCol = Some("del"), triggerMs = 500L,
      checkpointDir = None)
    Thread.sleep(durSec * 1000L)
    q.stop(); q.awaitTermination()

    import scala.jdk.CollectionConverters._
    val all = samples.asScala.toSeq.drop(2) // warmup batches out
    require(all.nonEmpty, "cdcapplyprobe: no steady batches sampled")
    def med(xs: Seq[Long]): Long = { val s = xs.sorted; s(s.length / 2) }
    val fields = Seq("open_ms", "find_ms", "stage_ms", "commit_ms",
      "cdc_ms", "batch_ms")
    val meds = Seq(med(all.map(_._1)), med(all.map(_._2)),
      med(all.map(_._3)), med(all.map(_._4)), med(all.map(_._5)),
      med(all.map(_._6)))
    val line = s"""{"rate":$rate,"batches":${all.length},""" +
      fields.zip(meds).map { case (f, v) => s""""$f":$v""" }
        .mkString(",") +
      s""","batch_ms_max":${all.map(_._6).max}}"""
    val out = new java.io.File("target/cdcapplyprobe.json")
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(line) finally w.close()
    println(line)
    spark.stop()
  }
}
