package graft.tools

import java.nio.file.Paths

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.streaming.NearDupStream

/** Dev instrument for the streaming dedup ingest filter (VERDICT r9
  * next-round #2): run `exactDupFilter` on the rate source at the
  * StreamBench setting and print the per-batch PHASE split
  * (banding/collect, bucket listing, index semi-join, emission, appendix
  * write) from `IndexReadStats`, plus the achieved rows/s — so a
  * throughput regression names the phase that moved instead of a single
  * opaque number. `sbt "runMain graft.tools.DupFilterProbe [durSec]"`. */
object DupFilterProbe {
  def main(args: Array[String]): Unit = {
    val durSec = args.headOption.map(_.toInt).getOrElse(20)
    val compactEvery = args.lift(1).map(_.toInt).getOrElse(0)
    val numBuckets = args.lift(2).map(_.toInt).getOrElse(64)
    val rate = args.lift(3).map(_.toInt).getOrElse(20000)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val base = Paths.get("target", "dupfilterprobe").toAbsolutePath
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(base.toFile)
    val idxDir = base.resolve("idx").toString
    val cpDir = base.resolve("cp").toString
    val stats = ArrayBuffer.empty[NearDupStream.IndexReadStats]
    val docs = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      .option("numPartitions", 8).load()
      .select(col("value").as("doc_id"),
        format_string("alpha%d beta%d gamma%d delta%d",
          col("value"), col("value") * 7, col("value") * 13,
          col("value") * 31).as("text"))
    val q = NearDupStream.exactDupFilter(spark, docs, idxDir,
      out = (df, _) => df.write.format("noop").mode("overwrite").save(),
      triggerMs = 500L,
      checkpointDir = Some(cpDir),
      numBuckets = numBuckets,
      onReadStats = s => stats.synchronized { stats += s },
      compactEvery = compactEvery)
    Thread.sleep(durSec * 1000L)
    q.stop(); q.awaitTermination()
    val steady = q.recentProgress.filter(p =>
      p.batchId >= 2 && p.numInputRows > 0)
    val rows = steady.map(_.numInputRows).sum
    val execMs = steady.map(_.durationMs.asScala
      .getOrElse("triggerExecution", java.lang.Long.valueOf(0L)).longValue)
    val rps = rows.toDouble / math.max(execMs.sum, 1L) * 1000.0
    def med(xs: Seq[Long]): Long =
      if (xs.isEmpty) -1 else xs.sorted.apply(xs.length / 2)
    val st = stats.synchronized { stats.toVector }.filter(_.batchId >= 2)
    val phases = Seq(
      "band" -> st.map(_.bandMs), "list" -> st.map(_.listMs),
      "dedup" -> st.map(_.dedupMs), "emit" -> st.map(_.emitMs),
      "append" -> st.map(_.appendMs))
    val ph = phases.map { case (n, v) =>
      s""""$n":{"p50":${med(v)},"max":${if (v.isEmpty) -1 else v.max}}"""
    }.mkString(",")
    val files = st.map(_.filesRead)
    println(
      s"""{"probe":"dedup_index_filter","rows_per_sec":${f"$rps%.0f"},""" +
      s""""batches":${steady.length},"batch_ms_p50":${med(execMs.toSeq)},""" +
      s""""files_read_last":${files.lastOption.getOrElse(-1)},""" +
      s""""phases_ms":{$ph}}""")
    spark.stop()
  }
}
