package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StatsManifest
import graft.streaming.{IterativeStream, Streams}

/** The streaming half of the lakehouse write path: micro-batches append
  * to a live parquet table whose stats manifest stays reconciled, so
  * readers get planning-time file pruning while ingest runs. Pins:
  * per-batch file pruning on the live table, replay replacement
  * refreshing (not reusing) stats, and the conservative no-manifest
  * window. */
class ManifestedTableStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("live table: each appended batch is prunable; readers see every row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_mtbl_").toString + "/t"
    val mem = MemoryStream[(Long, Long)]
    val q = Streams.appendToManifestedTable(spark,
      mem.toDF().toDF("k", "v"), dir, Seq("k"))
    try {
      // batch i carries k ∈ [i·1000, i·1000+999] — disjoint ranges, so a
      // low-k predicate must prune every later batch's files
      (0 until 4).foreach { i =>
        mem.addData((0 until 1000).map(j => ((i * 1000 + j).toLong, j.toLong)): _*)
        q.processAllAvailable()
      }
    } finally { q.stop(); q.awaitTermination() }

    // bare count() folds METADATA-ONLY from the live manifest — zero
    // scan tasks on an actively-ingesting table (ManifestMetadataOnly)
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.count() === 4000L)
    assert(idx.total.get() === -1L, "metadata-only count listed files")
    // an un-manifested-column filter forces the listing path: every row
    val (scanAll, idxAll) = StatsManifest.scanWithIndex(spark, dir)
    assert(scanAll.where(col("v") >= 0L).count() === 4000L)
    assert(idxAll.total.get() >= 4L)
    val (scan2, idx2) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan2.where(col("k") < 1000L).count() === 1000L)
    assert(idx2.selected.get() < idx2.total.get(),
      s"live table admitted ${idx2.selected.get()} of ${idx2.total.get()}")
  }

  test("a replayed batch's rewritten files get FRESH stats, not stale reuse") {
    val dir = Files.createTempDirectory("graft_mtbl2_").toString + "/t"
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    val staging = new Path(dir + ".staging")
    def append(batchId: Long, lo: Long, hi: Long): Unit = {
      val written = IterativeStream.writeFeedback(fs, dirPath, staging,
        batchId, (lo until hi).toDF("k").coalesce(1), prefix = "tb")
      StatsManifest.update(spark, dir, Seq("k"),
        invalidate = written.map(StatsManifest.fileKey).toSet)
    }
    append(0L, 0L, 1000L)
    append(1L, 5000L, 6000L)
    // "replay" of batch 1 lands DIFFERENT content under the same
    // deterministic name — without invalidation the manifest would keep
    // the 5000..5999 stats and a k<100 scan would wrongly skip the file
    append(1L, 0L, 100L)
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("k") < 100L).count() === 200L) // 100 + 100
    assert(idx.selected.get() === idx.total.get()) // both files now match
    val (scan2, idx2) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan2.where(col("k") >= 5000L).count() === 0L)
    assert(idx2.selected.get() === 0L) // and the stale range is GONE
  }

  test("no-manifest window: scan is unpruned but never wrong") {
    val dir = Files.createTempDirectory("graft_mtbl3_").toString + "/t"
    (0 until 500).map(_.toLong).toDF("k").coalesce(2).write.parquet(dir)
    // no manifest written at all
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("k") < 10L).count() === 10L)
    assert(idx.selected.get() === idx.total.get()) // conservative keep-all
  }
}
