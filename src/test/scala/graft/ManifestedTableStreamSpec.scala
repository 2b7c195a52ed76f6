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

  test("TABLE PROPERTY drives the sink's auto-compaction policy and " +
      "beats the session conf (r13: per-table tuning at 100 TB)") {
    val dir = Files.createTempDirectory("graft_mtbl_acp_").toString + "/t"
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    val staging = new Path(dir + ".staging")
    // session conf says DISABLED; the table's own property says 8 —
    // the property must win (policy: prop > conf > default)
    spark.conf.set("spark.graft.autoCompact.minFiles", "0")
    try {
      (0 until 60).foreach { i =>
        val batch = (0 until 20)
          .map(j => (i.toLong * 20 + j, j.toLong)).toDF("k", "v")
          .coalesce(1)
        Streams.appendCommitToManifestedTable(fs, dirPath, staging, dir,
          i.toLong, batch, Seq("k"), manifestVersionsToKeep = 16)
        if (i == 4) // property lands AFTER the table exists (ALTER-time)
          StatsManifest.writeTableProps(spark, dir,
            StatsManifest.tableProps(spark, dir) +
              ("autoCompact.minFiles" -> "8"))
      }
    } finally spark.conf.unset("spark.graft.autoCompact.minFiles")
    val live = StatsManifest.read(spark, dir).size
    assert(live <= 12, s"table-property policy did not fire: $live " +
      "live files (conf said disabled, property said 8)")
    assert(StatsManifest.scan(spark, dir).count() === 1200L)
    assert(StatsManifest.scan(spark, dir)
      .select("k").distinct().count() === 1200L)
    // retention.versions property bounds the version window too
    StatsManifest.writeTableProps(spark, dir,
      StatsManifest.tableProps(spark, dir) + ("retention.versions" -> "6"))
    (60 until 80).foreach { i =>
      val batch = (0 until 20)
        .map(j => (i.toLong * 20 + j, j.toLong)).toDF("k", "v")
        .coalesce(1)
      Streams.appendCommitToManifestedTable(fs, dirPath, staging, dir,
        i.toLong, batch, Seq("k"), manifestVersionsToKeep = 64)
    }
    // lazy expire overshoots by at most the checkpoint interval (16)
    assert(StatsManifest.versions(spark, dir).length <= 6 + 16,
      s"retention.versions property ignored: " +
        s"${StatsManifest.versions(spark, dir).length} versions kept")
    assert(StatsManifest.scan(spark, dir).count() === 1600L)
  }

  test("auto-compaction keeps a 500-commit append stream BOUNDED: live " +
      "file count, scan task count and row totals stay flat forever") {
    val dir = Files.createTempDirectory("graft_mtbl_ac_").toString + "/t"
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    val staging = new Path(dir + ".staging")
    val commits = 500
    val rowsPerBatch = 20
    spark.conf.set("spark.graft.autoCompact.minFiles", "8")
    var liveMax = 0
    try {
      (0 until commits).foreach { i =>
        val batch = (0 until rowsPerBatch)
          .map(j => (i.toLong * rowsPerBatch + j, j.toLong)).toDF("k", "v")
          .coalesce(1) // one file per commit — the steady sink shape
        // the EXACT sink code path (writer loop extracted for the spec)
        Streams.appendCommitToManifestedTable(fs, dirPath, staging, dir,
          i.toLong, batch, Seq("k"), manifestVersionsToKeep = 16)
        if (i % 10 == 9)
          liveMax = math.max(liveMax,
            StatsManifest.read(spark, dir).size)
      }
    } finally spark.conf.unset("spark.graft.autoCompact.minFiles")
    // bounded, not merely "small": the policy packs whenever 8+ live
    // sub-target files accumulate, so the live set can never exceed
    // minFiles + the packed tail + the excluded current batch
    val live = StatsManifest.read(spark, dir).size
    assert(liveMax <= 12, s"live file count grew to $liveMax")
    assert(live <= 12, s"final live file count $live")
    // a reader schedules tasks for exactly the live set
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("v") >= 0L).count() ===
      commits.toLong * rowsPerBatch)
    assert(idx.total.get() <= 12,
      s"scan listed ${idx.total.get()} files")
    // every row exactly once across 60+ compactions
    val (scan2, _) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan2.select("k").distinct().count() ===
      commits.toLong * rowsPerBatch)
    // a LIVE version-offset stream survives auto-compaction: the
    // net-zero 'optimize' commits (tombstones + packed adds) are
    // skipped — not a "table is not append-only" failure, and never a
    // duplicate re-emit of carried rows
    val sink = "mtbl_ac_sink"
    val fromV = StatsManifest.latestVersion(spark, dir).get + 1L
    val q = spark.readStream.format("graft-manifest-stream")
      .option("startingVersion", fromV.toString)
      .load(dir).writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      spark.conf.set("spark.graft.autoCompact.minFiles", "8")
      try {
        (commits until commits + 30).foreach { i =>
          val batch = (0 until rowsPerBatch)
            .map(j => (i.toLong * rowsPerBatch + j, j.toLong))
            .toDF("k", "v")
          Streams.appendCommitToManifestedTable(fs, dirPath, staging,
            dir, i.toLong, batch, Seq("k"), manifestVersionsToKeep = 16)
        }
      } finally spark.conf.unset("spark.graft.autoCompact.minFiles")
      q.processAllAvailable()
      assert(spark.table(sink).count() === 30L * rowsPerBatch,
        "each appended row exactly once — compaction rewrites skipped")
      assert(spark.table(sink).select("k").distinct().count() ===
        30L * rowsPerBatch)
    } finally { q.stop(); q.awaitTermination() }
  }
}
