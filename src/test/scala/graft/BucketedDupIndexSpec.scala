package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NearDupStream

/** The bucket-partitioned dedup index's SCALE contract (VERDICT r8 →
  * r9 #2): per-batch index reads must stay roughly FLAT while the index
  * grows 10×. Mechanism under test: bucket-dir pruning (a probe lists
  * only the `b=` dirs its bands hash to) × compacted k1-RANGE files of
  * fixed target size (a probe's k1 values intersect O(K) of them however
  * many exist). Everything here is deterministic — file counts and byte
  * sums, no timing. */
class BucketedDupIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val B = 8

  /** Synthetic band rows i ∈ [lo, hi): 4 bands, well-spread k1. */
  private def bands(lo: Int, hi: Int) = (lo until hi).map { i =>
    (i.toLong, i % 4, (i * 2654435761L) & 0xFFFFFFFFL, i.toLong)
  }.toDF("id", "band", "k1", "k2")
    .withColumn("b", NearDupStream.bucketCol(B))

  test("per-batch index bytes stay ~flat across 10x index growth; pruning is exact") {
    val root = Files.createTempDirectory("graft_bidx_").toString
    val idxDir = s"$root/idx"
    val idxPath = new Path(idxDir)
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(idxPath)
    val staging = new Path(idxDir + ".staging")

    def totalBytes: Long = Option(fs.globStatus(
        new Path(idxPath, "b=*/*.parquet"))).getOrElse(Array.empty)
      .map(_.getLen).sum

    // the probe: 8 keys that exist from the FIRST 4k rows (so the same
    // probe is meaningful against both index sizes), mapped to their
    // buckets exactly as the filter does
    val probe = bands(0, 4000).where(col("id") % 500 === 10)
    val touched = probe.select(col("b"), col("k1")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    assert(touched.values.map(_.length).sum === 8)

    def probeRead(atBatch: Long): (Int, Long) = {
      val files = NearDupStream.indexFilesFor(fs, idxPath, atBatch, touched)
      (files.size, files.map(p => fs.getFileStatus(p).getLen).sum)
    }
    def matchSet(files: Seq[Path]): Set[Long] =
      if (files.isEmpty) Set.empty
      else probe.join(
        spark.read.schema("id LONG, band INT, k1 BIGINT, k2 BIGINT")
          .parquet(files.map(_.toString): _*),
        Seq("band", "k1", "k2"), "left_semi")
        .select("id").as[Long].collect().toSet

    // ---- 1× index: 4k rows over 2 batches, compacted to ~500-row files
    NearDupStream.writeAppendix(fs, idxPath, staging, 0L, bands(0, 2000))
    NearDupStream.writeAppendix(fs, idxPath, staging, 1L, bands(2000, 4000))
    NearDupStream.compactIndex(spark, idxDir, upToBatchId = 2L,
      numBuckets = B, targetRowsPerFile = 500L)
    val bytes1 = totalBytes
    val (files1, probeBytes1) = probeRead(100L)
    val expectedMatches = matchSet(
      Option(fs.globStatus(new Path(idxPath, "b=*/*.parquet")))
        .getOrElse(Array.empty).map(_.getPath).toSeq)
    assert(matchSet(NearDupStream.indexFilesFor(fs, idxPath, 100L, touched))
      === expectedMatches) // pruned read finds every match the full read does
    assert(expectedMatches === probe.select("id").as[Long].collect().toSet)

    // ---- 10× index: 36k more rows, recompacted at the same target size
    NearDupStream.writeAppendix(fs, idxPath, staging, 2L, bands(4000, 22000))
    NearDupStream.writeAppendix(fs, idxPath, staging, 3L, bands(22000, 40000))
    NearDupStream.compactIndex(spark, idxDir, upToBatchId = 4L,
      numBuckets = B, targetRowsPerFile = 500L)
    val bytes10 = totalBytes
    val (files10, probeBytes10) = probeRead(100L)
    assert(matchSet(NearDupStream.indexFilesFor(fs, idxPath, 100L, touched))
      === expectedMatches) // still exact after growth + recompaction

    // the index grew ~10×…
    assert(bytes10 > 5L * bytes1, s"index bytes $bytes1 -> $bytes10")
    // …but the probe's read stayed bounded by ITS OWN key count, not the
    // index: ≤ K files of fixed target size, ≤ 2× the 1× read
    assert(files10 <= 2 * touched.values.map(_.length).sum,
      s"probe read $files10 files")
    assert(probeBytes10 < 2L * probeBytes1,
      s"probe bytes $probeBytes1 -> $probeBytes10 while index " +
        s"grew $bytes1 -> $bytes10")
  }

  test("appendix replay replaces across all buckets; compaction keeps rows minimal") {
    val root = Files.createTempDirectory("graft_bidx2_").toString
    val idxPath = new Path(s"$root/idx")
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(idxPath)
    val staging = new Path(s"$root/idx.staging")

    // original attempt of batch 0 touches many buckets…
    NearDupStream.writeAppendix(fs, idxPath, staging, 0L, bands(0, 1000))
    // …the replay converges smaller (fewer rows, fewer buckets): every
    // stale file of the failed attempt must vanish, in every bucket
    NearDupStream.writeAppendix(fs, idxPath, staging, 0L, bands(0, 10))
    val rows = spark.read.parquet(s"$root/idx")
      .select("id").as[Long].collect().toSet
    assert(rows === (0L until 10L).toSet)

    // a replay that converges EMPTY retracts everything
    NearDupStream.writeAppendix(fs, idxPath, staging, 0L,
      bands(0, 10).where(lit(false)))
    assert(Option(fs.globStatus(new Path(idxPath, "b=*/*.parquet")))
      .getOrElse(Array.empty).isEmpty)
  }
}
