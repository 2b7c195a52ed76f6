package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NearDupStream

/** Ingest-time near-dup filtering against the growing LSH index:
  * cross-batch and intra-batch duplicates drop, novel docs pass, the
  * index view is batch-scoped so micro-batch replay cannot see its own
  * half-written appendix. */
class NearDupStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while seven wizards brew strong potions under a pale moon tonight"

  test("cross-batch and intra-batch near-dups drop; novel docs pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_ndup_").toString
    val mem = MemoryStream[(Long, String)]
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val q = NearDupStream.nearDupFilter(spark,
      mem.toDF().toDF("doc_id", "text"), s"$root/idx",
      out = (df: DataFrame, _: Long) =>
        df.collect().foreach(r => emitted.add(r.getLong(0))))
    try {
      // batch 1: doc 1 (novel) + doc 2 = exact copy of doc 1 (intra-batch
      // dup — the smaller id survives) + doc 3 (novel, different text)
      mem.addData((1L, base), (2L, base),
        (3L, "completely different words speak of mountains rivers " +
          "and ancient cities beneath the burning desert sun today"))
      q.processAllAvailable()
      // batch 2: doc 4 = near-copy of doc 1 (one trailing word changed —
      // most shingles shared, some band collides) + doc 5 (novel)
      mem.addData((4L, base.replace("tonight", "tomorrow")),
        (5L, "unrelated text about spark catalyst planners folding " +
          "constants and pruning columns across deep query plans"))
      q.processAllAvailable()
      // batch 3: doc 6 = exact copy of doc 3 (cross-batch dup via index)
      mem.addData((6L, "completely different words speak of mountains " +
        "rivers and ancient cities beneath the burning desert sun today"))
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }
    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSet === Set(1L, 3L, 5L))
    // the index holds buckets for exactly the accepted docs
    val idx = spark.read.parquet(s"$root/idx")
    assert(idx.select("id").distinct().as[Long].collect().toSet
      === Set(1L, 3L, 5L))
  }

  test("short docs (no shingles) always pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_ndup2_").toString
    val mem = MemoryStream[(Long, String)]
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val q = NearDupStream.nearDupFilter(spark,
      mem.toDF().toDF("doc_id", "text"), s"$root/idx",
      out = (df: DataFrame, _: Long) =>
        df.collect().foreach(r => emitted.add(r.getLong(0))))
    try {
      mem.addData((1L, "too short"), (2L, "too short"))
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }
    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSet === Set(1L, 2L))
  }

  test("index view is batch-scoped and bucket-scoped: own appendix and untouched buckets invisible") {
    val root = Files.createTempDirectory("graft_ndup3_").toString
    val hconf = spark.sparkContext.hadoopConfiguration
    val idx = new org.apache.hadoop.fs.Path(s"$root/idx")
    val fs = idx.getFileSystem(hconf)
    // appendices of batches 3, 5, 7 in bucket 2; batch 3 also in bucket 9;
    // a foreign file that must be skipped, not parsed
    Seq((2, 3L), (2, 5L), (2, 7L), (9, 3L)).foreach { case (bk, b) =>
      val d = new org.apache.hadoop.fs.Path(idx, s"b=$bk")
      fs.mkdirs(d)
      fs.create(new org.apache.hadoop.fs.Path(d,
        f"fb-$b%012d-00000.parquet")).close()
    }
    fs.create(new org.apache.hadoop.fs.Path(idx,
      "b=2/fb-not-a-batch.parquet")).close()
    def visible(batch: Long, buckets: Int*): Set[(Int, Long)] =
      NearDupStream.indexFilesFor(fs, idx, batch,
          buckets.map(_ -> Array(0L)).toMap)
        .map { p =>
          (p.getParent.getName.stripPrefix("b=").toInt,
            p.getName.split("-")(1).toLong)
        }.toSet
    assert(visible(0L, 2, 9) === Set.empty)
    assert(visible(5L, 2, 9) === Set((2, 3L), (9, 3L))) // own batch excluded
    assert(visible(6L, 2) === Set((2, 3L), (2, 5L)))    // bucket 9 untouched
    assert(visible(99L, 2, 9) === Set((2, 3L), (2, 5L), (2, 7L), (9, 3L)))
    // compacted range files additionally prune on the batch's k1 values
    fs.create(new org.apache.hadoop.fs.Path(idx,
      "b=2/fbr-000000000001-50000-100-200.parquet")).close()
    val hit = NearDupStream.indexFilesFor(fs, idx, 99L,
      Map(2 -> Array(150L))).map(_.getName)
    assert(hit.exists(_.startsWith("fbr-")))
    val miss = NearDupStream.indexFilesFor(fs, idx, 99L,
      Map(2 -> Array(99L, 201L))).map(_.getName)
    assert(!miss.exists(_.startsWith("fbr-")))
  }

  test("compactIndex merges old appendices; filtering is unchanged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_ndup4_").toString
    val idxDir = s"$root/idx"
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // phase 1: three batches build a three-appendix index
    val mem = MemoryStream[(Long, String)]
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val out = (df: DataFrame, _: Long) =>
      df.collect().foreach(r => emitted.add(r.getLong(0)))
    val q = NearDupStream.nearDupFilter(spark,
      mem.toDF().toDF("doc_id", "text"), idxDir, out)
    try {
      mem.addData((1L, base)); q.processAllAvailable()
      mem.addData((2L, "completely different words speak of mountains " +
        "rivers and ancient cities beneath the burning desert sun today"))
      q.processAllAvailable()
      mem.addData((3L, "unrelated text about spark catalyst planners " +
        "folding constants and pruning columns across deep query plans"))
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }

    def files = Option(fs.globStatus(new org.apache.hadoop.fs.Path(
        idxDir, "b=*/*.parquet"))).getOrElse(Array.empty)
      .map(_.getPath.getName).sorted.toSeq
    // band rows only (drop the b partition column the reader infers —
    // compaction re-derives it, so only the data columns must survive)
    def rows = spark.read.parquet(idxDir)
      .select("id", "band", "k1", "k2").collect().map(_.toSeq).toSet
    val before = rows
    assert(files.size >= 3)

    // compact everything below the last committed batch (= 2): batches
    // 0 and 1 merge into k1-range files at batch id 1, slot 50000+
    NearDupStream.compactIndex(spark, idxDir, upToBatchId = 2L)
    val after = files
    assert(after.exists(_.matches("fbr-000000000001-5\\d{4}-\\d+-\\d+\\.parquet")),
      after.mkString(","))
    assert(!after.exists(_.matches("fb-000000000000-.*")))
    // bucket rows survive compaction exactly
    assert(rows === before)
    // re-compaction over a previous compaction's output: fresh slots,
    // no collision, still lossless
    NearDupStream.compactIndex(spark, idxDir, upToBatchId = 3L)
    assert(rows === before)

    // phase 2: a NEW query (fresh checkpoint, batch ids restart at 0)
    // adopts the compacted index via the floor offset — doc 4 ≈ doc 1
    // from the compacted appendix still drops, novel doc 5 passes
    val floor = NearDupStream.nextFloor(spark, idxDir)
    assert(floor === 3L) // compaction left ids ≤ 2
    val mem2 = MemoryStream[(Long, String)]
    val q2 = NearDupStream.nearDupFilter(spark,
      mem2.toDF().toDF("doc_id", "text"), idxDir, out,
      floorBatchId = floor)
    try {
      mem2.addData((4L, base.replace("tonight", "tomorrow")),
        (5L, "genuinely novel content listing tides harbors and the " +
          "slow migration of seabirds across a winter archipelago"))
      q2.processAllAvailable()
    } finally { q2.stop(); q2.awaitTermination() }
    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSet === Set(1L, 2L, 3L, 5L))
    // and doc 5's appendix landed above the floor, colliding with nothing
    assert(files.exists(_.startsWith("fb-000000000003-")))
  }

  test("inline compaction (compactEvery) bounds the file count on a " +
      "long-running ingest and leaves filtering semantics unchanged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_ndup6_").toString
    val idxDir = s"$root/idx"
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mem = MemoryStream[(Long, String)]
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val out = (df: DataFrame, _: Long) =>
      df.collect().foreach(r => emitted.add(r.getLong(0)))
    val q = NearDupStream.exactDupFilter(spark,
      mem.toDF().toDF("doc_id", "text"), idxDir, out,
      compactEvery = 2)
    try {
      // 6 batches: every even raw batch id (2, 4) compacts first
      for (i <- 1 to 6) {
        mem.addData((i.toLong, s"document number $i unique text"))
        q.processAllAvailable()
      }
      // a late duplicate of batch 1's doc must still drop — the index
      // rows survived two inline compactions
      mem.addData((100L, "document number 1 unique text"))
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }
    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSet === (1L to 6L).toSet,
      "all six novel docs pass, the late duplicate drops")
    val names = Option(fs.globStatus(new org.apache.hadoop.fs.Path(
        idxDir, "b=*/*.parquet"))).getOrElse(Array.empty)
      .map(_.getPath.getName).toSeq
    // batches 0-3 folded into range files by the batch-4 compaction;
    // appendices 4-6 remain — the steady-state shape: O(compactEvery)
    // appendix files + O(buckets) range files, however long the run
    assert(names.exists(_.startsWith("fbr-")), names.mkString(","))
    assert(!names.exists(_.startsWith("fb-000000000000-")),
      names.mkString(","))
    assert(!names.exists(_.startsWith("fb-000000000001-")),
      names.mkString(","))
  }

  test("nearDupFilter reads only touched buckets, never the whole index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_ndup5_").toString
    val mem = MemoryStream[(Long, String)]
    val stats =
      new java.util.concurrent.ConcurrentLinkedQueue[
        NearDupStream.IndexReadStats]
    val q = NearDupStream.nearDupFilter(spark,
      mem.toDF().toDF("doc_id", "text"), s"$root/idx",
      out = (_: DataFrame, _: Long) => (),
      numBuckets = 64, onReadStats = stats.add(_))
    try {
      // 5 batches of genuinely distinct docs (disjoint shingles — a
      // shared-suffix variant would near-dup-drop and write nothing):
      // the index grows; each batch's 1 doc has 4 band rows → ≤ 4
      // touched buckets of 64
      (1 to 5).foreach { i =>
        val words = (0 until 20)
          .map(j => s"w${i}x${j}t${(i * 31 + j * 17) % 997}")
        mem.addData((i.toLong, words.mkString(" ")))
        q.processAllAvailable()
      }
    } finally { q.stop(); q.awaitTermination() }
    import scala.jdk.CollectionConverters._
    val perBatch = stats.asScala.toSeq.sortBy(_.batchId)
    assert(perBatch.nonEmpty)
    assert(perBatch.forall(_.bucketsTouched <= 4))
    // total index files by batch 5 ≈ 4 buckets × 4 batches, but each
    // batch listed at most its own buckets' files
    val totalFiles = Option(new org.apache.hadoop.fs.Path(s"$root/idx")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .globStatus(new org.apache.hadoop.fs.Path(s"$root/idx",
          "b=*/*.parquet"))).getOrElse(Array.empty).length
    assert(totalFiles > 4)
    assert(perBatch.last.filesRead < totalFiles,
      s"last batch read ${perBatch.last.filesRead} of $totalFiles files")
  }

  test("minhash bands agree with the batch query's kernel on identical text") {
    // identical texts ⇒ identical signatures ⇒ all 4 band keys equal;
    // a one-word change shares ≥1 band (that is what makes doc 4 drop
    // in the first test) — pin both properties directly
    val docs = Seq((10L, base), (11L, base),
      (12L, base.replace("tonight", "tomorrow"))).toDF("doc_id", "text")
    val bands = NearDupStream.minhashBands(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
    val by = bands.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(by(10L) === by(11L))
    assert(by(10L).intersect(by(12L)).nonEmpty)
    assert(by(10L) !== by(12L))
  }
}
