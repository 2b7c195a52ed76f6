package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RowOps, StatsManifest}

/** Streaming READ of a manifested table with manifest-version offsets
  * (`graft-manifest-stream`): each micro-batch is exactly the files
  * added between two versions, replay is deterministic because the
  * version log is immutable, a mutating range fails loudly toward the
  * CDC feed, and Hive-partition columns synthesize like the batch
  * scan. */
class ManifestStreamSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private var n = 0
  private def mk(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mstream").toString + "/t"
    (0 until 100).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "m")
      .coalesce(2).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    dir
  }

  private def startInto(dir: String,
      extra: Map[String, String] = Map.empty): (String,
      org.apache.spark.sql.streaming.StreamingQuery) = {
    n += 1
    val name = s"mstream_sink_$n"
    var r = spark.readStream.format("graft-manifest-stream")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load(dir).writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    (name, q)
  }

  private def append(dir: String, lo: Long, hi: Long): Unit = {
    (lo until hi).map(i => (i, -1L)).toDF("k", "m")
      .coalesce(1).write.mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k"))
  }

  test("full history then incremental appends, one version per batch " +
      "window; counts are exact (no re-reads)") {
    val dir = mk()
    val (sink, q) = startInto(dir)
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 100L)
      append(dir, 1000L, 1100L) // v2
      q.processAllAvailable()
      assert(spark.table(sink).count() === 200L)
      assert(spark.table(sink).where(col("k") >= 1000L).count() === 100L)
      // two more versions land between triggers: both arrive, once
      append(dir, 2000L, 2050L) // v3
      append(dir, 3000L, 3050L) // v4
      q.processAllAvailable()
      assert(spark.table(sink).count() === 300L)
      assert(spark.table(sink).select("k").distinct().count() === 300L)
    } finally { q.stop(); q.awaitTermination() }
  }

  test("startingVersion skips history; a row-op range fails toward " +
      "CDC; ignoreChanges streams the added files") {
    val dir = mk()
    append(dir, 1000L, 1050L) // v2
    val (sink, q) = startInto(dir, Map("startingVersion" -> "2"))
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 50L,
        "startingVersion=2 must deliver only v2's files")
    } finally { q.stop(); q.awaitTermination() }
    // a DELETE makes the next range non-append-only
    RowOps.delete(spark, dir, col("k") < 10, Seq("k")) // v3
    val (_, q2) = startInto(dir, Map("startingVersion" -> "3"))
    val e = intercept[Exception] {
      SparkFixture.quietExpectedStreamFailures {
        try q2.processAllAvailable()
        finally { q2.stop(); q2.awaitTermination() }
      }
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("changesStream")), msgs(e).mkString)
    // ignoreChanges: the rewrite's replacement files stream in
    val (sink3, q3) = startInto(dir,
      Map("startingVersion" -> "3", "ignoreChanges" -> "true"))
    try {
      q3.processAllAvailable()
      // v3 added the rewritten copies of the touched files (carried
      // rows re-emit — the documented caveat)
      assert(spark.table(sink3).count() > 0L)
      assert(spark.table(sink3).where(col("k") < 10).count() === 0L,
        "deleted rows must not re-emit")
    } finally { q3.stop(); q3.awaitTermination() }
  }

  test("exactly-once across restart: the checkpointed version offset " +
      "resumes without re-reading") {
    val dir = mk()
    val cp = java.nio.file.Files
      .createTempDirectory("graft_mstream_cp").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    def start() = spark.readStream.format("graft-manifest-stream")
      .load(dir).writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("k").collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .option("checkpointLocation", cp).outputMode("append").start()
    val q = start()
    try { q.processAllAvailable() } finally {
      q.stop(); q.awaitTermination()
    }
    assert(got.size === 100)
    append(dir, 1000L, 1020L) // v2 while the stream is DOWN
    val q2 = start()
    try {
      q2.processAllAvailable()
      // only the versions AFTER the checkpointed offset deliver
      assert(got.size === 120,
        "v1's files must not re-deliver after restart")
      import scala.jdk.CollectionConverters._
      assert(got.asScala.count(_ >= 1000L) === 20)
    } finally { q2.stop(); q2.awaitTermination() }
  }

  test("Hive-partitioned table: partition columns synthesize from the " +
      "file paths, typed") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mstream_part").toString + "/t"
    (0 until 300).map(i => (i % 3, i.toLong, (i % 7).toLong))
      .toDF("p", "k", "m")
      .repartitionByRange(3, col("p"))
      .write.partitionBy("p").parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    val (sink, q) = startInto(dir)
    try {
      q.processAllAvailable()
      val t = spark.table(sink)
      assert(t.count() === 300L)
      assert(t.schema("p").dataType ===
        org.apache.spark.sql.types.IntegerType)
      assert(t.groupBy("p").count().orderBy("p")
        .as[(Int, Long)].collect() ===
        Array((0, 100L), (1, 100L), (2, 100L)))
    } finally { q.stop(); q.awaitTermination() }
  }

  test("filter pushdown prunes whole ADDED files per batch by manifest " +
      "stats; projection pushdown narrows the parquet read") {
    val dir = mk() // v1: k ∈ [0,100) in 2 files
    append(dir, 1000L, 1100L) // v2: one file, k ∈ [1000,1100)
    append(dir, 5000L, 5100L) // v3: one file, k ∈ [5000,5100)
    n += 1
    val sink = s"mstream_sink_$n"
    // filter refutable by stats for 3 of the 4 files; project k only.
    // Reader options, not .where/.select: Spark's micro-batch planner
    // builds the scan without pushdown rules, so the option IS the
    // pushdown surface (and is applied exactly, not just for skipping)
    val q = spark.readStream.format("graft-manifest-stream")
      .option("pushFilter", "k >= 5050").option("pushColumns", "k")
      .load(dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // correctness: exactly the matching rows
      assert(spark.table(sink).count() === 50L)
      assert(spark.table(sink).agg(min("k"), max("k"))
        .as[(Long, Long)].head() === ((5050L, 5099L)))
      // file-level pruning evidence: the initial batch spans v1..v3
      // (4 added files), and only the k∈[5000,5100) file survives
      assert(graft.sources.ManifestStreamSource.lastPlanTotal.get() === 4L)
      assert(graft.sources.ManifestStreamSource.lastPlanSelected.get() === 1L)
      // projection: the stream's scan schema carries only k
      assert(spark.table(sink).schema.fieldNames === Array("k"))
      // late appends prune per batch too
      append(dir, 9000L, 9010L) // v4: refuted (k < 5050 is false... kept)
      append(dir, 10L, 20L) // v5: refuted by stats
      q.processAllAvailable()
      assert(graft.sources.ManifestStreamSource.lastPlanSelected.get()
        < graft.sources.ManifestStreamSource.lastPlanTotal.get())
      assert(spark.table(sink).count() === 60L) // + the 10 v4 rows
    } finally { q.stop(); q.awaitTermination() }
  }

  test("pushdown stays refutation-only: residual filters re-apply, " +
      "unknown shapes keep files, results match the batch scan") {
    val dir = mk()
    append(dir, 200L, 300L)
    n += 1
    val sink = s"mstream_sink_$n"
    // m is NOT a stats column and k % 2 is not a refutable shape → no
    // file may prune; the pushFilter must still apply EXACTLY via the
    // per-row residual evaluation
    val q = spark.readStream.format("graft-manifest-stream")
      .option("pushFilter", "m = -1 AND k % 2 = 0")
      .load(dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val expect = StatsManifest.scan(spark, dir)
        .where(col("m") === -1L && col("k") % 2 === 0).count()
      assert(spark.table(sink).count() === expect)
      assert(expect === 50L)
      // no file pruned: refutation-only means unknown shapes keep files
      assert(graft.sources.ManifestStreamSource.lastPlanSelected.get() ===
        graft.sources.ManifestStreamSource.lastPlanTotal.get())
    } finally { q.stop(); q.awaitTermination() }
  }
}
