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

  // ---- per-trigger admission control (rate-limited catch-up) ---- //

  /** 4 files across 3 versions: v1 = 2×50 rows, v2 = 1×100, v3 = 1×50.
    * Returns the dir. */
  private def mkBacklog(): String = {
    val dir = mk()
    append(dir, 1000L, 1100L) // v2
    append(dir, 2000L, 2050L) // v3
    dir
  }

  private def runLimited(dir: String, opts: Map[String, String])
      : Seq[Long] = {
    val batchSizes =
      new java.util.concurrent.ConcurrentLinkedQueue[Long]
    var r = spark.readStream.format("graft-manifest-stream")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load(dir).writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(df.count()); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    import scala.jdk.CollectionConverters._
    batchSizes.asScala.toSeq.filter(_ > 0L)
  }

  test("maxFilesPerTrigger paces catch-up one file per batch — " +
      "including MID-version splits — and totals stay exactly-once") {
    val dir = mkBacklog()
    val sizes = runLimited(dir, Map("maxFilesPerTrigger" -> "1"))
    // v1's two 50-row files arrive in SEPARATE batches (a sub-version
    // offset split them), then v2's 100, then v3's 50
    assert(sizes === Seq(50L, 50L, 100L, 50L))
  }

  test("maxBytesPerTrigger is a soft cap: at least one file per batch, " +
      "never two once the cap is exceeded") {
    val dir = mkBacklog()
    // 1 byte < any file ⇒ exactly one file per batch
    val sizes = runLimited(dir, Map("maxBytesPerTrigger" -> "1"))
    assert(sizes === Seq(50L, 50L, 100L, 50L))
    // a generous cap admits everything in one batch
    val all = runLimited(dir, Map("maxBytesPerTrigger" -> "1g"))
    assert(all === Seq(250L))
  }

  test("maxRowsPerTrigger packs whole files up to the row budget " +
      "(manifest row counts, no file opened to decide)") {
    val dir = mkBacklog()
    val sizes = runLimited(dir, Map("maxRowsPerTrigger" -> "100"))
    // [50+50], [100] (first file always admits), [50]
    assert(sizes === Seq(100L, 100L, 50L))
  }

  test("mid-version offset appears in the progress log and a restart " +
      "resumes FROM it exactly-once") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mstream_mid").toString + "/t"
    (0 until 100).map(i => (i.toLong, 0L)).toDF("k", "m")
      .repartition(4).write.parquet(dir) // ONE version, 4 files
    StatsManifest.write(spark, dir, Seq("k"))
    val cp = java.nio.file.Files
      .createTempDirectory("graft_mstream_midcp").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    @volatile var failOnSecondBatch = true
    def start() = spark.readStream.format("graft-manifest-stream")
      .option("maxFilesPerTrigger", "3").load(dir).writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id >= 1 && failOnSecondBatch)
          throw new RuntimeException("boom: fail after batch 0")
        df.select("k").collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .option("checkpointLocation", cp).start()
    // run 1: batch 0 = 3 of v1's 4 files commits offset {v:0, idx:3},
    // batch 1 fails before the sink sees it
    val q1 = start()
    SparkFixture.quietExpectedStreamFailures {
      intercept[Exception] { q1.awaitTermination() }
    }
    q1.stop()
    val run1 = got.size
    assert(run1 === 75, "3 of 4 equal files = 75 rows in batch 0")
    // run 2: resumes from the checkpointed MID-version offset
    failOnSecondBatch = false
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.size === 100, "the remaining file delivers, once")
      assert(got.asScala.toSet.size === 100, "no duplicates")
    } finally { q2.stop(); q2.awaitTermination() }
  }

  test("startingTimestamp seeds from the first commit at or after it " +
      "(session-zone parse shared with TIMESTAMP AS OF)") {
    val dir = mk() // v1
    Thread.sleep(1100L)
    val between =
      new java.sql.Timestamp(System.currentTimeMillis()).toString
    Thread.sleep(1100L)
    append(dir, 1000L, 1100L) // v2
    val (sink, q) = startInto(dir,
      Map("startingTimestamp" -> between))
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 100L,
        "only v2 (the first commit at/after the timestamp) delivers")
      assert(spark.table(sink).agg(min("k")).as[Long].head() === 1000L)
    } finally { q.stop(); q.awaitTermination() }
    // a pre-history timestamp means the full history
    val (sink2, q2) = startInto(dir,
      Map("startingTimestamp" -> "1999-01-01 00:00:00"))
    try {
      q2.processAllAvailable()
      assert(spark.table(sink2).count() === 200L)
    } finally { q2.stop(); q2.awaitTermination() }
    // both seed options at once is a loud error
    val e = intercept[Exception] {
      spark.readStream.format("graft-manifest-stream")
        .option("startingVersion", "1")
        .option("startingTimestamp", between).load(dir)
        .writeStream.format("noop").start()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not both")), msgs(e).mkString)
  }

  test("schema drift mid-stream fails loudly; a restart adopts the " +
      "new schema (old files null-fill the added column)") {
    val dir = mk()
    val (sink, q) = startInto(dir)
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 100L)
      // ALTER ADD COLUMN while the stream runs, then land data that
      // carries it — a pinned schema would silently drop the column
      RowOps.addColumn(spark, dir, "extra",
        org.apache.spark.sql.types.LongType) // v2 (schema)
      (0 until 10).map(i => (5000L + i, -1L, 7L)).toDF("k", "m", "extra")
        .coalesce(1).write.mode("append").parquet(dir)
      StatsManifest.update(spark, dir, Seq("k")) // v3
      val e = intercept[Exception] {
        SparkFixture.quietExpectedStreamFailures {
          q.processAllAvailable()
        }
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("schema changed")),
        msgs(e).mkString)
    } finally {
      q.stop()
      // the query terminated WITH the expected exception —
      // awaitTermination would rethrow it
      try q.awaitTermination() catch { case _: Exception => () }
    }
    // a FRESH stream pins the evolved schema: new files carry the
    // column, historical files read as null — never a silent drop
    val (sink2, q2) = startInto(dir)
    try {
      q2.processAllAvailable()
      val t = spark.table(sink2)
      assert(t.schema.fieldNames.contains("extra"))
      assert(t.count() === 110L)
      assert(t.where(col("extra") === 7L).count() === 10L)
      assert(t.where(col("extra").isNull).count() === 100L)
    } finally { q2.stop(); q2.awaitTermination() }
  }

  // ---- readChangeFeed: the DSv2 CDC stream ---- //

  test("readChangeFeed: initial snapshot as inserts, row-op changes " +
      "from the precomputed files, appends as inserts, maintenance " +
      "commits emit nothing") {
    val dir = mk() // v1: 100 rows (k 0..99)
    RowOps.delete(spark, dir, col("k") < 10, Seq("k")) // v2: 10 deletes
    append(dir, 1000L, 1020L) // v3: 20 inserts, no change files
    StatsManifest.checkpoint(spark, dir) // v4: net-zero maintenance
    n += 1
    val sink = s"mstream_sink_$n"
    val q = spark.readStream.format("graft-manifest-stream")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val t = spark.table(sink)
      assert(t.schema.fieldNames.toSeq ===
        Seq("k", "m", "_change_type", "_commit_version"))
      val byVer = t.groupBy("_commit_version", "_change_type").count()
        .as[(Long, String, Long)].collect().toSet
      assert(byVer === Set((1L, "insert", 100L), (2L, "delete", 10L),
        (3L, "insert", 20L)))
      // a row-level UPDATE while the stream runs: delete+insert pairs
      RowOps.update(spark, dir, col("k") === 50L,
        Seq("m" -> lit(-5L)), Seq("k")) // v5
      // an OPTIMIZE rewrite is net-zero: the op sidecar tells the
      // stream to skip it rather than re-emit carried rows
      graft.operators.Layout.optimize(spark, dir, Seq("k"),
        deferDelete = true) // v6
      q.processAllAvailable()
      val t2 = spark.table(sink).where(col("_commit_version") >= 5L)
      assert(t2.groupBy("_change_type").count()
        .as[(String, Long)].collect().toSet ===
        Set(("delete", 1L), ("insert", 1L)))
      assert(t2.where(col("_change_type") === "insert")
        .select("m").as[Long].head() === -5L)
      assert(spark.table(sink)
        .where(col("_commit_version") === 6L).count() === 0L,
        "optimize must not re-emit carried rows")
    } finally { q.stop(); q.awaitTermination() }
    // rate-limited CDC catch-up delivers the same multiset
    val unlimited = spark.table(sink).count()
    val paced = runLimited(dir, Map("readChangeFeed" -> "true",
      "maxFilesPerTrigger" -> "1"))
    assert(paced.sum === unlimited)
    assert(paced.length >= 4, "one change/data file per batch")
  }

  test("readChangeFeed on a Hive-partitioned table synthesizes " +
      "partition columns for append versions") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mstream_cdcp").toString + "/t"
    (0 until 90).map(i => (i % 3, i.toLong, 0L)).toDF("p", "k", "m")
      .repartitionByRange(3, col("p"))
      .write.partitionBy("p").parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    (3 to 3).flatMap(p => (100 until 110).map(i =>
      (p, i.toLong, 1L))).toDF("p", "k", "m")
      .coalesce(1).write.partitionBy("p").mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k")) // v2: new partition
    n += 1
    val sink = s"mstream_sink_$n"
    val q = spark.readStream.format("graft-manifest-stream")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val t = spark.table(sink)
      assert(t.count() === 100L)
      assert(t.where(col("_commit_version") === 2L)
        .agg(min("p"), max("p"), count(lit(1)))
        .as[(Int, Int, Long)].head() === ((3, 3, 10L)))
    } finally { q.stop(); q.awaitTermination() }
  }

  test("the CDC stream and RowOps.changes agree over a mixed op " +
      "sequence: full feed == initial snapshot + per-version netting") {
    val dir = mk() // v1: k 0..99
    append(dir, 1000L, 1050L) // v2
    RowOps.delete(spark, dir, col("k") < 20, Seq("k")) // v3
    RowOps.update(spark, dir, col("k") % 10 === 5L,
      Seq("m" -> lit(-9L)), Seq("k")) // v4
    graft.operators.Layout.optimize(spark, dir, Seq("k"),
      deferDelete = true) // v5: net-zero
    RowOps.upsert(spark, dir,
      Seq((25L, -1L), (9000L, -2L)).toDF("k", "m"),
      Seq("k"), Seq("k")) // v6
    append(dir, 2000L, 2010L) // v7
    val latest = StatsManifest.versions(spark, dir).last
    n += 1
    val sink = s"mstream_sink_$n"
    val q = spark.readStream.format("graft-manifest-stream")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try q.processAllAvailable() finally {
      q.stop(); q.awaitTermination()
    }
    val cols = Seq("k", "m", "_change_type", "_commit_version")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq.mkString("|")).sorted.toSeq
    val got = canon(spark.table(sink))
    val snapshot = StatsManifest.scanAtVersion(spark, dir, 1L)._1
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(1L))
    val expected = canon(snapshot.unionByName(
      RowOps.changes(spark, dir, 1L, latest)))
    assert(got === expected,
      s"stream=${got.length} rows, changes-replay=${expected.length}")
  }

  test("readChangeFeed fails loudly on a mutation without change " +
      "files (cdf = false) instead of emitting a wrong feed") {
    val dir = mk()
    RowOps.delete(spark, dir, col("k") < 10, Seq("k"), cdf = false)
    val (_, q) = startInto(dir, Map("readChangeFeed" -> "true"))
    val e = intercept[Exception] {
      SparkFixture.quietExpectedStreamFailures {
        try q.processAllAvailable()
        finally { q.stop(); q.awaitTermination() }
      }
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("change files")), msgs(e).mkString)
    // option conflicts are rejected up front
    val e2 = intercept[Exception] {
      spark.readStream.format("graft-manifest-stream")
        .option("readChangeFeed", "true")
        .option("ignoreChanges", "true").load(dir)
    }
    assert(e2.getMessage.contains("readChangeFeed"))
  }

  test("CDC pushdown: pushColumns narrows the feed, pushFilter refutes " +
      "whole added files and re-applies exactly — the feed equals the " +
      "filtered changes replay") {
    val dir = mk() // v1: k 0..99
    RowOps.delete(spark, dir, col("k") < 10, Seq("k")) // v2: 10 deletes
    append(dir, 1000L, 1100L) // v3: k 1000..1099
    append(dir, 2000L, 2100L) // v4: k 2000..2099 — refutable
    n += 1
    val sink = s"mstream_sink_$n"
    val q = spark.readStream.format("graft-manifest-stream")
      .option("readChangeFeed", "true")
      .option("pushColumns", "k")
      .option("pushFilter", "k < 2000")
      .load(dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val t = spark.table(sink)
      // projection: only k + the envelope (m is gone)
      assert(t.schema.fieldNames.toSeq ===
        Seq("k", "_change_type", "_commit_version"))
      // v4's single added file (k 2000..2099) was REFUTED by manifest
      // stats — it never became a unit (the last computeUnits call)
      assert(graft.sources.ManifestStreamSource.lastPlanTotal.get() === 1L)
      assert(graft.sources.ManifestStreamSource.lastPlanSelected.get()
        === 0L)
      // exact content: the filtered replay (snapshot-as-inserts + the
      // netted changes), projected the same way
      val latest = StatsManifest.versions(spark, dir).last
      val snapshot = StatsManifest.scanAtVersion(spark, dir, 1L)._1
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(1L))
      val expected = snapshot
        .unionByName(RowOps.changes(spark, dir, 1L, latest))
        .where(col("k") < 2000L)
        .select("k", "_change_type", "_commit_version")
      def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(canon(t) === canon(expected))
    } finally { q.stop(); q.awaitTermination() }
    // envelope-referencing filters are residual-only but exact: a
    // deletes-only audit feed
    n += 1
    val sink2 = s"mstream_sink_$n"
    val q2 = spark.readStream.format("graft-manifest-stream")
      .option("readChangeFeed", "true")
      .option("pushFilter", "_change_type = 'delete'")
      .load(dir)
      .writeStream.format("memory").queryName(sink2)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val t2 = spark.table(sink2)
      assert(t2.schema.fieldNames.toSeq ===
        Seq("k", "m", "_change_type", "_commit_version"))
      assert(t2.groupBy("_change_type").count()
        .as[(String, Long)].collect().toSeq === Seq(("delete", 10L)))
    } finally { q2.stop(); q2.awaitTermination() }
  }

  test("startingTimestamp survives VACUUM: retro-materialization must " +
      "not perturb commit times (persisted _commit_ts, not dir mtime)") {
    val dir = mk() // v1 (checkpoint)
    append(dir, 1000L, 1010L) // v2 (delta)
    append(dir, 2000L, 2010L) // v3 (delta)
    Thread.sleep(1100L)
    val between =
      new java.sql.Timestamp(System.currentTimeMillis()).toString
    Thread.sleep(1100L)
    append(dir, 3000L, 3010L) // v4 (delta)
    // exact expire keep=3 drops v1 and retro-materializes boundary v2
    // (writes cp-* INTO its dir, bumping the dir mtime to NOW). With
    // mtime-sourced commit times, v2 would read as the newest commit
    // and `between` (older than the vacuum) would map to it — replaying
    // v2+v3. The persisted sidecar keeps v2 at its true commit time.
    assert(StatsManifest.expire(spark, dir, keep = 3) === 1)
    val (sink, q) = startInto(dir, Map("startingTimestamp" -> between))
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 10L,
        "only v4 (the first commit at/after the timestamp) delivers")
      assert(spark.table(sink).agg(min("k")).as[Long].head() === 3000L)
    } finally { q.stop(); q.awaitTermination() }
  }

  test("maxRowsPerTrigger bounds CDC catch-up too: change-file row " +
      "counts ride in the file name, no file opened to budget") {
    val dir = mk() // v1: 100 rows in 2 files
    RowOps.delete(spark, dir, col("k") < 10, Seq("k")) // v2: 10 deletes
    append(dir, 1000L, 1020L) // v3: 20 inserts
    val sizes = runLimited(dir, Map("readChangeFeed" -> "true",
      "maxRowsPerTrigger" -> "100"))
    // v1's two 50-row files fill the budget; v2's change file (10 rows,
    // from its -r10 name) + v3's 20 insert rows share the next batch
    assert(sizes === Seq(100L, 30L))
  }

  test("a declared-but-lost change file fails loudly after the wait " +
      "window — and the wait never blocks a healthy stream") {
    val dir = mk()
    RowOps.delete(spark, dir, col("k") < 5, Seq("k")) // v2 + change file
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // simulate the crash-between-commit-and-CDC-write: v2 declares
    // change files (op sidecar says 'delete') but they are gone
    RowOps.cdcFiles(fs, dir, 2L).foreach(fs.delete(_, false))
    spark.conf.set("spark.graft.cdc.sidecarWaitMs", "400")
    try {
      val (_, q) = startInto(dir, Map("readChangeFeed" -> "true"))
      val e = intercept[Exception] {
        SparkFixture.quietExpectedStreamFailures {
          // within the wait window the racy version reads as "no new
          // data yet" (the trigger thread never blocks), so the v1
          // snapshot batch completes; past the window the next trigger
          // escalates to the loud error
          q.processAllAvailable()
          Thread.sleep(1200L)
          try q.processAllAvailable()
          finally { q.stop(); q.awaitTermination() }
        }
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("never landed")), msgs(e).mkString)
      // defensive conf parse: garbage is a clear error, not a bare NFE
      spark.conf.set("spark.graft.cdc.sidecarWaitMs", "soon")
      val (_, q2) = startInto(dir, Map("readChangeFeed" -> "true"))
      val e2 = intercept[Exception] {
        SparkFixture.quietExpectedStreamFailures {
          try q2.processAllAvailable()
          finally { q2.stop(); q2.awaitTermination() }
        }
      }
      assert(msgs(e2).exists(_.contains("sidecarWaitMs")),
        msgs(e2).mkString)
    } finally spark.conf.unset("spark.graft.cdc.sidecarWaitMs")
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
