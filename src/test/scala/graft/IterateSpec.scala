package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Iterate, Ops}
import graft.streaming.IterativeStream

/** Bulk/delta batch iteration combinators (reference DataSet.iterate /
  * iterateDelta) and the streaming feedback loop (DataStream.iterate). */
class IterateSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("iterate runs the step exactly maxIterations times") {
    val init = Seq(1L, 2L, 3L).toDF("v")
    val got = Iterate.iterate(init, 5)(df => df.withColumn("v", $"v" * 2))
      .collect().map(_.getLong(0)).sorted
    assert(got === Array(32L, 64L, 96L)) // each ×2^5
    // zero iterations = identity
    val same = Iterate.iterate(init, 0)(df => df.limit(0))
      .collect().map(_.getLong(0)).sorted
    assert(same === Array(1L, 2L, 3L))
  }

  test("iterate keeps plan depth O(1) in rounds (checkpoint per round)") {
    val init = Seq(1L).toDF("v")
    val out = Iterate.iterate(init, 30)(df => df.withColumn("v", $"v" + 1))
    // 30 un-checkpointed chained projections would nest 30 deep; the
    // checkpointed plan is a scan of round 30's blocks
    assert(out.queryExecution.optimizedPlan.toString.linesIterator.size < 10)
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(31L))
  }

  test("iterateWithCriterion stops when the criterion set is empty") {
    // decrement positive counters; criterion = rows still positive after
    // the step. Values 1..4 need 4 rounds; maxIterations = 100 must NOT
    // be reached.
    var rounds = 0
    val init = Seq(1L, 2L, 3L, 4L).toDF("v")
    val out = Iterate.iterateWithCriterion(init, 100) { df =>
      rounds += 1
      val next = df.withColumn("v", greatest($"v" - 1, lit(0L)))
      (next, next.where($"v" > 0))
    }
    assert(rounds === 4)
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(0L, 0L, 0L, 0L))
  }

  test("iterateWithCriterion honors maxIterations as the fallback guard") {
    val init = Seq(10L).toDF("v")
    val out = Iterate.iterateWithCriterion(init, 3) { df =>
      val next = df.withColumn("v", $"v" - 1)
      (next, next.where($"v" > 0)) // would need 10 rounds
    }
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("iterateDelta: same-key delta rows replace; empty workset ends the loop") {
    var rounds = 0
    val solution = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("id", "val")
    val workset = Seq((1L, 10L), (2L, 20L)).toDF("id", "dec")
    val out = Iterate.iterateDelta(solution, workset, 100, Seq("id")) {
      (sol, ws) =>
        rounds += 1
        // subtract dec from the keyed value once; no further work
        val delta = sol.join(ws, "id")
          .select($"id", ($"val" - $"dec").as("val"))
        (delta, ws.limit(0))
    }
    assert(rounds === 1)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got === Array((1L, 90L), (2L, 180L), (3L, 300L)))
  }

  test("iterateDelta rejects a delta with two rows for one key (keyed solution set)") {
    val solution = Seq((1L, 100L)).toDF("id", "val")
    val workset = Seq((1L, 10L)).toDF("id", "dec")
    val ex = intercept[IllegalArgumentException] {
      Iterate.iterateDelta(solution, workset, 10, Seq("id")) { (_, ws) =>
        // a step that "forgets" to aggregate: two candidate rows for id=1
        val delta = Seq((1L, 90L), (1L, 80L)).toDF("id", "val")
        (delta, ws.limit(0))
      }
    }
    assert(ex.getMessage.contains("at most one delta row per key"))
    assert(ex.getMessage.contains("id=1"))
  }

  test("feedback replay with fewer part files replaces the batch, no stale parts") {
    // the at-least-once replay contract: a replayed micro-batch that
    // repartitions differently after a restart must fully REPLACE its
    // previous feedback files — stale higher-indexed parts from the
    // failed attempt would be ingested as duplicate feedback rows
    val root = Files.createTempDirectory("graft-iterfb-").toFile.getAbsolutePath
    val hconf = spark.sparkContext.hadoopConfiguration
    val fbPath = new org.apache.hadoop.fs.Path(s"$root/fb")
    val staging = new org.apache.hadoop.fs.Path(s"$root/fb.staging")
    val fs = fbPath.getFileSystem(hconf)
    fs.mkdirs(fbPath)
    def fbFiles(batch: Long): Seq[String] =
      fs.listStatus(fbPath).map(_.getPath.getName)
        .filter(_.startsWith(f"fb-$batch%012d-")).sorted.toSeq
    // original attempt: 4 partitions → 4 part files for batch 7
    IterativeStream.writeFeedback(fs, fbPath, staging, 7L,
      (1L to 8L).toDF("v").repartition(4))
    assert(fbFiles(7L).size === 4)
    // replay of the same batch with 2 partitions → exactly 2 files remain
    IterativeStream.writeFeedback(fs, fbPath, staging, 7L,
      (1L to 8L).toDF("v").repartition(2))
    assert(fbFiles(7L).size === 2)
    // a different batch's files are untouched by the replay
    IterativeStream.writeFeedback(fs, fbPath, staging, 8L,
      (1L to 4L).toDF("v").repartition(1))
    assert(fbFiles(7L).size === 2 && fbFiles(8L).size === 1)
    // total rows enqueued = one copy per batch, not original+replay
    assert(spark.read.parquet(fbPath.toString).count() === 12L)
  }

  test("iterateDelta: incremental min-label CC equals Ops.connectedComponents") {
    // components {1,2,3,4}, {10,11}, isolated via self-edge {20}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 20L))
      .toDF("a", "b")
    val sym = edges.select($"a".as("src"), $"b".as("dst"))
      .union(edges.select($"b".as("src"), $"a".as("dst")))
    val nodes = sym.select($"src".as("id")).distinct()
    val labels0 = nodes.select($"id", $"id".as("comp"))
    var rounds = 0
    val labels = Iterate.iterateDelta(labels0, labels0, 50, Seq("id")) {
      (sol, ws) =>
        rounds += 1
        // propagate each changed label across its edges; keep improvements
        val prop = sym.join(ws, sym("src") === ws("id"))
          .groupBy($"dst".as("id")).agg(min($"comp").as("cand"))
        val delta = prop.join(sol.withColumnRenamed("comp", "cur"), "id")
          .where($"cand" < $"cur")
          .select($"id", $"cand".as("comp"))
        (delta, delta)
    }
    val expect = Ops.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect)
    // delta iteration converges (workset empties) well inside the guard,
    // and needs > 1 round on a diameter-3 component
    assert(rounds > 1 && rounds < 10)
  }

  test("streaming iterate: feedback edge loops rows until emitted, then self-terminates") {
    val root = Files.createTempDirectory("graft-iter-").toFile.getAbsolutePath
    val inDir = s"$root/in"; val fbDir = s"$root/fb"; val cp = s"$root/cp"
    // external input: (id, v = id) for 1..5 — each row must make v trips
    // around the feedback edge before emission at v == 0
    (1L to 5L).map(i => (i, i)).toDF("id", "v")
      .repartition(2).write.parquet(inDir)
    val input = spark.readStream
      .schema("id LONG, v LONG").parquet(inDir)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
    val q = IterativeStream.iterate(spark, input, fbDir,
      body = df => df.withColumn("v", $"v" - 1),
      isFeedback = col("v") > 0,
      out = (df: DataFrame, _: Long) =>
        df.collect().foreach((r: Row) =>
          emitted.add((r.getLong(0), r.getLong(1)))),
      maxWaitMs = 4000L,
      checkpointDir = Some(cp))
    assert(!q.isActive) // maxWaitMs termination, the iterate(ms) contract
    import scala.jdk.CollectionConverters._
    val got = emitted.asScala.toSeq.sorted
    // every id emitted exactly once, fully counted down
    assert(got === (1L to 5L).map(i => (i, 0L)))
    // the loop genuinely cycled: id=5 needs 5 passes, so the feedback dir
    // saw files from several distinct micro-batches
    val fbBatches = new java.io.File(fbDir).listFiles()
      .map(_.getName).filter(_.startsWith("fb-"))
      .map(_.split("-")(1).toLong).distinct
    assert(fbBatches.length >= 3)
  }

  test("streaming iterate: a stopped loop resumes from checkpoint + feedback files") {
    // the durability claim: the feedback edge lives in files + source
    // offsets + the query checkpoint, so killing the query mid-loop and
    // re-calling iterate() with the same dirs completes the iteration
    val root = Files.createTempDirectory("graft-iter2-").toFile.getAbsolutePath
    val inDir = s"$root/in"; val fbDir = s"$root/fb"; val cp = s"$root/cp"
    // v = 8 trips per row: enough rounds that the mid-loop stop lands
    // while feedback is still circulating
    Seq((1L, 8L), (2L, 8L), (3L, 8L)).toDF("id", "v")
      .write.parquet(inDir)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
    def run(maxWaitMs: Long) = IterativeStream.iterate(spark,
      spark.readStream.schema("id LONG, v LONG").parquet(inDir), fbDir,
      body = df => df.withColumn("v", $"v" - 1),
      isFeedback = col("v") > 0,
      out = (df: DataFrame, _: Long) =>
        df.collect().foreach((r: Row) =>
          emitted.add((r.getLong(0), r.getLong(1)))),
      maxWaitMs = maxWaitMs,
      checkpointDir = Some(cp))
    // phase 1: live query (the reference's never-terminating default),
    // killed mid-loop before the countdown can finish
    val q1 = run(0L)
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (emitted.isEmpty && q1.isActive && System.nanoTime() < deadline) {
      // stop only once the loop demonstrably cycled (some feedback file
      // exists) but rows are still in flight
      val fbFiles = Option(new java.io.File(fbDir).listFiles())
        .getOrElse(Array.empty).count(_.getName.startsWith("fb-"))
      if (fbFiles >= 2) q1.stop() else Thread.sleep(50)
    }
    if (q1.isActive) q1.stop()
    assert(emitted.isEmpty, "stop was meant to land mid-countdown")
    // phase 2: same dirs + checkpoint → resumes offsets and in-flight
    // feedback, finishes the remaining trips, self-terminates
    run(4000L)
    import scala.jdk.CollectionConverters._
    // out() is at-least-once across a crash boundary — assert as a set
    assert(emitted.asScala.toSet === Set((1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("streaming iterate rejects a schema-drifting body (no silent null-fill)") {
    // feedback files are read back with the head's schema, so a body
    // that renames a column would null-fill on the next trip — the loop
    // must fail loudly instead
    val root = Files.createTempDirectory("graft-iter3-").toFile.getAbsolutePath
    Seq((1L, 2L)).toDF("id", "v").write.parquet(s"$root/in")
    val ex = SparkFixture.quietExpectedStreamFailures {
      intercept[Exception] {
        IterativeStream.iterate(spark,
          spark.readStream.schema("id LONG, v LONG").parquet(s"$root/in"),
          s"$root/fb",
          body = df => df.withColumnRenamed("v", "w"),
          isFeedback = col("w") > 0,
          out = (_: DataFrame, _: Long) => (),
          maxWaitMs = 8000L)
      }
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("changed the schema")))
  }
}
