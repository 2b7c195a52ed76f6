package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RowOps, StatsManifest}
import graft.streaming.Streams

/** Adversarial concurrency fuzz (round 11): a LIVE
  * `upsertToManifestedTable` changelog stream commits into the table
  * on its own thread WHILE a random batch-DML/maintenance sequence
  * runs against it — the deliberate-interleaving rebase spec's chaotic
  * twin. Key spaces are disjoint (stream ≥ 10000, DML < 1000) so every
  * interleaving is either absorbed by the disjoint-commit rebase or
  * surfaces as ConcurrentModificationException and is retried — both
  * paths must conserve content EXACTLY:
  *
  *  - after every DML op the k<1000 slice equals the driver model
  *    (stream traffic filtered out);
  *  - at the end the stream slice equals the changelog's net state;
  *  - recorded snapshots replay their historical k<1000 slice;
  *  - the CDC feed between recorded versions nets to the model diff
  *    on the k<1000 slice (stream changes cancel within the filter);
  *  - the version-offset stream SOURCE's tombstone guard fires on the
  *    mutated history (the adversarial read-side check).
  *
  * ≥200 randomized ops across the seeds, each potentially racing a
  * stream commit. */
class ConcurrentWriterPropSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private type RowT = (Long, Long)
  private def sortedSeq(v: Iterable[RowT]): Seq[RowT] = v.toSeq.sorted
  private def dmlSlice(df: org.apache.spark.sql.DataFrame): Seq[RowT] =
    sortedSeq(df.where(col("k") < 1000L)
      .select("k", "m").as[RowT].collect().toSeq)

  test("random DML under a live streaming writer: rebase + retry " +
      "conserve both slices exactly; snapshots and CDC stay sound") {
    for (seed <- Seq(7, 19)) runOne(seed)
  }

  private def isCme(e: Throwable): Boolean =
    e != null && (e.isInstanceOf[java.util.ConcurrentModificationException]
      || isCme(e.getCause))

  private def retrying[T](what: String)(body: => T): T = {
    var attempts = 0
    while (true) {
      try return body
      catch {
        // key-dependent ops lose the race whenever the live writer
        // commits inside their window — with a continuous ~2s-cadence
        // writer that is often; keep retrying (each attempt re-analyzes
        // the new latest, so a retry is always semantically fresh).
        // Cause-chain walk: the SQL front door may wrap the CME.
        case e: Exception if attempts < 16 && isCme(e) =>
          attempts += 1
          Thread.sleep(30L * attempts)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def runOne(seed: Int): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_ccw_$seed").toString + "/t"
    // Hive-partitioned by writer SIDE: copy-on-write rewrites stage
    // back partitioned, so the two writers' FILES stay disjoint and
    // most interleavings are absorbable by the rebase (without this
    // the bytes-bounded rewrite collapses the tiny table to one shared
    // file and every interleaving is a true conflict — adversarial,
    // but a livelock by construction, not a realistic table)
    var model: Vector[RowT] =
      (0 until 300).map(i => (i.toLong, (i % 5).toLong)).toVector
    model.map { case (k, m) => (k, m, "d") }.toDF("k", "m", "p")
      .repartitionByRange(4, col("k"))
      .write.partitionBy("p").parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    var snaps = Vector(StatsManifest.latestVersion(spark, dir).get -> model)
    // SQL front door for the dynamic-partition overwrite op (r13)
    val fuzzTbl = s"cw_fuzz_$seed"
    spark.sql(s"DROP TABLE IF EXISTS $fuzzTbl")
    spark.sql(s"CREATE TABLE $fuzzTbl USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")

    // the live writer: keyed changelog with keys ≥ 10000; seq strictly
    // increasing so keep-last is deterministic; ~6% deletes
    val mem = MemoryStream[(Long, Long, String, Long, Boolean)]
    val streamModel =
      scala.collection.mutable.Map.empty[Long, Long] // net state
    var seq = 0L
    def feed(n: Int): Unit = {
      val rows = (0 until n).map { _ =>
        seq += 1
        val k = 10000L + rnd.nextInt(200)
        val del = rnd.nextInt(16) == 0
        if (del) streamModel.remove(k) else streamModel(k) = seq
        (k, seq, "s", seq, del)
      }
      mem.addData(rows: _*)
      ()
    }
    feed(50) // ensure the stream has work from the start
    val q = Streams.upsertToManifestedTable(spark,
      mem.toDF().toDF("k", "m", "p", "seq", "del"), dir,
      keys = Seq("k"), seqCol = "seq", statsCols = Seq("k"),
      deleteCol = Some("del"), triggerMs = 150L,
      manifestVersionsToKeep = 200)

    // r11b: a LIVE CDC-stream consumer runs through the whole fuzz —
    // every commit it races exercises the declared-change-files wait
    // (the sidecar lands moments after the version rename); at the
    // end its feed must equal RowOps.changes' replay row for row
    val cdcStartV = StatsManifest.latestVersion(spark, dir).get
    val cdcGot = new java.util.concurrent
      .ConcurrentLinkedQueue[(Long, Long, String, Long)]
    val cdcQ = spark.readStream.format("graft-manifest-stream")
      .option("readChangeFeed", "true")
      .option("startingVersion", (cdcStartV + 1).toString).load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("k", "m", "_change_type", "_commit_version")
          .collect().foreach(r => cdcGot.add(
            (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))))
        ()
      }.start()

    try {
      for (step <- 0 until 100) {
        if (rnd.nextInt(3) == 0) feed(rnd.nextInt(40) + 5)
        // pace like a real batch client: windows in which the live
        // writer's commits land conflict-free (constant max-rate DML
        // on one table would just ping-pong conflicts)
        Thread.sleep(rnd.nextInt(250).toLong)
        rnd.nextInt(7) match {
          case 0 =>
            val a = rnd.nextInt(400).toLong
            val b = a + rnd.nextInt(60) + 1
            retrying("delete")(RowOps.delete(spark, dir,
              col("k") >= a && col("k") < b, Seq("k")))
            model = model.filterNot { case (k, _) => k >= a && k < b }
          case 1 =>
            val p = rnd.nextInt(7) + 2
            val r = rnd.nextInt(p)
            retrying("update")(RowOps.update(spark, dir,
              col("k") % p === r && col("k") < 1000L,
              Seq("m" -> lit(-(step + 1).toLong)), Seq("k")))
            model = model.map { case (k, m) =>
              if (k % p == r) (k, -(step + 1).toLong) else (k, m)
            }
          case 2 =>
            val keys = (Seq.fill(rnd.nextInt(8) + 1)(
              rnd.nextInt(320).toLong) ++
              Seq.fill(rnd.nextInt(3))(600L + rnd.nextInt(50))).distinct
            val src = keys.map(k => (k, 100L * step + k % 9))
            retrying("upsert")(RowOps.upsert(spark, dir,
              src.map { case (k, m) => (k, m, "d") }.toDF("k", "m", "p"),
              Seq("k"), Seq("k")))
            val srcKeys = src.map(_._1).toSet
            model = model.filterNot(r => srcKeys.contains(r._1)) ++ src
          case 3 =>
            val keys = Seq.fill(rnd.nextInt(6) + 1)(
              rnd.nextInt(350).toLong).distinct
            retrying("deleteKeys")(RowOps.deleteKeys(spark, dir,
              keys.toDF("k"), Seq("k"), Seq("k")))
            val ks = keys.toSet
            model = model.filterNot(r => ks.contains(r._1))
          case 5 => // r12: single-commit overwrite-where (the static-
            // partition INSERT OVERWRITE lowering) racing the stream
            val a = rnd.nextInt(400).toLong
            val b = a + rnd.nextInt(40) + 1
            val rows = (a until math.min(b, a + rnd.nextInt(8) + 1))
              .map(k => (k, 1000L * step + k % 5, "d"))
            retrying("overwrite")(RowOps.overwriteWhere(spark, dir,
              col("k") >= a && col("k") < b && col("k") < 1000L,
              rows.toDF("k", "m", "p"), Seq("k")))
            model = model.filterNot { case (k, _) => k >= a && k < b } ++
              rows.map(r => (r._1, r._2))
          case 6 => // r13: DYNAMIC-partition INSERT OVERWRITE racing
            // the stream — the incoming frame touches only partition
            // 'd', so exactly the DML partition is replaced (the
            // backfill shape: recompute-the-partition) while the
            // stream's 's' partition rides through the rebase
            val rows = model.map { case (k, m) => (k, m + 1L) } ++
              Seq.fill(rnd.nextInt(3))(
                (700L + rnd.nextInt(50), step.toLong))
            val dedup = rows.groupBy(_._1).map(_._2.head).toVector
            dedup.map { case (k, m) => (k, m, "d") }
              .toDF("k", "m", "p")
              .createOrReplaceTempView(s"cw_dyn_src_$seed")
            retrying("overwriteDyn")(spark.sql(
              s"INSERT OVERWRITE $fuzzTbl PARTITION (p) " +
                s"SELECT k, m, p FROM cw_dyn_src_$seed").collect())
            if (dedup.nonEmpty) model = dedup
          case 4 => // maintenance under fire
            rnd.nextInt(2) match {
              case 0 => retrying("compact")(
                graft.operators.Layout.compactSmall(spark, dir,
                  Seq("k"), targetBytes = 1L << 26,
                  smallBytes = 1L << 26, deferDelete = true))
              case 1 =>
                StatsManifest.expire(spark, dir, keep = 100,
                  exact = false)
                val oldest = StatsManifest.versions(spark, dir).head
                snaps = snaps.filter(_._1 >= oldest)
            }
        }
        assert(dmlSlice(StatsManifest.scan(spark, dir)) ===
          sortedSeq(model),
          s"seed=$seed step=$step: DML slice diverged under the " +
            "live writer")
        val v = StatsManifest.latestVersion(spark, dir).get
        if (v != snaps.last._1) snaps :+= v -> model
      }
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }

    // drain the CDC consumer to the final version, then compare its
    // feed (the retained tail — early versions may have expired under
    // it, which only trims the comparable window) against the batch
    // replay
    try {
      cdcQ.processAllAvailable()
    } finally { cdcQ.stop(); cdcQ.awaitTermination() }
    val cdcLatest = StatsManifest.latestVersion(spark, dir).get
    val cdcFrom = math.max(cdcStartV,
      StatsManifest.versions(spark, dir).head)
    if (cdcLatest > cdcFrom) {
      import scala.jdk.CollectionConverters._
      val feed = cdcGot.asScala.toSeq
        .filter(r => r._4 > cdcFrom && r._4 <= cdcLatest)
        .map(r => s"${r._1}|${r._2}|${r._3}|${r._4}").sorted
      val replay = RowOps.changes(spark, dir, cdcFrom, cdcLatest)
        .select("k", "m", "_change_type", "_commit_version").collect()
        .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getString(2)}|" +
          s"${r.getLong(3)}").sorted.toSeq
      assert(feed === replay,
        s"seed=$seed: live CDC feed (${feed.length} rows over " +
          s"($cdcFrom, $cdcLatest]) diverged from changes() replay " +
          s"(${replay.length} rows)")
    }

    // final content: both slices exact
    assert(dmlSlice(StatsManifest.scan(spark, dir)) === sortedSeq(model))
    val streamed = StatsManifest.scan(spark, dir)
      .where(col("k") >= 10000L)
      .select("k", "m").as[RowT].collect().toSeq
    assert(sortedSeq(streamed) === sortedSeq(streamModel.toSeq),
      s"seed=$seed: stream slice diverged from the changelog's net state")

    // snapshots replay their historical DML slice (stream rows at that
    // version are whatever they were — the filter isolates the model)
    val oldest = StatsManifest.versions(spark, dir).head
    snaps.filter(_._1 >= oldest).takeRight(5).foreach { case (v, m) =>
      assert(dmlSlice(StatsManifest.scanAtVersion(spark, dir, v)._1) ===
        sortedSeq(m), s"seed=$seed: snapshot v$v DML slice diverged")
    }

    // CDC invariant on the DML slice between recorded versions
    val live = snaps.filter(_._1 >= oldest)
    if (live.length >= 2) {
      val (vi, mi) = live(live.length / 2)
      val (vj, mj) = live.last
      val cdc = RowOps.changes(spark, dir, vi, vj)
        .where(col("k") < 1000L)
        .select("k", "m", "_change_type")
        .as[(Long, Long, String)].collect()
      val ins = cdc.filter(_._3 == "insert").map(c => (c._1, c._2)).toSeq
      val del = cdc.filter(_._3 == "delete").map(c => (c._1, c._2)).toSeq
      assert(sortedSeq(mi ++ ins) === sortedSeq(mj ++ del),
        s"seed=$seed: CDC v$vi→v$vj DML slice violates the invariant")
    }

    // the version-offset stream source must refuse this mutated
    // history loudly (the tombstone guard, under adversarial churn)
    SparkFixture.quietExpectedStreamFailures {
      val e = intercept[Exception] {
        val q2 = spark.readStream.format("graft-manifest-stream")
          .option("startingVersion", oldest.toString).load(dir)
          .writeStream.format("noop").start()
        try q2.processAllAvailable() finally {
          q2.stop(); q2.awaitTermination()
        }
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("not append-only") ||
        m.contains("no longer retained") || m.contains("tombstoned")),
        s"seed=$seed: expected the tombstone/retention guard, got $e")
    }
  }
}
