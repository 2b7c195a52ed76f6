package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RowOps, StatsManifest}

/** Row-level ops on a manifested table: copy-on-write at FILE
  * granularity with manifest-pruned candidate discovery, tombstoned
  * (not deleted) replacements so snapshots and CDC survive, atomic
  * single-commit visibility, and vacuum via version retention. */
class RowOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** 2000 rows, k = 0..1999 range-partitioned into 8 ~disjoint files —
    * a predicate on k admits only the files whose range it hits. */
  private def mk(tag: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_rowops_$tag").toString + "/t"
    (0 until 2000).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "m")
      .repartitionByRange(8, col("k")).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    dir
  }

  private def files(dir: String): Set[String] =
    StatsManifest.read(spark, dir).keySet

  private def physical(dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith("."))
      .map(st => StatsManifest.fileKey(st.getPath)).toSet
  }

  test("delete: only candidate files scan, only matching files rewrite, " +
      "untouched entries carry over byte-identical") {
    val dir = mk("del")
    val before = files(dir)
    val r = RowOps.delete(spark, dir, col("k") < 250, Seq("k"))
    assert(r.version === 2L)
    assert(r.totalFiles === 8L)
    // range-partitioned on k: the manifest refutes most files at plan
    // time, and only files actually holding k<250 rows were rewritten
    assert(r.candidateFiles <= 2L, s"candidates ${r.candidateFiles}")
    assert(r.touchedFiles === r.candidateFiles ||
      r.touchedFiles <= r.candidateFiles)
    assert(r.matchedRows === 250L)
    assert(r.rewrittenRows === (// kept rows of the touched files
      StatsManifest.readAt(spark, dir, 1L)
        .filter(kv => !files(dir).contains(kv._1))
        .valuesIterator.map(_.rows).sum - 250L))
    // final state == the filter, read through the pruned latest scan
    val got = StatsManifest.scan(spark, dir)
      .orderBy("k").as[(Long, Long)].collect()
    assert(got === (250 until 2000).map(i => (i.toLong, (i % 7).toLong)))
    // untouched files carried over (same keys in the new manifest);
    // touched files tombstoned but physically retained
    val after = files(dir)
    val touched = before -- after
    assert(touched.size === r.touchedFiles)
    assert((before intersect after).size ===
      (8L - r.touchedFiles))
    assert(touched.forall(physical(dir).contains),
      "tombstoned files must stay on disk for snapshots/CDC")
    // a plain latest-reader (scanWithIndex) denies the tombstones even
    // though the bytes are present and the dir listing sees them
    assert(StatsManifest.scan(spark, dir).count() === 1750L)
  }

  test("sizeInBytes reports LIVE bytes after row ops — broadcast " +
      "decisions see the table as it reads, not the pre-vacuum dir") {
    val dir = mk("size")
    val (_, idx0) = StatsManifest.scanWithIndex(spark, dir)
    val full = idx0.sizeInBytes
    // delete ~87% of the rows: tombstoned bytes stay on disk for
    // snapshots, but the live scan must size itself by the live files
    RowOps.delete(spark, dir, col("k") < 1750, Seq("k"))
    val (_, idx1) = StatsManifest.scanWithIndex(spark, dir)
    assert(idx1.sizeInBytes < full / 2,
      s"live=${idx1.sizeInBytes} full=$full — tombstoned bytes must " +
        "not count")
    // and the live size equals the manifest's own flen sum
    val liveSum = idx1.stats.collect {
      case (k, st) if !idx1.deny.contains(k) => st.len
    }.sum
    assert(idx1.sizeInBytes === liveSum)
    // end-to-end: with a broadcast threshold between live and dir
    // size, the mostly-deleted table earns the broadcast join the dir
    // total would have denied it
    val thr = (idx1.sizeInBytes + full) / 2
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr.toString)
    try {
      val other = spark.range(0L, 500000L).toDF("k")
      val plan = other.join(StatsManifest.scan(spark, dir), "k")
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally spark.conf
      .set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("snapshot reads survive a delete: the table AS OF v1 is intact") {
    val dir = mk("snap")
    RowOps.delete(spark, dir, col("k") >= 1000L, Seq("k"))
    val (snap, _) = StatsManifest.scanAtVersion(spark, dir, 1L)
    assert(snap.count() === 2000L)
    assert(StatsManifest.scan(spark, dir).count() === 1000L)
  }

  test("update: predicate rows rewritten in place, null-cond rows kept, " +
      "values cast to the stored type") {
    val dir = mk("upd")
    val r = RowOps.update(spark, dir,
      col("k").between(100, 104), Seq("m" -> lit(-1)), Seq("k"))
    assert(r.matchedRows === 5L)
    val got = StatsManifest.scan(spark, dir)
      .where(col("k").between(98, 106)).orderBy("k")
      .select("m").as[Long].collect()
    assert(got === Array(0L, 1L, -1L, -1L, -1L, -1L, -1L, 0L, 1L))
    // no-op predicate: no new version, nothing rewritten
    val r2 = RowOps.update(spark, dir, col("k") === -5L,
      Seq("m" -> lit(9)), Seq("k"))
    assert(r2.version === r.version && r2.touchedFiles === 0L)
  }

  test("upsert: matched keys replaced, new keys inserted, source key " +
      "range prunes candidate files, duplicate source keys fail fast") {
    val dir = mk("ups")
    val src = Seq((1600L, 777L), (1601L, 777L), (5000L, 888L))
      .toDF("k", "m")
    val r = RowOps.upsert(spark, dir, src, Seq("k"), Seq("k"))
    assert(r.matchedRows === 2L && r.insertedRows === 1L)
    // key envelope [1600, 5000]: every file whose k-range tops out below
    // 1600 is refuted at plan time before the semi join runs
    assert(r.candidateFiles < r.totalFiles,
      s"candidates ${r.candidateFiles} of ${r.totalFiles}")
    val got = StatsManifest.scan(spark, dir)
      .where(col("k").isin(1600L, 1601L, 1602L, 5000L)).orderBy("k")
      .as[(Long, Long)].collect()
    assert(got === Array((1600L, 777L), (1601L, 777L), (1602L, 1602L % 7),
      (5000L, 888L)))
    assert(StatsManifest.scan(spark, dir).count() === 2001L)
    intercept[IllegalArgumentException] {
      RowOps.upsert(spark, dir,
        Seq((1L, 1L), (1L, 2L)).toDF("k", "m"), Seq("k"), Seq("k"))
    }
  }

  test("deleteKeys: erasure by key set") {
    val dir = mk("dk")
    val r = RowOps.deleteKeys(spark, dir,
      Seq(3L, 4L, 1999L, 777777L).toDF("k"), Seq("k"), Seq("k"))
    assert(r.matchedRows === 3L)
    val s = StatsManifest.scan(spark, dir)
    assert(s.count() === 1997L)
    assert(s.where(col("k").isin(3L, 4L, 1999L)).count() === 0L)
  }

  test("changes: row-level CDC nets carried-over rows out; appends " +
      "surface as inserts; file-level mode shows the raw churn") {
    val dir = mk("cdc")
    RowOps.delete(spark, dir, col("k") < 250, Seq("k")) // v2
    RowOps.update(spark, dir, col("k") % 500 === 0,
      Seq("m" -> lit(-42)), Seq("k")) // v3: k = 500, 1000, 1500
    val cdc = RowOps.changes(spark, dir, 1L, 3L)
      .orderBy("_commit_version", "_change_type", "k")
      .select("k", "m", "_change_type", "_commit_version")
      .as[(Long, Long, String, Long)].collect()
    val expect =
      (0 until 250).map(i =>
        (i.toLong, (i % 7).toLong, "delete", 2L)) ++
        Seq(500L, 1000L, 1500L).map(k => (k, k % 7, "delete", 3L)) ++
        Seq(500L, 1000L, 1500L).map(k => (k, -42L, "insert", 3L))
    assert(cdc === expect.toArray)
    // file-level (unnetted) churn is strictly larger: whole touched
    // files appear on both sides
    val raw = RowOps.changes(spark, dir, 1L, 3L, rowLevel = false)
    assert(raw.count() > cdc.length.toLong)
    // the feed above came from PRECOMPUTED change files (ops write them
    // at commit); deleting them must fall back to file-diff netting
    // with the identical result
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val cdcDir = new Path(dir, "_graft_cdc")
    val pre = fs.listStatus(cdcDir).map(_.getPath)
    assert(pre.count(_.getName.startsWith("v000002-")) >= 1)
    assert(pre.count(_.getName.startsWith("v000003-")) >= 1)
    pre.foreach(fs.delete(_, false))
    val fallback = RowOps.changes(spark, dir, 1L, 3L)
      .orderBy("_commit_version", "_change_type", "k")
      .select("k", "m", "_change_type", "_commit_version")
      .as[(Long, Long, String, Long)].collect()
    assert(fallback === cdc)
    // an ingest append + manifest update is a CDC step too: pure inserts
    (9000 until 9100).map(i => (i.toLong, 0L)).toDF("k", "m")
      .coalesce(1).write.mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k")) // v4
    val step = RowOps.changes(spark, dir, 3L, 4L)
    assert(step.where(col("_change_type") === "insert").count() === 100L)
    assert(step.where(col("_change_type") === "delete").count() === 0L)
  }

  test("changesStream: a readStream over the change files delivers each " +
      "op's netted rows; expire drops a version's change files with it") {
    val dir = mk("cdcstream")
    RowOps.delete(spark, dir, col("k") < 10, Seq("k")) // v2: 10 deletes
    RowOps.upsert(spark, dir,
      Seq((15L, -7L), (9000L, 1L)).toDF("k", "m"), Seq("k"), Seq("k"))
    // ^ v3: 1 replace (delete+insert) + 1 insert = 3 netted rows
    val feed = graft.streaming.Streams.runToTable(spark,
      RowOps.changesStream(spark, dir), "cdc_feed", "append")
    assert(feed.count() === 13L)
    assert(feed.where(col("_commit_version") === 2L &&
      col("_change_type") === "delete").count() === 10L)
    assert(feed.where(col("_commit_version") === 3L).count() === 3L)
    assert(feed.where(col("_commit_version") === 3L &&
      col("_change_type") === "insert" && col("k") === 15L)
      .select("m").as[Long].head() === -7L)
    // retention: dropping v1/v2 removes v2's change files too
    StatsManifest.expire(spark, dir, keep = 1)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val left = fs.listStatus(new Path(dir, "_graft_cdc"))
      .map(_.getPath.getName)
    assert(!left.exists(_.startsWith("v000002-")))
    assert(left.exists(_.startsWith("v000003-")))
  }

  test("CDC through the generic read API: changesFrom/changesTo options") {
    val dir = mk("cdcfmt")
    RowOps.delete(spark, dir, col("k") < 5, Seq("k")) // v2
    RowOps.update(spark, dir, col("k") === 10L,
      Seq("m" -> lit(99)), Seq("k")) // v3
    val cdc = spark.read.format("graft-manifest")
      .option("path", dir).option("changesFrom", "1").load()
    assert(cdc.where(col("_change_type") === "delete").count() === 6L)
    assert(cdc.where(col("_change_type") === "insert")
      .select("m").as[Long].head() === 99L)
    val step = spark.read.format("graft-manifest")
      .option("path", dir)
      .option("changesFrom", "1").option("changesTo", "2").load()
    assert(step.count() === 5L)
  }

  test("reconciliation never resurrects tombstones; expire vacuums them") {
    val dir = mk("vac")
    RowOps.delete(spark, dir, col("k") < 250, Seq("k"))
    val tomb = StatsManifest.removedLatest(spark, dir)
    assert(tomb.nonEmpty)
    // an append + incremental update must NOT re-adopt the tombstoned
    // files even though they still physically exist
    (5000 until 5010).map(i => (i.toLong, 1L)).toDF("k", "m")
      .coalesce(1).write.mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k"))
    assert(StatsManifest.scan(spark, dir).count() === 1760L)
    assert(StatsManifest.removedLatest(spark, dir) === tomb)
    // retention drops v1/v2 → the tombstoned bytes vacuum away
    StatsManifest.expire(spark, dir, keep = 1)
    assert(tomb.forall(k => !physical(dir).contains(k)))
    assert(StatsManifest.scan(spark, dir).count() === 1760L)
    // and the next reconciliation trims the now-dead tombstone keys
    StatsManifest.update(spark, dir, Seq("k"))
    assert(StatsManifest.removedLatest(spark, dir).isEmpty)
    assert(StatsManifest.scan(spark, dir).count() === 1760L)
  }

  test("Hive-partitioned layout: partition pruning bounds the touch " +
      "scan, rewrites land back in their partition dirs, CDC keeps the " +
      "partition column") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rowops_part").toString + "/t"
    (0 until 3000).map(i => (i % 3, i.toLong, (i % 7).toLong))
      .toDF("p", "k", "m")
      .repartitionByRange(6, col("p"), col("k"))
      .write.partitionBy("p").parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    val total = StatsManifest.read(spark, dir).size
    // delete inside ONE partition: candidates bounded by the partition
    val r = RowOps.delete(spark, dir,
      col("p") === 1 && col("k") < 900, Seq("k"))
    assert(r.candidateFiles < total.toLong,
      s"candidates ${r.candidateFiles} of $total")
    assert(r.matchedRows === 300L) // k ≡ 1 mod 3, k < 900
    val t = StatsManifest.scan(spark, dir)
    assert(t.count() === 2700L)
    assert(t.where(col("p") === 1 && col("k") < 900).count() === 0L)
    assert(t.where(col("p") === 0).count() === 1000L)
    // replacement files live under the partition dir they belong to
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val rw = fs.listStatus(new Path(dir, "p=1"))
      .map(_.getPath.getName).filter(_.startsWith("rw-"))
    assert(rw.nonEmpty)
    // upsert across partitions, incl. a brand-new partition value
    val src = Seq((1, 901L, -1L), (9, 77L, -2L)).toDF("p", "k", "m")
    RowOps.upsert(spark, dir, src, Seq("p", "k"), Seq("k"))
    val t2 = StatsManifest.scan(spark, dir)
    assert(t2.where(col("p") === 1 && col("k") === 901L)
      .select("m").as[Long].head() === -1L)
    assert(t2.where(col("p") === 9).count() === 1L)
    // CDC rows carry the partition column with the table's types
    val cdc = RowOps.changes(spark, dir, 2L, 3L)
    assert(cdc.schema("p").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(cdc.where(col("p") === 9 &&
      col("_change_type") === "insert").count() === 1L)
    assert(cdc.where(col("p").isNull).count() === 0L)
    // netting across the reordered-key join: a source row IDENTICAL to
    // the stored row nets to zero; only the real change surfaces
    RowOps.upsert(spark, dir,
      Seq((9, 77L, -2L), (1, 901L, -4L)).toDF("p", "k", "m"),
      Seq("p", "k"), Seq("k"))
    val cdc2 = RowOps.changes(spark, dir, 3L, 4L)
    assert(cdc2.where(col("p") === 9).count() === 0L,
      "an unchanged upserted row must net out of the CDC feed")
    assert(cdc2.count() === 2L) // 901's old+new pair
  }

  test("a commit whose analysis version is stale aborts loudly " +
      "(optimistic concurrency)") {
    val dir = mk("conflict")
    intercept[java.util.ConcurrentModificationException] {
      StatsManifest.commitFileOps(spark, dir, Nil, Set.empty, Seq("k"),
        expectedVersion = Some(0L)) // table is at v1 — analysis is stale
    }
  }

  test("full MERGE on a Hive-partitioned layout: clause matrix applies, " +
      "rewrites and inserts land in their partition dirs") {
    import graft.sources.RowOps.{MergeDelete, MergeInsert, MergeUpdate,
      srcCol}
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rowops_mfpart").toString + "/t"
    (0 until 3000).map(i => (i % 3, i.toLong, (i % 7).toLong))
      .toDF("p", "k", "m")
      .repartitionByRange(6, col("p"), col("k"))
      .write.partitionBy("p").parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    // source: matched keys 0..9 (p = k%3), one unmatched key per clause
    val src = ((0 until 10).map(i => (i % 3, i.toLong, 100L + i)) ++
      Seq((2, 50001L, 500L), (1, 50002L, 1L))).toDF("p", "k", "sv")
    RowOps.merge(spark, dir, src, Seq("p", "k"), Seq("k"),
      matched = Seq(
        MergeUpdate(Some(srcCol("sv") < 105L),
          Seq("m" -> (col("m") + srcCol("sv")))),
        MergeDelete(None)),
      notMatched = Seq(MergeInsert(Some(srcCol("sv") >= 100L),
        Seq("p" -> srcCol("p"), "k" -> srcCol("k"),
          "m" -> -srcCol("sv")))),
      notMatchedBySource = Seq(MergeUpdate(Some(col("k") >= 2995L),
        Seq("m" -> lit(-9L)))))
    val t = StatsManifest.scan(spark, dir)
    // matched sv<105 (k=0..4): m += sv; matched sv>=105 (k=5..9): deleted
    assert(t.where(col("k") === 3L).select("m").as[Long].head() ===
      3L + 103L)
    assert(t.where(col("k").between(5L, 9L)).count() === 0L)
    // conditional insert: 50001 (sv=500) in, 50002 (sv=1) skipped
    assert(t.where(col("k") === 50001L).select("p", "m")
      .as[(Int, Long)].head() === ((2, -500L)))
    assert(t.where(col("k") === 50002L).count() === 0L)
    // by-source: unmatched k >= 2995 updated
    assert(t.where(col("k") >= 2995L && col("k") < 3000L)
      .select("m").as[Long].collect().forall(_ === -9L))
    assert(t.count() === 3000L - 5L + 1L)
    // the insert landed under its Hive partition dir
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(dir, "p=2")).map(_.getPath.getName)
      .exists(_.startsWith("rw-")))
  }

  test("concurrent disjoint commits REBASE: appends land between an " +
      "op's analysis and its commit and everything still lands; a true " +
      "conflict and a key-dependent op racing an append still abort") {
    val dir = mk("rebase")
    // op X analyzes v1 and decides to drop one whole file
    val f = files(dir).toSeq.sorted.head
    val fRows = spark.read.parquet(f).count()
    // interim: two disjoint appends reconcile (v2, v3)
    Seq((5000L, 1L)).toDF("k", "m").coalesce(1)
      .write.mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k"))
    Seq((6000L, 2L)).toDF("k", "m").coalesce(1)
      .write.mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k"))
    assert(StatsManifest.versions(spark, dir) === Seq(1L, 2L, 3L))
    // X commits against its stale analysis — interim commits touched
    // none of X's files → rebase onto v3 and land as v4, not abort
    val v = StatsManifest.commitFileOps(spark, dir, Nil, Set(f),
      Seq("k"), expectedVersion = Some(1L)).version
    assert(v === 4L)
    val t = StatsManifest.scan(spark, dir)
    assert(t.count() === 2000L - fRows + 2L,
      "the rebased commit must keep the racers' appends AND apply its own removal")
    assert(t.where(col("k") === 5000L).count() === 1L)
    assert(t.where(col("k") === 6000L).count() === 1L)
    // TRUE conflict: two ops analyzed v4 and both rewrite file G —
    // the second must abort (its file was removed by the interim commit)
    val g = files(dir).toSeq.sorted.last
    StatsManifest.commitFileOps(spark, dir, Nil, Set(g), Seq("k"),
      expectedVersion = Some(4L)) // racer wins, v5
    intercept[java.util.ConcurrentModificationException] {
      StatsManifest.commitFileOps(spark, dir, Nil, Set(g), Seq("k"),
        expectedVersion = Some(4L))
    }
    // KEY-DEPENDENT op (insert determination — upsert/merge shape):
    // a concurrent APPEND is a conflict even though no file overlaps,
    // because the append may introduce the very keys the op decided
    // to insert
    val h = files(dir).toSeq.sorted.head
    Seq((7000L, 3L)).toDF("k", "m").coalesce(1)
      .write.mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k")) // v6
    val e = intercept[java.util.ConcurrentModificationException] {
      StatsManifest.commitFileOps(spark, dir, Nil, Set(h), Seq("k"),
        expectedVersion = Some(5L), conflictIfInterimAdds = true)
    }
    assert(e.getMessage.contains("added"), e.getMessage)
  }

  /** The racer's committed version dir: a copy of v1 (non-empty, like
    * every real commit). */
  private def fakeRacerVersion(dir: String, v: Long): Path = {
    val mDir = new Path(dir, "_graft_manifest")
    val fs = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(mDir, f"v$v%06d")
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(mDir, "v000001"),
      fs, dst, false, spark.sparkContext.hadoopConfiguration)
    dst
  }

  test("rename-level race: a slot claimed between analysis and rename " +
      "aborts the loser and leaves the winner's version byte-identical") {
    val dir = mk("race")
    val mDir = new Path(dir, "_graft_manifest")
    val fs = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v2 = fakeRacerVersion(dir, 2L)
    val before = fs.listStatus(v2).map(_.getPath.getName).toSet
    val manifest = spark.read.parquet(fs.listStatus(new Path(mDir,
      "v000001")).map(_.getPath.toString).filter(_.contains("part-"))
      .toIndexedSeq: _*)
    // the loser analyzed v1, so its ONLY sound slot is v2 — already
    // taken: it must abort, not bump to v3 (lost update), and must not
    // merge its staged dir into the racer's committed dir (the
    // FileSystem contract renames INTO an existing destination dir)
    intercept[java.util.ConcurrentModificationException] {
      StatsManifest.commitVersion(spark, dir, manifest,
        expected = Some(1L))
    }
    assert(fs.listStatus(v2).map(_.getPath.getName).toSet === before,
      "the winner's version dir must be untouched")
    assert(StatsManifest.versions(spark, dir) === Seq(1L, 2L))
    assert(!fs.listStatus(mDir).exists(
      _.getPath.getName.startsWith(".stage")), "staged dir cleaned up")
  }

  test("TOCTOU window: the slot appears between the existence check and " +
      "the rename — the marker detects the rename-INTO mis-move, the " +
      "mis-move is undone, and the expectation still aborts") {
    val dir = mk("toctou")
    val mDir = new Path(dir, "_graft_manifest")
    val conf = spark.sparkContext.hadoopConfiguration
    val raw = mDir.getFileSystem(conf)
    val v2 = fakeRacerVersion(dir, 2L)
    val before = raw.listStatus(v2).map(_.getPath.getName).toSet
    // a FileSystem that lies ONCE about v2's existence — deterministic
    // stand-in for the racer committing inside the check→rename window.
    // LocalFileSystem then renames the stage INSIDE the racer's v2
    // (the FileSystem dir-rename contract), which a bare rename-result
    // check would mis-read as a successful claim.
    var lied = false
    val lying = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def exists(p: Path): Boolean =
        if (!lied && raw.makeQualified(p) == raw.makeQualified(v2)) {
          lied = true; false
        } else super.exists(p)
    }
    val stage = new Path(mDir, ".stage-toctou")
    raw.mkdirs(stage)
    raw.create(new Path(stage, "_claim-toctou"), true).close()
    raw.create(new Path(stage, "part-00000-x.parquet"), true).close()
    assert(!StatsManifest.claimSlot(lying, stage, v2, "_claim-toctou"),
      "a lost TOCTOU race must not read as a successful claim")
    assert(lied, "the injected window was exercised")
    assert(raw.listStatus(v2).map(_.getPath.getName).toSet === before,
      "the winner's version dir must be restored byte-identical")
    assert(raw.exists(new Path(stage, "part-00000-x.parquet")),
      "the staged bytes must survive the undone mis-move")
    raw.delete(stage, true)
  }

  test("CDC retention decouples from manifest retention: a lagging " +
      "changesStream consumer still finds expired versions' change files") {
    val dir = mk("cdcret")
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // v2..v5: four ops, each landing precomputed change files
    RowOps.delete(spark, dir, col("k") < 10, Seq("k"))
    RowOps.update(spark, dir, col("k") === 100L,
      Seq("m" -> lit(-1L)), Seq("k"))
    RowOps.delete(spark, dir, col("k") === 500L, Seq("k"))
    RowOps.update(spark, dir, col("k") === 600L,
      Seq("m" -> lit(-2L)), Seq("k"))
    assert((2L to 5L).forall(v =>
      RowOps.cdcFiles(fs, dir, v).nonEmpty))
    // tight snapshot retention, wide CDC retention
    StatsManifest.expire(spark, dir, keep = 2, cdcVersionsToKeep = 100)
    assert(StatsManifest.versions(spark, dir) === Seq(4L, 5L))
    assert((2L to 5L).forall(v => RowOps.cdcFiles(fs, dir, v).nonEmpty),
      "change files must outlive their manifest version")
    // default (-1) follows manifest retention, as before
    StatsManifest.expire(spark, dir, keep = 1)
    assert(RowOps.cdcFiles(fs, dir, 4L).isEmpty)
    assert(RowOps.cdcFiles(fs, dir, 5L).nonEmpty)
  }

  test("delete-all: the table empties but stays functional — scan, " +
      "snapshot, append, rebuild") {
    val dir = mk("delall")
    val r = RowOps.delete(spark, dir, lit(true), Seq("k"))
    assert(r.matchedRows === 2000L && r.rewrittenRows === 0L)
    assert(StatsManifest.scan(spark, dir).count() === 0L)
    assert(StatsManifest.scanAtVersion(spark, dir, 1L)._1
      .count() === 2000L)
    // life goes on: append + incremental update, then a full rebuild
    (0 until 10).map(i => (i.toLong, 0L)).toDF("k", "m")
      .coalesce(1).write.mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k"))
    assert(StatsManifest.scan(spark, dir).count() === 10L)
    StatsManifest.write(spark, dir, Seq("k"))
    assert(StatsManifest.scan(spark, dir).count() === 10L)
  }

  test("full rebuild (write) after a delete keeps the tombstones dead") {
    val dir = mk("rebuild")
    RowOps.delete(spark, dir, col("k") < 100, Seq("k"))
    StatsManifest.write(spark, dir, Seq("k")) // full rebuild, new stats col set could differ
    assert(StatsManifest.scan(spark, dir).count() === 1900L)
  }

  test("physical OPTIMIZE / compactSmall after a delete never resurrect " +
      "tombstoned rows, and optimize reclaims the dead bytes") {
    val dir = mk("optphys")
    RowOps.delete(spark, dir, col("k") < 250, Seq("k"))
    graft.operators.Layout.optimize(spark, dir, Seq("k"),
      targetBytes = 1L << 26)
    assert(spark.read.parquet(dir).count() === 1750L) // plain reader too
    assert(StatsManifest.scan(spark, dir).count() === 1750L)
    assert(StatsManifest.removedLatest(spark, dir).isEmpty,
      "physical optimize deletes tombstoned bytes; write() trims the set")

    val dir2 = mk("cmpphys")
    RowOps.delete(spark, dir2, col("k") < 250, Seq("k"))
    graft.operators.Layout.compactSmall(spark, dir2, Seq("k"),
      targetBytes = 1L << 26, smallBytes = 1L << 26) // everything "small"
    // the tombstoned replaced files were NOT selected for compaction
    assert(StatsManifest.scan(spark, dir2).count() === 1750L)
  }

  test("deferDelete OPTIMIZE: atomic commit, snapshots survive the " +
      "rewrite, CDC nets the layout churn to zero, expire reclaims") {
    val dir = mk("optdefer")
    val vDel = RowOps.delete(spark, dir, col("k") < 250, Seq("k")).version
    graft.operators.Layout.optimize(spark, dir, Seq("k"),
      targetBytes = 1L << 26, deferDelete = true)
    val vOpt = StatsManifest.versions(spark, dir).last
    assert(vOpt === vDel + 1)
    // latest reads the clustered layout; plain parquet would see both —
    // manifest-routed readers only, as documented
    assert(StatsManifest.scan(spark, dir).count() === 1750L)
    // the snapshot BEFORE the optimize still reads (old bytes retained)
    assert(StatsManifest.scanAtVersion(spark, dir, vDel)._1
      .count() === 1750L)
    assert(StatsManifest.scanAtVersion(spark, dir, 1L)._1
      .count() === 2000L)
    // pure layout churn: the row-level changefeed is EMPTY
    assert(RowOps.changes(spark, dir, vDel, vOpt).count() === 0L)
    // retention reclaims every superseded file
    StatsManifest.expire(spark, dir, keep = 1)
    assert(StatsManifest.removedLatest(spark, dir).forall(k =>
      !physical(dir).contains(k)))
    assert(StatsManifest.scan(spark, dir).count() === 1750L)
  }

  test("deferDelete compactSmall: small tail compacts, snapshot of the " +
      "pre-compaction version still reads") {
    val dir = mk("cmpdefer")
    (5000 until 5100).map(i => (i.toLong, 0L)).toDF("k", "m")
      .repartition(4).write.mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k")) // v2: 12 files
    val (c, w) = graft.operators.Layout.compactSmall(spark, dir, Seq("k"),
      targetBytes = 1L << 26, smallBytes = 1L << 26,
      deferDelete = true)
    assert(c === 12 && w >= 1)
    assert(StatsManifest.scan(spark, dir).count() === 2100L)
    assert(StatsManifest.scanAtVersion(spark, dir, 2L)._1
      .count() === 2100L)
    assert(RowOps.changes(spark, dir, 2L, 3L).count() === 0L)
  }
}
