package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StatsManifest

/** Versioned manifest commits: every write/update lands as an immutable
  * `_graft_manifest/v%06d` directory via atomic stage+rename, readers
  * resolve the latest COMMITTED version (no half-written window),
  * losers of a concurrent commit race retry into the next slot, and
  * old versions serve SNAPSHOT reads (`scanAtVersion` — the table AS
  * OF that manifest) until `expire` reclaims them. */
class ManifestVersionsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def mk(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mver_").toString + "/t"
    (0 until 2000).map(i => (i.toLong, i % 7)).toDF("k", "m")
      .repartition(4).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    dir
  }

  test("write then update commit v1, v2; read() resolves latest, readAt() each") {
    val dir = mk()
    assert(StatsManifest.versions(spark, dir) === Seq(1L))
    // append two files + incremental update → v2
    (10000 until 11000).map(i => (i.toLong, i % 7)).toDF("k", "m")
      .repartition(2).write.mode("append").parquet(dir)
    val r = StatsManifest.update(spark, dir, Seq("k"))
    assert(r.reused === 4L && r.scanned === 2L)
    assert(StatsManifest.versions(spark, dir) === Seq(1L, 2L))
    assert(StatsManifest.read(spark, dir).size === 6) // latest = v2
    assert(StatsManifest.readAt(spark, dir, 1L).size === 4)
    assert(StatsManifest.readAt(spark, dir, 2L).size === 6)
    intercept[IllegalArgumentException] {
      StatsManifest.readAt(spark, dir, 9L)
    }
  }

  test("a commit that loses the version-slot race retries into the next slot") {
    val dir = mk()
    // simulate a racing writer that already took v000002
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir, "_graft_manifest/v000002"))
    StatsManifest.update(spark, dir, Seq("k"))
    // our commit skipped the occupied slot → v3 (v2 is the foreign dir)
    assert(StatsManifest.versions(spark, dir) === Seq(1L, 2L, 3L))
    assert(StatsManifest.read(spark, dir).size === 4) // latest real = v3
  }

  test("snapshot read: the table AS OF v1 — later appends invisible, still pruned, still metadata-only") {
    val dir = mk()
    (50000 until 51000).map(i => (i.toLong, 0)).toDF("k", "m")
      .coalesce(1).write.mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k"))

    // current scan sees everything
    assert(StatsManifest.scan(spark, dir).count() === 3000L)
    // snapshot at v1 sees exactly the original 2000 rows
    val (snap, idx) = StatsManifest.scanAtVersion(spark, dir, 1L)
    assert(snap.collect().length === 2000)
    assert(!snap.columns.isEmpty)
    // v1 stats still prune within the snapshot
    val (snap2, idx2) = StatsManifest.scanAtVersion(spark, dir, 1L)
    assert(snap2.where(col("k") >= 50000L).count() === 0L)
    assert(idx2.selected.get() === 0L && idx2.total.get() === 4L)
    // and a bare count over the snapshot folds metadata-only from v1
    val cnt = StatsManifest.scanAtVersion(spark, dir, 1L)._1
      .agg(count(lit(1)).as("n"))
    assert(cnt.queryExecution.optimizedPlan
      .collectFirst { case l: LocalRelation => l }.nonEmpty)
    assert(cnt.collect().head.getLong(0) === 2000L)
  }

  test("retention: expire keeps the newest versions; compaction breaks older snapshots loudly") {
    val dir = mk()
    (0 until 3).foreach { i =>
      (100000 + i * 100 until 100000 + i * 100 + 100)
        .map(j => (j.toLong, 0)).toDF("k", "m")
        .coalesce(1).write.mode("append").parquet(dir)
      StatsManifest.update(spark, dir, Seq("k"))
    }
    assert(StatsManifest.versions(spark, dir) === Seq(1L, 2L, 3L, 4L))
    // LAZY mode: v2..v4 are deltas folding onto the v1 checkpoint, so
    // nothing below their base may drop — zero-cost refusal
    assert(StatsManifest.expire(spark, dir, keep = 2, exact = false) === 0)
    assert(StatsManifest.versions(spark, dir) === Seq(1L, 2L, 3L, 4L))
    assert(StatsManifest.readAt(spark, dir, 3L).size === 6)
    // EXACT mode (default): the boundary delta retro-materializes into
    // a checkpoint, then exactly versions−keep drop
    assert(StatsManifest.expire(spark, dir, keep = 2) === 2)
    assert(StatsManifest.versions(spark, dir) === Seq(3L, 4L))
    intercept[IllegalArgumentException] {
      StatsManifest.readAt(spark, dir, 1L)
    }
    assert(StatsManifest.scanAtVersion(spark, dir, 3L)._1
      .collect().length === 2200)

    // OPTIMIZE rewrites the data files → v5; the v3 snapshot's files are
    // gone and the snapshot fails FAST, not silently partial
    graft.operators.Layout.optimize(spark, dir, Seq("k"),
      targetBytes = 1L << 26)
    assert(StatsManifest.scan(spark, dir).count() === 2300L)
    val e = intercept[IllegalArgumentException] {
      StatsManifest.scanAtVersion(spark, dir, 3L)
    }
    assert(e.getMessage.contains("no longer exist"))
  }

  test("history lists versions; format option `version` time-travels from SQL/DDL") {
    val dir = mk()
    (9000 until 9500).map(i => (i.toLong, 0)).toDF("k", "m")
      .coalesce(1).write.mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k"))

    val h = StatsManifest.history(spark, dir)
    assert(h.map(_.version) === Seq(1L, 2L))
    assert(h.map(_.files) === Seq(4L, 5L))
    assert(h.map(_.rows) === Seq(2000L, 2500L))
    assert(h.forall(_.committedAtMs > 0L))

    // generic-API time travel
    val asof = spark.read.format("graft-manifest")
      .option("version", "1").load(dir)
    assert(asof.count() === 2000L)
    assert(spark.read.format("graft-manifest").load(dir).count() === 2500L)
    // and through SQL DDL
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_asof
                 |USING `graft-manifest`
                 |OPTIONS (path '$dir', version '1')""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM t_asof WHERE k >= 9000")
      .collect().head.getLong(0) === 0L)
  }

  test("legacy unversioned manifest still resolves; the next update commits v1") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mver_leg_").toString + "/t"
    (0 until 1000).map(i => (i.toLong, i % 3)).toDF("k", "m")
      .coalesce(2).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    // rewrite the manifest into the PRE-VERSIONING layout: part files
    // directly under _graft_manifest
    val mDir = new Path(dir, "_graft_manifest")
    val fs = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vParts = fs.listStatus(new Path(mDir, "v000001"))
      .map(_.getPath).filter(_.getName.startsWith("part-"))
    vParts.foreach(p => fs.rename(p, new Path(mDir, p.getName)))
    fs.delete(new Path(mDir, "v000001"), true)

    assert(StatsManifest.versions(spark, dir).isEmpty)
    assert(StatsManifest.read(spark, dir).size === 2) // legacy fallback
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("k") < 0L).count() === 0L)
    assert(idx.selected.get() === 0L) // legacy stats still prune

    // an update on a legacy manifest reuses its entries and commits v1
    val r = StatsManifest.update(spark, dir, Seq("k"))
    assert(r.reused === 2L && r.scanned === 0L)
    assert(StatsManifest.versions(spark, dir) === Seq(1L))
  }
}
