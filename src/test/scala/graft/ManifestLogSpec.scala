package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RowOps, StatsManifest}

/** The manifest LOG layer (round 11): incremental commits write O(delta)
  * versions — added entries as a tiny parquet, deleted keys in
  * `_delta.txt` — and every `spark.graft.manifest.checkpointInterval`-th
  * slot folds the chain into a full checkpoint, so a long-lived table
  * (a streaming sink commits per micro-batch; 10⁵ versions are routine)
  * commits and plans FLAT: no O(files) carried-entry rewrite per commit,
  * no O(versions) directory listing per read (`latestVersion` gallops
  * from the `_latest_hint` file in O(log) `exists` probes).
  * Reference analogue: the version log is this engine's coordination
  * substrate the way the reference's JobGraph/checkpoint barrier
  * machinery is its — and it must stay O(1)-ish per operation.
  * Design kinship: Delta Lake's `_last_checkpoint` + log-segment
  * compaction (public docs), reimplemented from scratch on plain files. */
class ManifestLogSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def fsOf(dir: String) = new Path(dir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def withInterval[T](n: Int)(body: => T): T = {
    val key = "spark.graft.manifest.checkpointInterval"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, n.toString)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def mk(rows: Int = 400): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mlog_").toString + "/t"
    (0 until rows).map(i => (i.toLong, i % 7)).toDF("k", "m")
      .repartition(2).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    dir
  }

  test("updates commit DELTA versions; every interval-th slot folds a " +
      "full checkpoint; reads resolve identically across the chain") {
    withInterval(4) {
      val dir = mk()
      val fs = fsOf(dir)
      (0 until 6).foreach { i =>
        (10000 + i * 100 until 10000 + i * 100 + 100)
          .map(j => (j.toLong, 0)).toDF("k", "m")
          .coalesce(1).write.mode("append").parquet(dir)
        StatsManifest.update(spark, dir, Seq("k"))
      }
      assert(StatsManifest.versions(spark, dir) === (1L to 7L))
      // v2, v3 and v5..v7 are deltas; v1 (full write) and v4 (slot %
      // interval == 0) are checkpoints
      def isDelta(v: Long) =
        fs.exists(new Path(dir, f"_graft_manifest/v$v%06d/_delta.txt"))
      assert((1L to 7L).filter(isDelta) === Seq(2L, 3L, 5L, 6L, 7L))
      // the folded view at every version matches the expected file count
      (1L to 7L).foreach { v =>
        assert(StatsManifest.readAt(spark, dir, v).size === 2 + (v - 1))
      }
      // pruning still works through the fold: a point outside every
      // appended file's range keeps only matching files
      val (df, idx) = StatsManifest.scanWithIndex(spark, dir)
      assert(df.where(col("k") === 10305L).count() === 1L)
      assert(idx.selected.get() === 1L && idx.total.get() === 8L)
    }
  }

  test("row ops commit deltas too: tombstones and adds ride _delta.txt " +
      "+ a tiny add parquet, and fold correctly across a checkpoint") {
    withInterval(3) {
      val dir = mk()
      RowOps.delete(spark, dir, col("k") < 50, Seq("k")) // v2 delta
      RowOps.update(spark, dir, col("k") === 100L,
        Seq("m" -> lit(42)), Seq("k")) // v3 checkpoint (3 % 3 == 0)
      RowOps.delete(spark, dir, col("k") === 200L, Seq("k")) // v4 delta
      assert(StatsManifest.scan(spark, dir).count() === 349L)
      assert(StatsManifest.scan(spark, dir)
        .where(col("m") === 42).count() === 1L)
      // snapshots at every version still read exactly
      assert(StatsManifest.scanAtVersion(spark, dir, 1L)._1
        .count() === 400L)
      assert(StatsManifest.scanAtVersion(spark, dir, 2L)._1
        .count() === 350L)
      assert(StatsManifest.scanAtVersion(spark, dir, 4L)._1
        .count() === 349L)
      // CDC across the delta/checkpoint boundary nets exactly
      assert(RowOps.changes(spark, dir, 1L, 4L)
        .where(col("_change_type") === "delete").count() === 52L)
    }
  }

  test("deltaOf serves a delta version's adds/deletes without a fold; " +
      "adds-minus-deletes equals the snapshot diff; checkpoints None") {
    withInterval(8) {
      val dir = mk() // v1: checkpoint (first versioned commit)
      import spark.implicits._
      (1000 until 1050).map(i => (i.toLong, i % 7)).toDF("k", "m")
        .coalesce(1).write.mode("append").parquet(dir)
      StatsManifest.update(spark, dir, Seq("k")) // v2: delta, 1 add
      RowOps.delete(spark, dir, col("k") < 100, Seq("k")) // v3: delta
      assert(StatsManifest.deltaOf(spark, dir, 1L).isEmpty,
        "a checkpoint slot answers None (fold fallback)")
      val Some((a2, d2)) = StatsManifest.deltaOf(spark, dir, 2L)
      assert(a2.size === 1 && d2.isEmpty)
      val Some((a3, d3)) = StatsManifest.deltaOf(spark, dir, 3L)
      // the rewrite added replacement file(s) and deleted the touched
      // originals; adds -- deletes must equal the snapshot key diff
      val k2 = StatsManifest.readAt(spark, dir, 2L).keySet
      val k3 = StatsManifest.readAt(spark, dir, 3L).keySet
      assert(a3.keySet -- d3 === k3 -- k2)
      assert(d3.nonEmpty, "the delete tombstoned at least one entry")
      // expired version → loud
      intercept[IllegalArgumentException] {
        StatsManifest.deltaOf(spark, dir, 99L)
      }
    }
  }

  test("latestVersion gallops from the hint; stale, torn and foreign " +
      "hints all degrade safely") {
    val dir = mk()
    val fs = fsOf(dir)
    val hint = new Path(dir, "_graft_manifest/_latest_hint")
    (0 until 3).foreach { i =>
      (20000 + i until 20001 + i).map(j => (j.toLong, 0)).toDF("k", "m")
        .coalesce(1).write.mode("append").parquet(dir)
      StatsManifest.update(spark, dir, Seq("k"))
    }
    assert(StatsManifest.latestVersion(spark, dir) === Some(4L))
    assert(fs.exists(hint))
    // stale hint (an older version): the gallop walks up to the truth
    val out = fs.create(hint, true); out.write("1".getBytes); out.close()
    assert(StatsManifest.latestVersion(spark, dir) === Some(4L))
    // garbage hint: falls back to the listing
    val out2 = fs.create(hint, true); out2.write("zzz".getBytes); out2.close()
    assert(StatsManifest.latestVersion(spark, dir) === Some(4L))
    // hint pointing at an expired/foreign version: falls back
    val out3 = fs.create(hint, true); out3.write("99".getBytes); out3.close()
    assert(StatsManifest.latestVersion(spark, dir) === Some(4L))
    // missing hint entirely: falls back
    fs.delete(hint, false)
    assert(StatsManifest.latestVersion(spark, dir) === Some(4L))
  }

  test("exact expire retro-materializes the boundary delta; lazy expire " +
      "drops only below the newest checkpoint") {
    withInterval(100) { // no auto-checkpoint inside this test
      val dir = mk()
      (0 until 4).foreach { i =>
        (30000 + i until 30001 + i).map(j => (j.toLong, 0)).toDF("k", "m")
          .coalesce(1).write.mode("append").parquet(dir)
        StatsManifest.update(spark, dir, Seq("k")) // v2..v5, all deltas
      }
      // lazy: v1 is the only checkpoint → nothing may drop
      assert(StatsManifest.expire(spark, dir, keep = 2, exact = false) === 0)
      assert(StatsManifest.versions(spark, dir) === (1L to 5L))
      // exact: boundary v4 materializes, 1..3 drop, v4/v5 still read
      assert(StatsManifest.expire(spark, dir, keep = 2) === 3)
      assert(StatsManifest.versions(spark, dir) === Seq(4L, 5L))
      assert(StatsManifest.readAt(spark, dir, 4L).size === 5)
      assert(StatsManifest.readAt(spark, dir, 5L).size === 6)
      assert(StatsManifest.scan(spark, dir).count() === 404L)
      // the materialized checkpoint keeps serving as a fold base
      (40000 until 40001).map(j => (j.toLong, 0)).toDF("k", "m")
        .coalesce(1).write.mode("append").parquet(dir)
      StatsManifest.update(spark, dir, Seq("k")) // v6 delta on v4's cp
      assert(StatsManifest.scan(spark, dir).count() === 405L)
    }
  }

  test("manifest entries carry the file length; the stream source plans " +
      "splits without per-file getFileStatus") {
    val dir = mk()
    val fs = fsOf(dir)
    val stats = StatsManifest.read(spark, dir)
    assert(stats.nonEmpty)
    stats.foreach { case (k, st) =>
      assert(st.len === fs.getFileStatus(new Path(k)).getLen,
        s"manifest flen of $k must equal the physical length")
    }
  }
}
