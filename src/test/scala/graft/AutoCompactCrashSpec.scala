package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.sources.StatsManifest

/** Crash-safety of commit-time auto-compaction's RENAME-FIRST protocol
  * (Layout.autoCompact): the packed `ac-*` files move to their final
  * paths BEFORE the manifest commit, so the live manifest never names a
  * file absent from its final path — a crash anywhere in the swap
  * leaves the table fully readable at the old snapshot. The flip side,
  * pinned here: the crash-left unmanifested `ac-*` orphans must be
  * (a) invisible to manifest-routed readers, (b) refused by BOTH
  * reconciliation paths (update's delta and write's full rebuild —
  * adopting one would duplicate rows that still live in the originals),
  * (c) harmless to a re-run (which converges exactly-once), and
  * (d) reclaimed by VACUUM (StatsManifest.vacuumOrphans) without
  * touching committed `ac-*` files. */
class AutoCompactCrashSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Simulate the crash-left state: a parquet file full of DUPLICATE
    * rows (schema-identical to the table) renamed into the table dir
    * under the compactor's `ac-*` namespace, unmanifested — exactly
    * what a kill between autoCompact's renames and its commit leaves. */
  private def plantOrphan(dir: String, sub: Option[String] = None): Path = {
    val fs = fsOf(dir)
    val tmp = Files.createTempDirectory("graft_ac_orphan_").toString + "/o"
    (0L until 50L).toDF("k").coalesce(1).write.parquet(tmp)
    val part = fs.listStatus(new Path(tmp))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    val parent = sub.fold(new Path(dir))(s => new Path(dir, s))
    fs.mkdirs(parent)
    val dst = new Path(parent, s"ac-crash-${part.getName}")
    require(fs.rename(part, dst))
    fs.makeQualified(dst)
  }

  test("crash between rename and commit: orphan ac-* files are invisible, " +
      "never adopted by reconciliation, and VACUUM reclaims them") {
    val dir = Files.createTempDirectory("graft_ac_crash_").toString + "/t"
    (0L until 1000L).toDF("k").repartition(10).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    val fs = fsOf(dir)

    val orphan = plantOrphan(dir)
    val orphanKey = StatsManifest.fileKey(orphan)

    // (a) manifest-routed scan never sees the orphan's duplicate rows
    assert(StatsManifest.scan(spark, dir).count() === 1000L)

    // (b1) incremental reconcile refuses to adopt it (the append sink's
    // per-batch path) — and keeps reconciling everything else
    StatsManifest.update(spark, dir, Seq("k"))
    assert(!StatsManifest.read(spark, dir).contains(orphanKey))
    assert(StatsManifest.scan(spark, dir).count() === 1000L)

    // (b2) a FULL rebuild refuses too
    StatsManifest.write(spark, dir, Seq("k"))
    assert(!StatsManifest.read(spark, dir).contains(orphanKey))
    assert(StatsManifest.scan(spark, dir).count() === 1000L)

    // (c) the re-run converges exactly-once: the policy re-fires on the
    // still-live originals and ignores the orphan
    val (compacted, written) = Layout.autoCompact(spark, dir, minFiles = 4)
    assert(compacted === 10 && written >= 1)
    val t = StatsManifest.scan(spark, dir)
    assert(t.count() === 1000L)
    assert(t.select("k").distinct().count() === 1000L)
    val committedAc = StatsManifest.read(spark, dir).keySet
      .filter(k => new Path(k).getName.startsWith("ac-"))
    assert(committedAc.nonEmpty, "compaction committed ac-* files")

    // (d) VACUUM reclaims the orphan, spares the committed ac-* files
    // (minAge 0: the test IS the crashed compactor)
    assert(StatsManifest.vacuumOrphans(spark, dir, minAgeMs = 0L) === 1)
    assert(!fs.exists(orphan))
    committedAc.foreach(k => assert(fs.exists(new Path(k)),
      s"vacuumOrphans deleted committed file $k"))
    assert(StatsManifest.scan(spark, dir).count() === 1000L)

    // a LIVE compactor's window is protected by the age gate: a fresh
    // orphan under the default minAge survives
    val fresh = plantOrphan(dir)
    assert(StatsManifest.vacuumOrphans(spark, dir) === 0)
    assert(fs.exists(fresh))
  }

  test("partitioned auto-compaction: rename-first packs each partition " +
      "dir in place, partition values and pruning survive") {
    val dir = Files.createTempDirectory("graft_ac_part_").toString + "/t"
    (0 until 900).map(i => (i % 3, i.toLong)).toDF("p", "k")
      .repartitionByRange(6, col("k"))
      .write.partitionBy("p").parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    val before = StatsManifest.read(spark, dir).size
    assert(before >= 9, s"fixture wants >=3 files per partition, got $before")

    val (compacted, written) = Layout.autoCompact(spark, dir, minFiles = 2)
    assert(compacted === before && written === 3) // one packed file per dir

    val t = StatsManifest.scan(spark, dir)
    assert(t.count() === 900L)
    assert(t.select("k").distinct().count() === 900L)
    assert(t.where(col("p") === 1).count() === 300L)
    // the packed files live under their partition dirs, ac-* named
    val live = StatsManifest.read(spark, dir).keySet
    assert(live.size === 3)
    live.foreach { k =>
      val p = new Path(k)
      assert(p.getName.startsWith("ac-"), k)
      assert(p.getParent.getName.startsWith("p="), k)
    }
    // planning still prunes by partition dir
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("p") === 2).count() === 300L)
    assert(idx.selected.get() === 1L,
      s"partition pruning admitted ${idx.selected.get()} of 3")
  }

  test("a LOST commit race cleans up its renamed files — zero residue") {
    val dir = Files.createTempDirectory("graft_ac_race_").toString + "/t"
    (0L until 400L).toDF("k").repartition(8).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    val v0 = StatsManifest.latestVersion(spark, dir).get
    // age the analyzed version out of retention — the conflict check
    // inside commitFileOps throws AFTER autoCompact renamed its files in
    (0 until 3).foreach { i =>
      val extra = Seq(1000L + i).toDF("k").coalesce(1)
      extra.write.mode("append").parquet(dir)
      StatsManifest.update(spark, dir, Seq("k"))
    }
    StatsManifest.expire(spark, dir, keep = 1)
    val fs = fsOf(dir)
    intercept[java.util.ConcurrentModificationException] {
      Layout.autoCompact(spark, dir, minFiles = 4,
        expectedVersion = Some(v0))
    }
    // the losing compactor removed every file it had renamed in
    def walk(d: Path): Seq[Path] = fs.listStatus(d).toSeq.flatMap { st =>
      if (st.getPath.getName.startsWith("_") ||
        st.getPath.getName.startsWith(".")) Nil
      else if (st.isDirectory) walk(st.getPath)
      else Seq(st.getPath)
    }
    val acLeft = walk(new Path(dir))
      .filter(_.getName.startsWith("ac-"))
    assert(acLeft.isEmpty, s"lost race left ${acLeft.length} ac-* files")
    assert(StatsManifest.scan(spark, dir).count() === 403L)
    // and the table still compacts cleanly afterwards
    val (c2, w2) = Layout.autoCompact(spark, dir, minFiles = 4)
    assert(c2 >= 8 && w2 >= 1)
    assert(StatsManifest.scan(spark, dir).count() === 403L)
  }
}
