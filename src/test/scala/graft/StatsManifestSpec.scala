package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Observe
import graft.operators.Layout
import graft.sources.StatsManifest
import graft.sources.StatsManifest.{ColStats, FileStats}

/** Stats-manifest FILE pruning (VERDICT r8 #1): LayoutSpec proved Spark
  * row-group-skips on parquet footers but never skips whole files; the
  * manifest + ManifestFileIndex is the missing layer. Pins here:
  * refutation logic on every supported predicate shape (pure unit
  * tests), then the real read path — planning-time files-read < total
  * on a NON-leading clustered column with oracle-equal results. */
class StatsManifestSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  // ---- refutation unit tests -------------------------------------- //

  private val a = AttributeReference("a", LongType)()
  private val s = AttributeReference("s", StringType)()
  private def fs(lo: Long, hi: Long, nonNull: Long = 10, rows: Long = 10) =
    FileStats(rows, Map("a" -> ColStats('L', lLo = lo, lHi = hi,
      nonNull = nonNull, hasRange = nonNull > 0)))
  private def may(e: Expression, f: FileStats): Boolean =
    StatsManifest.mayMatch(e, f)

  test("mayMatch refutes point/range predicates outside [min,max] and keeps the rest") {
    val f = fs(100, 200)
    assert(!may(EqualTo(a, Literal(99L)), f))
    assert(may(EqualTo(a, Literal(100L)), f))
    assert(may(EqualTo(Literal(150L), a), f))
    assert(!may(EqualTo(Literal(201L), a), f))
    assert(!may(GreaterThan(a, Literal(200L)), f))
    assert(may(GreaterThan(a, Literal(199L)), f))
    assert(!may(GreaterThanOrEqual(a, Literal(201L)), f))
    assert(may(GreaterThanOrEqual(a, Literal(200L)), f))
    assert(!may(LessThan(a, Literal(100L)), f))
    assert(may(LessThan(a, Literal(101L)), f))
    assert(!may(LessThanOrEqual(a, Literal(99L)), f))
    assert(may(LessThanOrEqual(a, Literal(100L)), f))
    // reversed operand order (lit op attr)
    assert(!may(GreaterThan(Literal(100L), a), f)) // 100 > a needs lo < 100
    assert(may(GreaterThan(Literal(101L), a), f))
    assert(!may(LessThan(Literal(200L), a), f)) // 200 < a needs hi > 200
    assert(may(LessThan(Literal(199L), a), f))
  }

  test("mayMatch: And narrows, Or widens, In checks any member") {
    val f = fs(100, 200)
    assert(!may(And(GreaterThan(a, Literal(150L)),
      LessThan(a, Literal(120L))), f) ||
      may(GreaterThan(a, Literal(150L)), f)) // And of two possibles stays possible
    assert(!may(And(EqualTo(a, Literal(50L)), IsNotNull(a)), f))
    assert(may(Or(EqualTo(a, Literal(50L)), EqualTo(a, Literal(150L))), f))
    assert(!may(Or(EqualTo(a, Literal(50L)), EqualTo(a, Literal(250L))), f))
    assert(may(In(a, Seq(Literal(1L), Literal(150L))), f))
    assert(!may(In(a, Seq(Literal(1L), Literal(2L))), f))
  }

  test("mayMatch: null bookkeeping — IsNull needs a null, EqualTo never matches an all-null file") {
    val withNulls = fs(100, 200, nonNull = 8, rows = 10)
    val noNulls = fs(100, 200, nonNull = 10, rows = 10)
    val allNull = FileStats(10, Map("a" -> ColStats('L', nonNull = 0)))
    assert(may(IsNull(a), withNulls))
    assert(!may(IsNull(a), noNulls))
    assert(may(IsNull(a), allNull))
    assert(!may(IsNotNull(a), allNull))
    assert(may(IsNotNull(a), withNulls))
    assert(!may(EqualTo(a, Literal(150L)), allNull))
    assert(!may(GreaterThan(a, Literal(0L)), allNull))
  }

  test("mayMatch: unknown shapes, missing stats and domain mismatches keep the file") {
    val f = fs(100, 200)
    val b = AttributeReference("b", LongType)() // no stats for b
    assert(may(EqualTo(b, Literal(5L)), f))
    // a + 1 = 5: not a bare attribute — conservative keep
    assert(may(EqualTo(Add(a, Literal(1L)), Literal(5L)), f))
    // double literal against long stats: Catalyst cast we can't see — keep
    assert(may(EqualTo(a, Literal(150.0)), f))
  }

  test("mayMatch: strings compare in UTF8 binary order; StartsWith prunes by truncated bounds") {
    val f = FileStats(10, Map("s" -> ColStats('S', sLo = "grape",
      sHi = "melon", nonNull = 10, hasRange = true)))
    def u(x: String) = Literal(org.apache.spark.unsafe.types.UTF8String
      .fromString(x), StringType)
    assert(may(EqualTo(s, u("kiwi")), f))
    assert(!may(EqualTo(s, u("apple")), f))
    assert(!may(EqualTo(s, u("peach")), f))
    assert(may(StartsWith(s, u("gr")), f))
    assert(may(StartsWith(s, u("me")), f))
    assert(!may(StartsWith(s, u("ap")), f))
    assert(!may(StartsWith(s, u("zz")), f))
  }

  // ---- the real read path ----------------------------------------- //

  test("zorderWrite + scan: planning-time file pruning on the NON-leading column, oracle-equal") {
    val li = graft.engine.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val P = 16
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_").toString + "/z"
    Layout.zorderWrite(li, Seq("l_orderkey", "l_partkey"), dir, P)

    val lpMax = li.agg(max("l_partkey")).collect().head.getLong(0)
    val cut = lpMax / 5 // partkey < 20% of domain — the non-leading column

    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    val got = scan.where(col("l_partkey") < cut)
      .agg(count(lit(1)), sum("l_quantity")).collect().head
    val want = spark.read.parquet(dir).where(col("l_partkey") < cut)
      .agg(count(lit(1)), sum("l_quantity")).collect().head
    assert(got === want) // oracle-equal results

    // the listing actually pruned: planning-time files < total
    assert(idx.total.get() === P.toLong, s"expected $P files")
    assert(idx.selected.get() * 2 <= idx.total.get(),
      s"manifest admitted ${idx.selected.get()} of ${idx.total.get()} " +
        s"files for l_partkey < $cut")

    // and Spark's own scan metric agrees (files read, not just listed)
    val df2 = StatsManifest.scan(spark, dir).where(col("l_partkey") < cut)
    df2.collect()
    val filesRead = Observe.nodeMetrics(df2).collectFirst {
      case (n, m, v) if n.contains("Scan") && m == "number of files read" => v
    }.getOrElse(fail("no files-read metric"))
    assert(filesRead === idx.selected.get())
  }

  test("scan with no filter, or a filter on an un-manifested column, reads every file") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_all_").toString + "/t"
    val df = (0 until 4000).map(i => (i.toLong, i % 7, s"r$i"))
      .toDF("k", "m", "txt")
    Layout.zorderWrite(df, Seq("k"), dir, 8)

    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    // collect, not count: a bare count() folds metadata-only and would
    // never touch the listing this test is about
    assert(scan.collect().length === 4000)
    assert(idx.selected.get() === idx.total.get())
    assert(idx.total.get() === 8L)

    // m has no manifest stats → conservative keep-all, same answer
    val (scan2, idx2) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan2.where(col("m") === 3).count() ===
      spark.read.parquet(dir).where(col("m") === 3).count())
    assert(idx2.selected.get() === idx2.total.get())
  }

  test("point predicate on the LEADING column and an impossible predicate") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_pt_").toString + "/t"
    val df = (0 until 8000).map(i => (i.toLong, (i * 37 % 8000).toLong))
      .toDF("x", "y")
    Layout.zorderWrite(df, Seq("x", "y"), dir, 16)

    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("x") === 1234L).count() === 1L)
    assert(idx.selected.get() < idx.total.get())

    // predicate outside the domain: every file refuted, zero tasks, no rows
    val (scan2, idx2) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan2.where(col("x") === -5L).count() === 0L)
    assert(idx2.selected.get() === 0L)
  }

  test("incremental update scans only new files, drops vanished ones, stays prune-correct") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_upd_").toString + "/t"
    val df1 = (0 until 4000).map(i => (i.toLong, i % 7)).toDF("k", "m")
    Layout.zorderWrite(df1, Seq("k"), dir, 4)

    // an append lands 2 new files with a disjoint key range
    (100000 until 102000).map(i => (i.toLong, i % 7)).toDF("k", "m")
      .repartition(2).write.mode("append").parquet(dir)

    val r = StatsManifest.update(spark, dir, Seq("k"))
    assert(r === StatsManifest.UpdateResult(reused = 4, scanned = 2,
      dropped = 0))
    // the refreshed manifest covers all 6 files and prunes on BOTH ranges
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("k") >= 100000L).count() === 2000L)
    assert(idx.total.get() === 6L)
    assert(idx.selected.get() === 2L) // only the appended files match

    // a vanished file (compaction/cleanup) drops from the manifest with
    // zero rescanning of the survivors
    val appended = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet"))
      .maxBy(_.lastModified) // one of the appended high-range files
    assert(appended.delete())
    val r2 = StatsManifest.update(spark, dir, Seq("k"))
    assert(r2.scanned === 0L && r2.dropped === 1L && r2.reused === 5L)
    val (scan2, idx2) = StatsManifest.scanWithIndex(spark, dir)
    // a bare count() now folds metadata-only (ManifestMetadataOnlySpec)
    // and never lists files — the filtered count exercises the listing
    assert(scan2.where(col("k") >= 0L).count() ===
      spark.read.parquet(dir).count())
    assert(idx2.total.get() === 5L)

    // a full overwrite deletes dir + manifest wholesale → rebuild path
    df1.repartition(3).write.mode("overwrite").parquet(dir)
    val r3 = StatsManifest.update(spark, dir, Seq("k"))
    assert(r3 === StatsManifest.UpdateResult(reused = 0, scanned = 3,
      dropped = 0))
    val (scan3, idx3) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan3.where(col("k") >= 100000L).count() === 0L)
    assert(idx3.selected.get() === 0L) // refuted everywhere, zero tasks
  }

  test("optimize: in-place zorder rewrite compacts small files, content intact, manifest fresh") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_optimize_").toString + "/t"
    // 16 small unordered files — the "day of appends" shape
    val df = (0 until 8000).map(i => ((i * 2654435761L) % 8000, i.toLong))
      .toDF("a", "b")
    df.repartition(16).write.parquet(dir)

    val (before, after) = graft.operators.Layout.optimize(
      spark, dir, Seq("a", "b"), targetBytes = 1L << 26)
    assert(before === 16)
    assert(after < before)

    // content multiset unchanged
    def fp(d: org.apache.spark.sql.DataFrame): Long = d
      .agg(expr("bit_xor(xxhash64(a, b))")).collect().head.getLong(0)
    assert(spark.read.parquet(dir).count() === 8000L)
    assert(fp(spark.read.parquet(dir)) === fp(df))
    // no stragglers from the swap
    val names = new java.io.File(dir).listFiles.map(_.getName)
    assert(!names.exists(_.startsWith(".graft_trash")))
    // manifest matches the rewritten layout and prunes
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("a") === 12345678L).count() === 0L)
    assert(idx.selected.get() === 0L)
    assert(idx.total.get() === after.toLong)
  }

  test("compactSmall: only the small tail rewrites; big files and their manifest entries untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact_").toString + "/t"
    // 2 big files (20k rows each ≫ 10 KB) + 8 tiny ones (the streaming-
    // ingest shape: one small file per batch)
    (0 until 40000).map(i => (i.toLong, i.toString * 3)).toDF("k", "pad")
      .repartitionByRange(2, col("k")).write.parquet(dir)
    (100000 until 100800).map(i => (i.toLong, "x")).toDF("k", "pad")
      .repartition(8).write.mode("append").parquet(dir)
    graft.sources.StatsManifest.write(spark, dir, Seq("k"))
    val bigNames = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet") && f.length >= 10240)
      .map(_.getName).toSet
    assert(bigNames.size === 2)

    val (compacted, written) = graft.operators.Layout.compactSmall(
      spark, dir, Seq("k"), targetBytes = 1L << 20, smallBytes = 10240L)
    assert(compacted === 8 && written >= 1 && written < 8)

    // big files physically untouched; content multiset unchanged
    val namesAfter = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(bigNames.subsetOf(namesAfter))
    assert(!namesAfter.exists(_.startsWith(".graft_trash")))
    assert(spark.read.parquet(dir).count() === 40800L)

    // manifest reconciled incrementally: a fresh manifest version, both
    // key ranges still prune, nothing stale
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("k") >= 100000L).count() === 800L)
    assert(idx.selected.get() === written.toLong,
      s"compacted-range predicate should touch only the $written new " +
        s"files, got ${idx.selected.get()}")
    val (scan2, idx2) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan2.where(col("k") < 1000L).count() === 1000L)
    assert(idx2.selected.get() === 1L) // just the first big file
  }

  test("Hive-partitioned layout: partition pruning, file pruning and update compose") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_part_").toString + "/t"
    // 3 partitions × sorted k runs; dynamic-partition writes reuse the
    // SAME part-file names across partition dirs — the path-keyed
    // manifest must not collide
    val df = (0 until 9000)
      .map(i => (i % 3, i.toLong, (i * 31 % 997).toLong))
      .toDF("p", "k", "v")
    // explicit numPartitions: AQE would otherwise coalesce the tiny
    // shuffle to one output file per partition dir and leave nothing
    // for the manifest to prune
    df.repartitionByRange(9, col("p"), col("k"))
      .sortWithinPartitions("k")
      .write.partitionBy("p").parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))

    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    // partition filter + data filter: directories prune natively, files
    // prune via the manifest, answer matches the plain read
    val pred = col("p") === 1 && col("k") < 600L
    val got = scan.where(pred).agg(count(lit(1)), sum("v")).collect().head
    val want = spark.read.parquet(dir).where(pred)
      .agg(count(lit(1)), sum("v")).collect().head
    assert(got === want)
    val totalFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles).getOrElse(Array.empty[java.io.File])
          .toSeq.flatMap(walk)
      walk(new java.io.File(dir))
        .count(f => f.getName.endsWith(".parquet") &&
          !f.getAbsolutePath.contains("_graft_manifest"))
    }
    // the listing saw only partition p=1's files, and of those only the
    // low-k ones survived the manifest
    assert(idx.total.get() < totalFiles.toLong,
      s"partition pruning missing: listed ${idx.total.get()} of $totalFiles")
    assert(idx.selected.get() < idx.total.get(),
      s"manifest admitted ${idx.selected.get()} of ${idx.total.get()}")

    // incremental update after appending one new partition: only the new
    // partition's files scan
    (9000 until 12000).map(i => (3, i.toLong, 7L)).toDF("p", "k", "v")
      .coalesce(1).write.mode("append").partitionBy("p").parquet(dir)
    val r = StatsManifest.update(spark, dir, Seq("k"))
    assert(r.scanned === 1L && r.dropped === 0L && r.reused > 0L)
    val (scan2, _) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan2.where(col("p") === 3).count() === 3000L)
  }

  test("format(\"graft-manifest\") reaches the pruned read path from the source API") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_fmt_").toString + "/t"
    val df = (0 until 4000).map(i => (i.toLong, i % 7)).toDF("k", "m")
    Layout.zorderWrite(df, Seq("k"), dir, 8)

    val viaFormat = spark.read.format("graft-manifest").load(dir)
    assert(viaFormat.where(col("k") === 123L).count() === 1L)
    assert(viaFormat.count() === 4000L)
    // the relation really is the manifest-pruned one: the scan's file
    // index shows up in the plan as ManifestFileIndex
    val plan = viaFormat.where(col("k") === 123L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ManifestFileIndex"), plan)
    // and SQL DDL resolves the same short name
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW mfmt
                 |USING `graft-manifest` OPTIONS (path '$dir')""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM mfmt WHERE k < 100")
      .collect().head.getLong(0) === 100L)
  }

  test("format(\"graft-manifest\") WRITE path: overwrite clusters+manifests, append updates incrementally") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_wfmt_").toString + "/t"
    val df = (0 until 6000).map(i => (i.toLong, (i * 37 % 6000).toLong))
      .toDF("a", "b")
    df.write.format("graft-manifest")
      .option("zorderBy", "a,b").option("numFiles", "8")
      .mode("overwrite").save(dir)
    assert(StatsManifest.versions(spark, dir) === Seq(1L))
    // the written layout prunes on BOTH clustered columns
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("b") === 74L).count() ===
      df.where(col("b") === 74L).count())
    assert(idx.selected.get() < idx.total.get())
    assert(idx.total.get() === 8L)

    // append: new files only are scanned, manifest commits v2
    (100000 until 101000).map(i => (i.toLong, i.toLong)).toDF("a", "b")
      .coalesce(1).write.format("graft-manifest")
      .option("statsCols", "a,b").mode("append").save(dir)
    assert(StatsManifest.versions(spark, dir) === Seq(1L, 2L))
    val (scan2, idx2) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan2.where(col("a") >= 100000L).count() === 1000L)
    assert(idx2.selected.get() === 1L && idx2.total.get() === 9L)

    // r10 CTAS semantics: ErrorIfExists refuses to clobber an existing
    // manifested table; Ignore is a silent no-op on one
    intercept[IllegalArgumentException] {
      df.write.format("graft-manifest").option("statsCols", "a")
        .mode("error").save(dir)
    }
    df.write.format("graft-manifest").option("statsCols", "a")
      .mode("ignore").save(dir)
    assert(StatsManifest.versions(spark, dir) === Seq(1L, 2L),
      "Ignore on an existing table must not commit anything")
    assert(StatsManifest.scan(spark, dir).count() === scan2.count())
  }

  test("manifest dir is invisible to plain readers; manifest survives re-write") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_inv_").toString + "/t"
    val df = (0 until 1000).map(i => (i.toLong, i % 13)).toDF("k", "v")
    Layout.zorderWrite(df, Seq("k"), dir, 4)
    // a plain read neither sees the manifest as data nor double-counts
    assert(spark.read.parquet(dir).count() === 1000L)
    // overwrite (e.g. a re-OPTIMIZE): manifest reflects the new layout
    Layout.zorderWrite(df.withColumn("k", col("k") + 100000L),
      Seq("k"), dir, 4)
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("k") >= 100000L).count() === 1000L)
    assert(idx.total.get() === 4L)
  }
}
