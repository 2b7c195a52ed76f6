package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StatsManifest

/** Per-file BLOOM pruning in the stats manifest — the equality
  * complement to min/max. The motivating shape: a high-cardinality
  * column (digest, hash-scattered id) whose per-file [min,max] spans
  * the whole domain, so range stats refute NOTHING for a point lookup
  * — every file still reads. A per-file bloom over xxhash64(value)
  * refutes "definitely not in this file" and the lookup plans ~1 file
  * out of N. Pins: bit-level write/check consistency, the pruned read
  * path vs a range-only control, IN lists, bloom-only non-orderable
  * (binary) columns, and incremental update carrying blooms. */
class BloomManifestSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  // ---- unit: aggregator bytes and membership agree ----------------- //

  test("BloomAgg set-bits and Bloom.mayContain read the same positions") {
    val agg = StatsManifest.BloomAgg(4096)
    val present = (0 until 100).map(i => i * 2654435761L)
    var buf = agg.zero
    present.foreach(h => buf = agg.reduce(buf, h))
    val bytes = agg.finish(buf)
    assert(present.forall(StatsManifest.Bloom.mayContain(bytes, _)))
    // absent probes: fpp at n=100, m=4096, k=5 is ~2e-5 — allow 5%
    val absent = (1 to 1000).map(i => i * 912382166093L + 7)
      .filterNot(present.contains)
    val fp = absent.count(StatsManifest.Bloom.mayContain(bytes, _))
    assert(fp <= absent.size / 20, s"$fp false positives of ${absent.size}")
    // merge = OR: split the inserts over two buffers
    val (l, r) = present.splitAt(50)
    var b1 = agg.zero; l.foreach(h => b1 = agg.reduce(b1, h))
    var b2 = agg.zero; r.foreach(h => b2 = agg.reduce(b2, h))
    val merged = agg.finish(agg.merge(b1, b2))
    assert(merged.sameElements(bytes))
  }

  // ---- the read path: bloom prunes where ranges cannot -------------- //

  /** 4000 rows, digest = md5(id) — hash-scattered, so every one of the
    * 16 files' [min,max] spans ~the full hex domain. */
  private def writeDigestTable(bloom: Boolean): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloom_").toString + "/t"
    val df = spark.range(4000)
      .select(col("id"), md5(col("id").cast("string")).as("digest"))
      .repartition(16)
    df.write.parquet(dir)
    if (bloom)
      StatsManifest.write(spark, dir, Seq("digest"), Seq("digest"))
    else
      StatsManifest.write(spark, dir, Seq("digest"))
    dir
  }

  private def digestOf(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("point lookup on a hash-scattered column: ranges keep ~all files, bloom keeps ~1") {
    // control: range-only manifest — every file's range admits the probe
    val ctl = writeDigestTable(bloom = false)
    val (scanC, idxC) = StatsManifest.scanWithIndex(spark, ctl)
    val want = digestOf(1234L)
    assert(scanC.where(col("digest") === want).count() === 1L)
    assert(idxC.selected.get() > idxC.total.get() / 2,
      s"control should NOT prune: ${idxC.selected.get()}/${idxC.total.get()}")

    // bloom manifest: the same lookup plans ~1 file
    val dir = writeDigestTable(bloom = true)
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    val got = scan.where(col("digest") === want)
      .select("id").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(1234L))
    assert(idx.total.get() === 16L)
    assert(idx.selected.get() <= 3L,
      s"bloom admitted ${idx.selected.get()} of 16 files")

    // absent value: refuted ~everywhere, empty result
    val (scan2, idx2) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan2.where(col("digest") === digestOf(999999L)).count() === 0L)
    assert(idx2.selected.get() <= 2L)

    // IN over values from (at most) two files keeps ≤ 2 + fp files
    val (scan3, idx3) = StatsManifest.scanWithIndex(spark, dir)
    val hits = scan3
      .where(col("digest").isin(digestOf(7L), digestOf(3888L)))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(hits.toSeq === Seq(7L, 3888L))
    assert(idx3.selected.get() <= 4L)
  }

  test("bloom-only column of a non-orderable type (binary) still prunes equality") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloom_bin_").toString + "/t"
    spark.range(2000)
      .select(col("id"),
        sha2(col("id").cast("string"), 256).cast("binary").as("payload"))
      .repartition(8)
      .write.parquet(dir)
    // no orderable stats possible for binary — bloom-only entry (dom 'B')
    StatsManifest.write(spark, dir, Nil, Seq("payload"))

    val probe = java.security.MessageDigest.getInstance("SHA-256")
      .digest("42".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.getBytes("UTF-8")
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    val got = scan.where(col("payload") === lit(probe))
      .select("id").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(42L))
    assert(idx.total.get() === 8L)
    assert(idx.selected.get() <= 2L,
      s"bloom admitted ${idx.selected.get()} of 8 files")

    // range predicates on a bloom-only column can't refute — keep all
    val (scan4, idx4) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan4.where(col("payload") > lit(Array[Byte](0x00))).count() ===
      spark.read.parquet(dir).where(col("payload") > lit(Array[Byte](0x00)))
        .count())
    assert(idx4.selected.get() === idx4.total.get())
  }

  test("incremental update carries blooms and blooms the fresh files") {
    val dir = writeDigestTable(bloom = true)
    // append 2 files of new ids; update scans ONLY those
    spark.range(100000, 102000)
      .select(col("id"), md5(col("id").cast("string")).as("digest"))
      .repartition(2).write.mode("append").parquet(dir)
    val r = StatsManifest.update(spark, dir, Seq("digest"),
      bloomCols = Seq("digest"))
    assert(r.reused === 16L && r.scanned === 2L && r.dropped === 0L)

    // old key: still ~1 of (now) 18 files
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("digest") === digestOf(1234L)).count() === 1L)
    assert(idx.total.get() === 18L && idx.selected.get() <= 3L)
    // appended key: found, and only the fresh files (+fp) admit it
    val (scan2, idx2) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan2.where(col("digest") === digestOf(100777L)).count() === 1L)
    assert(idx2.selected.get() <= 3L)

    // a bloom-less update call has a different manifest column set →
    // falls back to a full rewrite rather than mixing schemas
    val r2 = StatsManifest.update(spark, dir, Seq("digest"))
    assert(r2.reused === 0L && r2.scanned === 18L)
    val (scan3, idx3) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan3.where(col("digest") === digestOf(1234L)).count() === 1L)
    assert(idx3.selected.get() > idx3.total.get() / 2) // ranges only now
  }
}
