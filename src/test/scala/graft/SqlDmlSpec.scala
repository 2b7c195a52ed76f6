package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RowOps, StatsManifest}

/** SQL DML statements — DELETE FROM / UPDATE / MERGE INTO — over a
  * catalog table backed by the graft-manifest format: the injected
  * resolution rule rewrites Spark's parsed DML plans into RowOps
  * commands before the v1-relation check rejects them, the relation
  * cache refreshes by path, and the table's version log (snapshots,
  * CDC) records the statements like any Scala-API op. */
class SqlDmlSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def mkTable(name: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_sqldml_$name").toString + "/t"
    (0 until 1000).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "m")
      .repartitionByRange(4, col("k")).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    dir
  }

  test("DELETE FROM ... WHERE runs through RowOps; the catalog table " +
      "reads the new version") {
    val dir = mkTable("dml_del")
    spark.sql("DELETE FROM dml_del WHERE k < 100")
    assert(spark.table("dml_del").count() === 900L)
    assert(spark.sql("SELECT COUNT(*) FROM dml_del WHERE k < 100")
      .as[Long].head() === 0L)
    // the statement committed a real version: snapshot + CDC exist,
    // and the version log records each commit's operation kind
    assert(StatsManifest.versions(spark, dir) === Seq(1L, 2L))
    assert(RowOps.changes(spark, dir, 1L, 2L).count() === 100L)
    assert(StatsManifest.history(spark, dir).map(_.op) ===
      Seq("overwrite", "delete"))
    spark.sql("DROP TABLE dml_del")
  }

  test("UPDATE ... SET ... WHERE, including an expression of the row") {
    mkTable("dml_upd")
    spark.sql("UPDATE dml_upd SET m = -k WHERE k % 250 = 0")
    val got = spark.sql(
      "SELECT k, m FROM dml_upd WHERE k % 250 = 0 ORDER BY k")
      .as[(Long, Long)].collect()
    assert(got === Array((0L, 0L), (250L, -250L), (500L, -500L),
      (750L, -750L)))
    assert(spark.table("dml_upd").count() === 1000L)
    spark.sql("DROP TABLE dml_upd")
  }

  test("MERGE INTO upsert (UPDATE SET * / INSERT *) and matched-DELETE") {
    mkTable("dml_mrg")
    Seq((10L, -1L), (5000L, -2L)).toDF("k", "m")
      .createOrReplaceTempView("dml_src")
    spark.sql("""MERGE INTO dml_mrg t USING dml_src s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val t = spark.table("dml_mrg")
    assert(t.count() === 1001L)
    assert(t.where(col("k") === 10L).select("m").as[Long].head() === -1L)
    assert(t.where(col("k") === 5000L).select("m").as[Long].head() === -2L)
    // matched-delete: erase the keys in the source
    spark.sql("""MERGE INTO dml_mrg t USING dml_src s ON t.k = s.k
                |WHEN MATCHED THEN DELETE""".stripMargin)
    val t2 = spark.table("dml_mrg")
    assert(t2.count() === 999L)
    assert(t2.where(col("k").isin(10L, 5000L)).count() === 0L)
    spark.sql("DROP TABLE dml_mrg")
  }

  test("OPTIMIZE ... ZORDER BY and VACUUM ... RETAIN as SQL statements") {
    val dir = mkTable("dml_opt")
    // fragment the table first so OPTIMIZE has something to do
    spark.sql("DELETE FROM dml_opt WHERE k < 50")
    spark.sql("UPDATE dml_opt SET m = 0 WHERE k BETWEEN 100 AND 120")
    val res = spark.sql("OPTIMIZE dml_opt ZORDER BY (k, m)").collect()
    assert(res.length === 1 && res.head.getInt(1) >= 1)
    assert(spark.table("dml_opt").count() === 950L)
    // snapshots survived the SQL OPTIMIZE (deferDelete commit)
    assert(StatsManifest.scanAtVersion(spark, dir, 1L)._1
      .count() === 1000L)
    val vac = spark.sql("VACUUM dml_opt RETAIN 1 VERSIONS").collect()
    assert(vac.head.getInt(0) >= 2 && vac.head.getLong(1) === 1L)
    assert(spark.table("dml_opt").count() === 950L)
    // compact-only form parses and runs (may be a no-op on few files)
    spark.sql("OPTIMIZE dml_opt").collect()
    assert(spark.table("dml_opt").count() === 950L)
    // time-based retention: the window contract a deployment states.
    // Everything committed seconds ago sits inside a 1-hour window...
    val vh = spark.sql("VACUUM dml_opt RETAIN 1 HOURS").collect()
    assert(vh.head.getInt(0) === 0, "fresh commits stay retained")
    // ...and a zero-day window keeps only the latest version
    spark.sql("VACUUM dml_opt RETAIN 0 DAYS").collect()
    assert(StatsManifest.versions(spark, dir).length === 1)
    assert(spark.table("dml_opt").count() === 950L)
    // DESCRIBE HISTORY reads the version log through SQL — including
    // each commit's operation kind (r11: the _op.txt sidecar)
    val h = spark.sql("DESCRIBE HISTORY dml_opt").collect()
    assert(h.length >= 1 && h.last.getLong(3) === 950L)
    // VACUUM dropped the early versions; the retained tail still
    // carries each commit's kind
    val ops = h.map(_.getString(1)).toSeq
    assert(ops.contains("optimize"), ops)
    assert(ops.forall(_.nonEmpty), ops)
    spark.sql("DROP TABLE dml_opt")
  }

  /** (k, m, v) table for partial-SET tests. */
  private def mkTable3(name: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_sqldml_$name").toString + "/t"
    (0 until 1000).map(i => (i.toLong, (i % 7).toLong, i.toLong * 10))
      .toDF("k", "m", "v")
      .repartitionByRange(4, col("k")).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    dir
  }

  test("static-partition INSERT OVERWRITE replaces exactly the " +
      "partition under ONE commit; INTO appends into it; dynamic " +
      "specs replace exactly the partitions present in the data") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sqldml_iop").toString + "/t"
    (0 until 300).map(i => (i.toLong, (i % 3))).toDF("k", "p")
      .repartition(3, col("p")).write.partitionBy("p").parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    spark.sql("DROP TABLE IF EXISTS dml_iop")
    spark.sql(s"CREATE TABLE dml_iop USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    val vBefore = StatsManifest.versions(spark, dir).last
    spark.sql("INSERT OVERWRITE dml_iop PARTITION (p = 1) " +
      "SELECT id AS k FROM range(5000, 5010)")
    // p=1's 100 rows replaced by the 10 fresh ones; other partitions
    // untouched; the whole swap is ONE manifest version
    assert(spark.sql("SELECT count(*) FROM dml_iop WHERE p = 1")
      .as[Long].head() === 10L)
    assert(spark.sql("SELECT min(k) FROM dml_iop WHERE p = 1")
      .as[Long].head() === 5000L)
    assert(spark.sql("SELECT count(*) FROM dml_iop WHERE p <> 1")
      .as[Long].head() === 200L)
    assert(StatsManifest.versions(spark, dir).last === vBefore + 1,
      "delete-partition + insert must be ONE commit")
    assert(StatsManifest.opAt(spark, dir, vBefore + 1)
      .contains("replace"))
    // static-partition INSERT INTO appends into the partition
    spark.sql("INSERT INTO dml_iop PARTITION (p = 2) " +
      "SELECT id AS k FROM range(9000, 9005)")
    assert(spark.sql("SELECT count(*) FROM dml_iop WHERE p = 2")
      .as[Long].head() === 105L)
    // CDC for the overwrite version: 100 deletes + 10 inserts
    val ch = RowOps.changes(spark, dir, vBefore, vBefore + 1)
    assert(ch.groupBy("_change_type").count()
      .as[(String, Long)].collect().toSet ===
      Set(("delete", 100L), ("insert", 10L)))
    // DYNAMIC partition spec (r13): replace exactly the partitions
    // present in the incoming data — p ∈ {0, 1} here — leave p = 2
    // (105 rows after the INTO above) untouched; ONE 'replace' commit
    val vDyn = StatsManifest.versions(spark, dir).last
    spark.sql("INSERT OVERWRITE dml_iop PARTITION (p) " +
      "SELECT id AS k, CAST(id % 2 AS INT) AS p FROM range(6000, 6020)")
    assert(spark.sql("SELECT count(*) FROM dml_iop WHERE p = 0")
      .as[Long].head() === 10L)
    assert(spark.sql("SELECT count(*) FROM dml_iop WHERE p = 1")
      .as[Long].head() === 10L)
    assert(spark.sql("SELECT count(*) FROM dml_iop WHERE p = 2")
      .as[Long].head() === 105L)
    assert(StatsManifest.versions(spark, dir).last === vDyn + 1,
      "dynamic overwrite must be ONE commit")
    assert(StatsManifest.opAt(spark, dir, vDyn + 1).contains("replace"))
    // Hive's own edge: an EMPTY incoming set replaces nothing
    val total = spark.table("dml_iop").count()
    spark.sql("INSERT OVERWRITE dml_iop PARTITION (p) " +
      "SELECT id AS k, CAST(id AS INT) AS p FROM range(0)")
    assert(spark.table("dml_iop").count() === total)
    // a dynamic column that is NOT a partition column is a loud error
    val e = intercept[Exception] {
      spark.sql("INSERT OVERWRITE dml_iop PARTITION (k) " +
        "SELECT id AS k, CAST(0 AS INT) AS p FROM range(3)")
    }
    assert(e.getMessage.contains("partition columns"), e.getMessage)
    spark.sql("DROP TABLE dml_iop")
  }

  test("OPTIMIZE ... WHERE compacts exactly the spec'd partitions " +
      "(r13); non-partition columns and ZORDER+WHERE refuse") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sqldml_optw").toString + "/t"
    (0 until 1200).map(i => (i.toLong, (i % 3)))
      .toDF("k", "p").repartitionByRange(12, col("k"))
      .write.partitionBy("p").parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    spark.sql("DROP TABLE IF EXISTS dml_optw")
    spark.sql(s"CREATE TABLE dml_optw USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    def filesOf(part: Int): Set[String] = StatsManifest
      .read(spark, dir).keySet.filter(_.contains(s"p=$part"))
    val before0 = filesOf(0); val before2 = filesOf(2)
    assert(filesOf(1).size >= 3, "fixture wants several files per part")
    val r = spark.sql("OPTIMIZE dml_optw WHERE p = 1").collect().head
    assert(r.getInt(0) >= 3 && r.getInt(1) === 1,
      s"scoped compaction rewrote ${r.getInt(0)} -> ${r.getInt(1)}")
    // exactly p=1 packed; the other partitions' files untouched
    assert(filesOf(1).size === 1)
    assert(filesOf(1).head.contains("/ac-"))
    assert(filesOf(0) === before0 && filesOf(2) === before2)
    assert(spark.table("dml_optw").count() === 1200L)
    assert(spark.sql("SELECT count(*) FROM dml_optw WHERE p = 1")
      .as[Long].head() === 400L)
    // guard rails
    val e1 = intercept[Exception] {
      spark.sql("OPTIMIZE dml_optw WHERE k = 5")
    }
    assert(e1.getMessage.contains("partition column"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("OPTIMIZE dml_optw ZORDER BY (k) WHERE p = 1")
    }
    assert(e2.getMessage.contains("ZORDER"), e2.getMessage)
    spark.sql("DROP TABLE dml_optw")
  }

  test("graft_files('t'): file-level observability straight off the " +
      "manifest — live files, partitions, rows, bytes, versions, stats") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sqldml_files").toString + "/t"
    (0 until 300).map(i => (i.toLong, (i % 3))).toDF("k", "p")
      .repartition(3, col("p")).write.partitionBy("p").parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    spark.sql("DROP TABLE IF EXISTS dml_files")
    spark.sql(s"CREATE TABLE dml_files USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    // v2: rewrites p=1's file (keeps its k >= 150 half)
    spark.sql("DELETE FROM dml_files WHERE k % 3 = 1 AND k < 150")
    val f = spark.sql("SELECT * FROM graft_files('dml_files')")
    assert(f.schema.fieldNames.toSeq === Seq("file", "partition",
      "rows", "bytes", "version_added", "stats"))
    val live = StatsManifest.read(spark, dir)
    assert(f.count() === live.size.toLong, "one row per LIVE file")
    assert(f.agg(sum("rows")).as[Long].head() ===
      spark.table("dml_files").count())
    assert(f.where(col("bytes") <= 0L).count() === 0L)
    // partitions surface as their Hive subpath; the rewrite's file
    // carries the DELETE's version
    assert(f.select("partition").distinct().as[String].collect()
      .toSet === Set("p=0", "p=1", "p=2"))
    assert(f.where(col("version_added") === 2L).count() >= 1L,
      "the delete's replacement file must read version 2")
    // stats ride TYPED (r13): one struct field per stat, native types
    // — range predicates compose in SQL without get_json_object
    assert(f.schema("stats").dataType
      .isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(f.where(col("stats.cnt_k") === col("rows")).count() ===
      f.count(), "k is non-null everywhere: cnt == rows per file")
    val hiFiles = spark.sql("SELECT count(*) FROM " +
      "graft_files('dml_files') WHERE stats.min_k >= 150")
      .as[Long].head()
    assert(hiFiles >= 1L, "typed min_k range predicate must compose")
    assert(f.agg(min(col("stats.min_k"))).as[Long].head() >= 0L)
    spark.sql("DROP TABLE dml_files")
  }

  test("MERGE partial SET updates ONLY the assigned columns — a " +
      "name-identical partial list is a partial update, not a replace") {
    mkTable3("dml_part")
    // source carries a CHANGED m alongside the v it assigns: a row
    // replace (the old isIdentity bug) would smuggle m = -9 in
    Seq((10L, -9L, 111L), (20L, -9L, 222L)).toDF("k", "m", "v")
      .createOrReplaceTempView("dml_psrc")
    spark.sql("""MERGE INTO dml_part t USING dml_psrc s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    val got = spark.sql(
      "SELECT k, m, v FROM dml_part WHERE k IN (10, 20) ORDER BY k")
      .as[(Long, Long, Long)].collect()
    assert(got === Array((10L, 3L, 111L), (20L, 6L, 222L)),
      "unassigned column m must keep its target value")
    spark.sql("DROP TABLE dml_part")
  }

  test("MERGE full clause matrix: conditional matched UPDATE + DELETE, " +
      "conditional INSERT, NOT MATCHED BY SOURCE — first-true-wins") {
    mkTable3("dml_full")
    // matched keys 0,100,200,…,900; unmatched source keys 5000,5001
    val src = (0 until 10).map(i => (i * 100L, -1L, i.toLong)) ++
      Seq((5000L, -1L, 50L), (5001L, -1L, 3L))
    src.toDF("k", "m", "v").createOrReplaceTempView("dml_fsrc")
    spark.sql("""MERGE INTO dml_full t USING dml_fsrc s ON t.k = s.k
      |WHEN MATCHED AND s.v < 3 THEN UPDATE SET m = t.m + s.v
      |WHEN MATCHED AND s.v < 6 THEN UPDATE SET v = -t.v
      |WHEN MATCHED THEN DELETE
      |WHEN NOT MATCHED AND s.v >= 10 THEN INSERT (k, v) VALUES (s.k, s.v)
      |WHEN NOT MATCHED BY SOURCE AND t.k >= 990 THEN DELETE
      |""".stripMargin)
    val t = spark.table("dml_full")
    // matched, v<3 (keys 0,100,200): m updated, v kept
    assert(spark.sql("SELECT k, m, v FROM dml_full WHERE k IN (0,100,200)" +
      " ORDER BY k").as[(Long, Long, Long)].collect() ===
      Array((0L, 0L, 0L), (100L, 3L, 1000L), (200L, 6L, 2000L)))
    // matched, 3<=v<6 (keys 300,400,500): v negated — FIRST true clause
    // wins, the later DELETE must not fire
    assert(spark.sql("SELECT k, m, v FROM dml_full WHERE k IN (300,400,500)" +
      " ORDER BY k").as[(Long, Long, Long)].collect() ===
      Array((300L, 6L, -3000L), (400L, 1L, -4000L), (500L, 3L, -5000L)))
    // matched, v>=6 (keys 600..900): deleted
    assert(t.where(col("k").isin(600L, 700L, 800L, 900L)).count() === 0L)
    // conditional INSERT: 5000 (v=50) inserted with NULL m; 5001 (v=3)
    // skipped by its condition
    assert(spark.sql("SELECT k, v FROM dml_full WHERE k = 5000")
      .as[(Long, Long)].collect() === Array((5000L, 50L)))
    assert(spark.sql("SELECT m FROM dml_full WHERE k = 5000")
      .collect().head.isNullAt(0))
    assert(t.where(col("k") === 5001L).count() === 0L)
    // by-source DELETE: unmatched target rows k in 990..999 gone;
    // k=900 was matched (claimed by the matched DELETE path, not this)
    assert(t.where(col("k") >= 990L && col("k") < 1000L).count() === 0L)
    // everything else untouched: 1000 - 4 deleted(matched 600..900) -
    // 10 deleted(by-source 990..999) + 1 insert = 987
    assert(t.count() === 987L)
    spark.sql("DROP TABLE dml_full")
  }

  test("MERGE by-source UPDATE rewrites only unmatched rows; CDC nets " +
      "the clause matrix exactly") {
    val dir = mkTable3("dml_bsrc")
    Seq((0L, 0L, 0L)).toDF("k", "m", "v")
      .createOrReplaceTempView("dml_bs")
    spark.sql("""MERGE INTO dml_bsrc t USING dml_bs s ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET m = -100
      |WHEN NOT MATCHED BY SOURCE AND t.k < 3 THEN UPDATE SET m = -200
      |""".stripMargin)
    val got = spark.sql(
      "SELECT k, m FROM dml_bsrc WHERE k < 5 ORDER BY k")
      .as[(Long, Long)].collect()
    assert(got === Array((0L, -100L), (1L, -200L), (2L, -200L),
      (3L, 3L), (4L, 4L)))
    // CDC: exactly the 3 updated rows as delete+insert pairs
    val cdc = RowOps.changes(spark, dir, 1L, 2L)
    assert(cdc.count() === 6L)
    assert(cdc.where(col("_change_type") === "insert").count() === 3L)
    spark.sql("DROP TABLE dml_bsrc")
  }

  test("INSERT INTO / INSERT OVERWRITE commit the manifest — inserted " +
      "rows are visible to manifest-routed readers immediately") {
    val dir = mkTable("dml_ins")
    spark.sql("INSERT INTO dml_ins VALUES (5000, -1), (5001, -2)")
    assert(spark.table("dml_ins").count() === 1002L)
    assert(spark.sql("SELECT m FROM dml_ins WHERE k = 5000")
      .as[Long].head() === -1L)
    // the commit is versioned: the pre-insert snapshot still reads
    assert(StatsManifest.versions(spark, dir) === Seq(1L, 2L))
    assert(StatsManifest.scanAtVersion(spark, dir, 1L)._1
      .count() === 1000L)
    // named-column insert: unassigned columns go NULL
    spark.sql("INSERT INTO dml_ins (k) VALUES (6000)")
    val r = spark.sql("SELECT k, m FROM dml_ins WHERE k = 6000").collect()
    assert(r.length === 1 && r.head.getLong(0) === 6000L &&
      r.head.isNullAt(1))
    // INSERT ... SELECT composes; arity mismatch fails loudly
    spark.sql("INSERT INTO dml_ins SELECT k + 10000, m FROM dml_ins " +
      "WHERE k >= 5000")
    assert(spark.table("dml_ins").count() === 1006L)
    intercept[Exception] {
      spark.sql("INSERT INTO dml_ins SELECT k FROM dml_ins LIMIT 1")
    }
    // INSERT OVERWRITE replaces the table and rebuilds the manifest
    spark.sql("INSERT OVERWRITE dml_ins VALUES (1, 10), (2, 20)")
    assert(spark.sql("SELECT k, m FROM dml_ins ORDER BY k")
      .as[(Long, Long)].collect() === Array((1L, 10L), (2L, 20L)))
    // DML composes on top of the overwritten table
    spark.sql("UPDATE dml_ins SET m = 30 WHERE k = 2")
    assert(spark.sql("SELECT m FROM dml_ins WHERE k = 2")
      .as[Long].head() === 30L)
    spark.sql("DROP TABLE dml_ins")
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF resolve " +
      "manifested snapshots; out-of-retention and pre-history fail") {
    val dir = mkTable("dml_tt")
    spark.sql("DELETE FROM dml_tt WHERE k < 100") // v2
    Thread.sleep(1200) // separate v2/v3 commit wall times measurably
    spark.sql("DELETE FROM dml_tt WHERE k < 200") // v3
    assert(spark.sql("SELECT COUNT(*) FROM dml_tt VERSION AS OF 1")
      .as[Long].head() === 1000L)
    assert(spark.sql("SELECT COUNT(*) FROM dml_tt VERSION AS OF 2")
      .as[Long].head() === 900L)
    assert(spark.table("dml_tt").count() === 800L)
    // a timestamped read resolves to the newest commit at or before it
    val h = StatsManifest.history(spark, dir)
    val t2 = java.time.Instant.ofEpochMilli(
      h.find(_.version == 2L).get.committedAtMs)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM dml_tt TIMESTAMP AS OF '$t2'")
      .as[Long].head() === 900L)
    // before the first commit: loud error naming the retention window
    val e0 = intercept[Exception] {
      spark.sql("SELECT COUNT(*) FROM dml_tt TIMESTAMP AS OF " +
        "'1999-01-01 00:00:00'").collect()
    }
    assert(e0.getMessage.contains("no retained version"))
    // vacuum, then the expired version errors
    StatsManifest.expire(spark, dir, keep = 1)
    intercept[Exception] {
      spark.sql("SELECT COUNT(*) FROM dml_tt VERSION AS OF 1").collect()
    }
    // a non-graft relation keeps Spark's own time-travel error
    Seq((1L, 1L)).toDF("k", "m").createOrReplaceTempView("dml_tt_plain")
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM dml_tt_plain VERSION AS OF 1").collect()
    }
    assert(!e1.getMessage.contains("graft"), e1.getMessage)
    spark.sql("DROP TABLE dml_tt")
  }

  test("graft_changes TVF: the row-level changefeed is SQL-reachable") {
    val dir = mkTable("dml_cdc")
    spark.sql("DELETE FROM dml_cdc WHERE k < 50") // v2
    spark.sql("UPDATE dml_cdc SET m = -1 WHERE k = 500") // v3
    val all = spark.sql(
      "SELECT * FROM graft_changes('dml_cdc', 1, 3) ORDER BY " +
        "_commit_version, _change_type, k")
    assert(all.columns.toSeq === Seq("k", "m", "_change_type",
      "_commit_version"))
    assert(all.where(col("_commit_version") === 2L).count() === 50L)
    assert(all.where(col("_commit_version") === 3L).count() === 2L)
    // to-version defaults to latest; joins/aggregates compose over it
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_changes('dml_cdc', 2)")
      .as[Long].head() === 2L)
    assert(RowOps.changes(spark, dir, 1L, 3L).count() === 52L)
    // TIMESTAMP bounds: resolve to the newest version committed at or
    // before the instant (same rule as TIMESTAMP AS OF); mixable with
    // version bounds, and '3' (pure digits) still reads as a version
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_changes('dml_cdc', 1, '2099-01-01')")
      .as[Long].head() === 52L)
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_changes('dml_cdc', 1, '3')")
      .as[Long].head() === 52L)
    val e0 = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_changes('dml_cdc', '1901-01-01', 3)")
    }
    assert(e0.getMessage.contains("no retained version"))
    // non-graft target fails loudly
    Seq((1L, 1L)).toDF("k", "m").createOrReplaceTempView("dml_cdc_plain")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_changes('dml_cdc_plain', 1, 2)")
        .collect()
    }
    assert(e.getMessage.contains("not a graft-manifest table"))
    spark.sql("DROP TABLE dml_cdc")
  }

  test("uncorrelated subqueries in DELETE/UPDATE conditions: scalar, " +
      "IN, NOT IN, EXISTS; correlated stays a loud error") {
    mkTable("dml_subq")
    Seq(100L, 200L, 300L).toDF("kk").createOrReplaceTempView("dml_keys")
    // IN (SELECT …): the GDPR erasure shape
    spark.sql(
      "DELETE FROM dml_subq WHERE k IN (SELECT kk FROM dml_keys)")
    assert(spark.table("dml_subq").count() === 997L)
    assert(spark.sql("SELECT COUNT(*) FROM dml_subq WHERE k IN " +
      "(100, 200, 300)").as[Long].head() === 0L)
    // scalar subquery in an UPDATE condition and SET value
    spark.sql("UPDATE dml_subq SET m = (SELECT MAX(kk) FROM dml_keys) " +
      "WHERE k > (SELECT MAX(kk) FROM dml_keys) + 695")
    assert(spark.sql("SELECT m FROM dml_subq WHERE k = 999")
      .as[Long].head() === 300L)
    assert(spark.sql("SELECT COUNT(*) FROM dml_subq WHERE m = 300")
      .as[Long].head() === 4L) // k in 996..999
    // NOT IN and uncorrelated EXISTS
    spark.sql("DELETE FROM dml_subq WHERE k >= 990 AND " +
      "k NOT IN (SELECT kk FROM dml_keys)")
    assert(spark.table("dml_subq").count() === 987L)
    spark.sql("DELETE FROM dml_subq WHERE k < 5 AND " +
      "EXISTS (SELECT 1 FROM dml_keys WHERE kk = 100)")
    assert(spark.table("dml_subq").count() === 982L)
    spark.sql("DROP TABLE dml_subq")
  }

  test("CORRELATED subqueries in DELETE/UPDATE WHERE lower onto the " +
      "join machinery: EXISTS, NOT EXISTS, IN, scalar compare") {
    val dir = mkTable("dml_corr")
    Seq((100L, 1L), (200L, 2L), (300L, 3L), (10000L, 9L))
      .toDF("kk", "grp").createOrReplaceTempView("dml_corr_s")
    // correlated EXISTS — the classic erasure-by-reference shape
    spark.sql("DELETE FROM dml_corr WHERE EXISTS " +
      "(SELECT 1 FROM dml_corr_s s WHERE s.kk = dml_corr.k)")
    assert(spark.table("dml_corr").count() === 997L)
    assert(spark.sql("SELECT COUNT(*) FROM dml_corr WHERE k IN " +
      "(100, 200, 300)").as[Long].head() === 0L)
    // the statement committed one real version with CDC
    assert(RowOps.changes(spark, dir,
      StatsManifest.versions(spark, dir).init.last,
      StatsManifest.versions(spark, dir).last).count() === 3L)
    // correlated NOT EXISTS mixed with a plain conjunct (NOT EXISTS
    // is true for every k except the source keys)
    spark.sql("DELETE FROM dml_corr WHERE k >= 995 AND NOT EXISTS " +
      "(SELECT 1 FROM dml_corr_s s WHERE s.kk = dml_corr.k)")
    assert(spark.table("dml_corr").count() === 992L)
    // correlated UPDATE: scalar-compare correlation in the WHERE, a
    // plain expression of the row in the SET
    spark.sql("UPDATE dml_corr SET m = -1 WHERE k < " +
      "(SELECT MIN(s.grp) FROM dml_corr_s s WHERE s.kk = dml_corr.k * 100)")
    // k*100 ∈ {100,200,300} → k ∈ {1,2,3}; k < grp ⇒ k=1 (grp 1: 1<1
    // false)… k=1 grp=1 false, k=2 grp=2 false, k=3 grp=3 false — use
    // <= to hit all three
    assert(spark.sql("SELECT COUNT(*) FROM dml_corr WHERE m = -1")
      .as[Long].head() === 0L)
    spark.sql("UPDATE dml_corr SET m = -1 WHERE k <= " +
      "(SELECT MIN(s.grp) FROM dml_corr_s s WHERE s.kk = dml_corr.k * 100)")
    assert(spark.sql("SELECT k FROM dml_corr WHERE m = -1 ORDER BY k")
      .as[Long].collect() === Array(1L, 2L, 3L))
    // correlated IN: delete rows whose m appears among their group's
    // source grps (m = k%7; source kk = k*100)
    spark.sql("DELETE FROM dml_corr WHERE m IN " +
      "(SELECT s.grp FROM dml_corr_s s WHERE s.kk = dml_corr.k * 100)")
    // after the UPDATE above, k∈{1,2,3} have m=-1, so no row matches
    // via m; re-point: k=9? kk=900 not in source. Expect 0 deletions
    assert(spark.table("dml_corr").count() === 992L)
    // correlated subqueries in MERGE clause conditions AND SET values
    // (r12: the lookup lowering — Catalyst decorrelates per distinct
    // referenced combination)
    spark.sql("MERGE INTO dml_corr t USING " +
      "(SELECT grp AS k, kk FROM dml_corr_s) s ON t.k = s.k " +
      "WHEN MATCHED AND EXISTS (SELECT 1 FROM dml_corr_s x WHERE " +
      "x.kk = t.k * 100) THEN UPDATE SET m = " +
      "(SELECT MAX(x.grp) + 100 FROM dml_corr_s x WHERE x.kk = t.k * 100)")
    // matched t.k ∈ {1,2,3,9}; the condition holds for k ∈ {1,2,3}
    // (kk = k·100 exists); each SET reads its own correlated scalar
    assert(spark.sql("SELECT k, m FROM dml_corr WHERE m > 100 ORDER BY k")
      .as[(Long, Long)].collect() ===
      Array((1L, 101L), (2L, 102L), (3L, 103L)))
    // correlated condition on a MERGE DELETE clause
    spark.sql("MERGE INTO dml_corr t USING " +
      "(SELECT grp AS k, kk FROM dml_corr_s) s ON t.k = s.k " +
      "WHEN MATCHED AND EXISTS (SELECT 1 FROM dml_corr_s x WHERE " +
      "x.kk = t.k * 100) THEN DELETE")
    assert(spark.table("dml_corr").count() === 989L)
    assert(spark.sql("SELECT COUNT(*) FROM dml_corr WHERE k IN (1,2,3)")
      .as[Long].head() === 0L)
    spark.sql("DROP TABLE dml_corr")
  }

  test("correlated DML NULL-ref guard: a satisfying row with NULL in " +
      "a referenced column fails loudly instead of being skipped") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sqldml_corrnull").toString + "/t"
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10L), Row(2L, 20L), Row(null, 30L))),
      StructType(Seq(StructField("k", LongType), StructField("m", LongType))))
      .coalesce(1).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("m"))
    spark.sql("DROP TABLE IF EXISTS dml_corrnull")
    spark.sql(s"CREATE TABLE dml_corrnull USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    Seq(1L).toDF("kk").createOrReplaceTempView("dml_corrnull_s")
    // k IS NULL OR EXISTS(...) is TRUE for the NULL-k row — the join
    // lowering cannot address it; must fail loudly, not skip
    val e = intercept[Exception] {
      spark.sql("DELETE FROM dml_corrnull WHERE k IS NULL OR EXISTS " +
        "(SELECT 1 FROM dml_corrnull_s s WHERE s.kk = dml_corrnull.k)")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NULL")), msgs(e).mkString)
    // nothing was committed
    assert(spark.table("dml_corrnull").count() === 3L)
    // with the IS NOT NULL conjunct the lowering applies cleanly
    spark.sql("DELETE FROM dml_corrnull WHERE k IS NOT NULL AND EXISTS " +
      "(SELECT 1 FROM dml_corrnull_s s WHERE s.kk = dml_corrnull.k)")
    assert(spark.table("dml_corrnull").count() === 2L)
    spark.sql("DROP TABLE dml_corrnull")
  }

  test("DESCRIBE DETAIL, CTAS, and the timestampAsOf reader option") {
    // CTAS: the write half of the source API through SQL DDL
    val ctasDir = java.nio.file.Files
      .createTempDirectory("graft_sqldml_ctas").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS dml_ctas")
    spark.sql(s"""CREATE TABLE dml_ctas USING `graft-manifest`
      |OPTIONS (path '$ctasDir', statsCols 'k')
      |AS SELECT id AS k, id % 7 AS m FROM RANGE(1000)""".stripMargin)
    assert(spark.table("dml_ctas").count() === 1000L)
    assert(StatsManifest.versions(spark, ctasDir).nonEmpty,
      "CTAS must commit a manifest, not just land files")
    // DML composes on the CTAS table
    spark.sql("DELETE FROM dml_ctas WHERE k < 100")
    assert(spark.table("dml_ctas").count() === 900L)
    // DESCRIBE DETAIL: one-row operational summary
    val d = spark.sql("DESCRIBE DETAIL dml_ctas").collect().head
    assert(d.getString(0) === "graft-manifest")
    assert(d.getLong(2) === 2L) // current_version (CTAS=1, DELETE=2)
    assert(d.getLong(5) === 900L, d.toString) // num_rows
    assert(d.getLong(6) > 0L) // size_bytes
    // timestampAsOf reader option: newest commit ≤ ts; v1 readable
    val h = StatsManifest.history(spark, ctasDir)
    val t1 = java.time.Instant.ofEpochMilli(
      h.find(_.version == 1L).get.committedAtMs)
    Thread.sleep(5)
    assert(spark.read.format("graft-manifest")
      .option("timestampAsOf", t1.toString)
      .load(ctasDir).count() === 1000L)
    intercept[Exception] {
      spark.read.format("graft-manifest")
        .option("timestampAsOf", "1999-01-01T00:00:00Z")
        .load(ctasDir).count()
    }
    spark.sql("DROP TABLE dml_ctas")
  }

  test("timestampAsOf agrees with TIMESTAMP AS OF (session-zone Cast) " +
      "and parses negative-offset forms; CTAS refuses non-empty dirs") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sqldml_tz").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS dml_tz")
    spark.sql(s"""CREATE TABLE dml_tz USING `graft-manifest`
      |OPTIONS (path '$dir', statsCols 'k')
      |AS SELECT id AS k FROM RANGE(10)""".stripMargin)
    Thread.sleep(5)
    spark.sql("DELETE FROM dml_tz WHERE k < 5")
    val t1 = StatsManifest.commitTimes(spark, dir)
      .find(_._1 == 1L).get._2
    // a timestamp between v1 and v2, expressed three ways — UTC 'Z',
    // an explicit NEGATIVE offset (previously threw DateTimeParse), and
    // a bare local timestamp (previously mis-read as UTC): all three
    // must resolve to v1 through BOTH surfaces
    val inst = java.time.Instant.ofEpochMilli(t1 + 2)
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    val forms = Seq(
      inst.toString,
      inst.atZone(java.time.ZoneId.of("-05:00")).toOffsetDateTime.toString,
      inst.atZone(zone).toLocalDateTime.toString.replace('T', ' '))
    for (ts <- forms) {
      assert(spark.read.format("graft-manifest")
        .option("timestampAsOf", ts).load(dir).count() === 10L,
        s"reader option at $ts")
      assert(spark.sql(
        s"SELECT * FROM dml_tz TIMESTAMP AS OF '$ts'").count() === 10L,
        s"SQL time travel at $ts")
    }
    // ErrorIfExists (CTAS) must refuse a directory holding ANY
    // pre-existing content, not only a manifested table
    val plain = java.nio.file.Files
      .createTempDirectory("graft_sqldml_plain").toString + "/t"
    Seq((1L, 2L)).toDF("a", "b").write.parquet(plain)
    spark.sql("DROP TABLE IF EXISTS dml_clobber")
    val e = intercept[Exception] {
      spark.sql(s"""CREATE TABLE dml_clobber USING `graft-manifest`
        |OPTIONS (path '$plain', statsCols 'k')
        |AS SELECT id AS k FROM RANGE(10)""".stripMargin)
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage)
      .getOrElse("")).toLowerCase.contains("non-empty"), e.getMessage)
    // …and through the direct writer API, where Spark's own CTAS guard
    // doesn't run — the provider's ErrorIfExists check is the only line
    val e2 = intercept[Exception] {
      Seq((9L, 9L)).toDF("a", "b").write.format("graft-manifest")
        .option("statsCols", "a").mode("errorifexists").save(plain)
    }
    assert(e2.getMessage.contains("not empty"), e2.getMessage)
    assert(spark.read.parquet(plain).count() === 1L,
      "pre-existing data must be untouched")
    spark.sql("DROP TABLE dml_tz")
  }

  test("maintenance statements on a non-graft table fall through to " +
      "the delegate parser (coexistence with foreign OPTIMIZE/VACUUM)") {
    val plainDir = java.nio.file.Files
      .createTempDirectory("graft_sqldml_coex").toString + "/t"
    Seq((1L, 1L)).toDF("k", "m").write.parquet(plainDir)
    spark.sql("DROP TABLE IF EXISTS dml_coex")
    spark.sql(s"CREATE TABLE dml_coex USING parquet " +
      s"OPTIONS (path '$plainDir')")
    // the hook must NOT claim these: the delegate chain (vanilla Spark
    // here; Delta's identical syntax in a mixed deployment) owns them —
    // so the error is the DELEGATE's parse error, never our
    // 'not a graft-manifest table'
    for (stmt <- Seq("OPTIMIZE dml_coex ZORDER BY (k)",
        "OPTIMIZE dml_coex", "VACUUM dml_coex RETAIN 3 VERSIONS")) {
      val e = intercept[Exception] { spark.sql(stmt) }
      assert(!e.getMessage.contains("graft-manifest"), s"$stmt: claimed " +
        s"a foreign table instead of delegating: ${e.getMessage}")
      assert(e.isInstanceOf[
        org.apache.spark.sql.catalyst.parser.ParseException],
        s"$stmt: expected the delegate's parse error, got $e")
    }
    // an unknown table also delegates (the delegate's missing-table /
    // parse error, not ours)
    val e2 = intercept[Exception] {
      spark.sql("OPTIMIZE graft_no_such_table_xyz")
    }
    assert(!e2.getMessage.contains("graft-manifest"))
    spark.sql("DROP TABLE dml_coex")
  }

  test("MERGE subqueries in clause conditions: uncorrelated evaluate " +
      "once, correlated lower to lookups; plain-parquet targets fail " +
      "loudly") {
    mkTable("dml_bad")
    Seq((1L, 5L)).toDF("k", "m").createOrReplaceTempView("dml_src2")
    // UNCORRELATED subqueries in clause conditions evaluate once
    spark.sql("""MERGE INTO dml_bad t USING dml_src2 s ON t.k = s.k
                |WHEN MATCHED AND t.m < (SELECT MAX(m) FROM dml_src2)
                |THEN UPDATE SET m = -5""".stripMargin)
    assert(spark.sql("SELECT m FROM dml_bad WHERE k = 1")
      .as[Long].head() === -5L)
    // CORRELATED clause condition (r12): scalar-compare correlation
    spark.sql("""MERGE INTO dml_bad t USING dml_src2 s ON t.k = s.k
                |WHEN MATCHED AND t.m <
                |  (SELECT MAX(m) FROM dml_src2 WHERE k = t.k)
                |THEN DELETE""".stripMargin)
    assert(spark.table("dml_bad").count() === 999L,
      "k=1 (m=-5 < its correlated max 5) must delete")
    assert(spark.sql("SELECT COUNT(*) FROM dml_bad WHERE k = 1")
      .as[Long].head() === 0L)
    // a NON-manifested parquet table keeps Spark's own v2-only error
    val plainDir = java.nio.file.Files
      .createTempDirectory("graft_sqldml_plain").toString + "/t"
    Seq((1L, 1L)).toDF("k", "m").write.parquet(plainDir)
    spark.sql("DROP TABLE IF EXISTS dml_plain")
    spark.sql(s"CREATE TABLE dml_plain USING parquet " +
      s"OPTIONS (path '$plainDir')")
    intercept[Exception] {
      spark.sql("DELETE FROM dml_plain WHERE k = 1")
    }
    spark.sql("DROP TABLE dml_plain")
    spark.sql("DROP TABLE dml_bad")
  }

  test("correlated EXISTS in SET/INSERT VALUE positions (r13): exact " +
      "via the hit-flag lowering; three-valued IN stays refused") {
    mkTable("dml_ev")
    // src matches k ∈ {1, 2, 3}, plus the unmatched key 5000
    Seq(1L, 2L, 3L, 5000L).toDF("k").createOrReplaceTempView("dml_ev_s")
    Seq(100L, 300L).toDF("kk").createOrReplaceTempView("dml_ev_x")
    // SET value: EXISTS over a correlated lookup — true for k ∈ {1, 3}
    // (kk = k·100 exists), false for k = 2 (hit-flag NULL → false)
    spark.sql("""MERGE INTO dml_ev t USING dml_ev_s s ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET m =
      |  CASE WHEN EXISTS (SELECT 1 FROM dml_ev_x x
      |                    WHERE x.kk = t.k * 100)
      |       THEN -1 ELSE -2 END
      |WHEN NOT MATCHED THEN INSERT (k, m) VALUES (s.k,
      |  CASE WHEN EXISTS (SELECT 1 FROM dml_ev_x x
      |                    WHERE x.kk = s.k) THEN -7 ELSE -8 END)
      |""".stripMargin)
    assert(spark.sql("SELECT k, m FROM dml_ev WHERE m < 0 ORDER BY k")
      .as[(Long, Long)].collect() ===
      Array((1L, -1L), (2L, -2L), (3L, -1L), (5000L, -8L)))
    // bare boolean value (no CASE): NOT EXISTS wraps the flag exactly
    spark.sql("""MERGE INTO dml_ev t USING dml_ev_s s ON t.k = s.k
      |WHEN MATCHED AND t.k = 2 THEN UPDATE SET m = CAST(
      |  NOT EXISTS (SELECT 1 FROM dml_ev_x x WHERE x.kk = t.k * 100)
      |  AS BIGINT)""".stripMargin)
    assert(spark.sql("SELECT m FROM dml_ev WHERE k = 2")
      .as[Long].head() === 1L)
    // three-valued IN in a value position: loud, with the rewrite hint
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO dml_ev t USING dml_ev_s s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET m = CAST(
        |  t.k IN (SELECT x.kk FROM dml_ev_x x WHERE x.kk = t.k)
        |  AS BIGINT)""".stripMargin)
    }
    assert(e.getMessage.contains("EXISTS"), e.getMessage)
    spark.sql("DROP TABLE dml_ev")
  }
}
