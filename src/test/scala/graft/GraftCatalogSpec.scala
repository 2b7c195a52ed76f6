package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StatsManifest

/** The graft `TableCatalog` (round 11): `graft.db.t` names resolve
  * catalog-natively — DDL (CREATE/CTAS/ALTER/DROP/RENAME), the whole
  * DML matrix, time travel, maintenance statements and streaming reads
  * all run with ZERO `OPTIONS (path …)` plumbing, against the same
  * manifested-table layout and the same pruned V1 scan as every other
  * front door (the swap in `GraftCatalogRule` preserves output
  * attribute ids, so one engine path serves all names). */
class GraftCatalogSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private var n = 0
  private def tbl(): String = {
    n += 1
    val t = s"graft.default.cat_t$n"
    // the warehouse outlives JVMs (fixed tmp dir): stay idempotent
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS ${t}_renamed")
    t
  }

  test("CREATE TABLE + INSERT INTO: empty table commits v1, inserts " +
      "reconcile incrementally, reads prune by the manifest") {
    val t = tbl()
    spark.sql(s"CREATE TABLE $t (k BIGINT, m BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    assert(spark.table(t).count() === 0L)
    spark.sql(s"INSERT INTO $t SELECT id, id % 7 FROM range(1000)")
    spark.sql(s"INSERT INTO $t SELECT id + 100000, 0L FROM range(1000)")
    assert(spark.table(t).count() === 2000L)
    assert(spark.sql(s"SELECT sum(m) FROM $t WHERE k < 1000")
      .as[Long].head() === (0L until 1000L).map(_ % 7).sum)
    // the scan is the pruned V1 relation (manifest file index)
    val analyzed = spark.table(t).queryExecution.analyzed
    val pruned = analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
            lr.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.isInstanceOf[StatsManifest.ManifestFileIndex] => lr
    }
    assert(pruned.isDefined,
      "catalog reads must resolve to the manifest-pruned scan")
    // INSERT OVERWRITE replaces contents
    spark.sql(s"INSERT OVERWRITE $t SELECT id, -1L FROM range(10)")
    assert(spark.table(t).count() === 10L)
    spark.sql(s"DROP TABLE $t")
    assert(!spark.catalog.tableExists(t))
  }

  test("CTAS, partitioned CTAS with zorder props: partition pruning " +
      "and manifest pruning compose on a catalog name") {
    val t = tbl()
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (p) " +
      "TBLPROPERTIES ('statsCols' = 'k', 'zorder' = 'k', " +
      "'numFiles' = '4') " +
      "AS SELECT id AS k, id % 3 AS p FROM range(3000)")
    assert(spark.table(t).count() === 3000L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = 1")
      .as[Long].head() === 1000L)
    // partition column synthesized from the Hive layout
    val sc = spark.table(t).where(col("p") === 2 && col("k") < 10)
    assert(sc.count() === 3L) // k < 10 ∧ k % 3 == 2 → {2, 5, 8}
    spark.sql(s"DROP TABLE $t")
  }

  test("RENAME COLUMN is metadata-only via column mapping: old files " +
      "read under the new name, DML/pruning/CDC work on it, widening " +
      "upcasts old files — zero data rewrites") {
    val t = tbl()
    spark.sql(s"CREATE TABLE $t (k BIGINT, m INT) " +
      "TBLPROPERTIES ('statsCols' = 'k,m')")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id % 7 AS INT) " +
      "FROM range(2000)")
    // resolve the table dir through the pruned scan (for file-count
    // and manifest assertions)
    val dir = spark.table(t).queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.asInstanceOf[StatsManifest.ManifestFileIndex]
          .rootPaths.head.toString
    }.get
    val filesBefore = StatsManifest.read(spark, dir).keySet
    spark.sql(s"ALTER TABLE $t RENAME COLUMN k TO key")
    // metadata-only: not one data file moved or rewrote
    assert(StatsManifest.read(spark, dir).keySet === filesBefore)
    // reads serve the OLD files' values under the NEW name
    assert(spark.table(t).schema.fieldNames.toSeq === Seq("key", "m"))
    assert(spark.sql(s"SELECT sum(key) FROM $t").as[Long].head() ===
      (0L until 2000L).sum)
    // manifest pruning works on the renamed column (stats re-keyed)
    val (scan, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(scan.where(col("key") < 10L).count() === 10L)
    assert(idx.selected.get() < idx.total.get(),
      s"rename must keep pruning: ${idx.selected.get()}/${idx.total.get()}")
    // DML on the renamed column, appends, and the changefeed
    spark.sql(s"INSERT INTO $t SELECT id + 100000, CAST(-1 AS INT) " +
      "FROM range(10)")
    spark.sql(s"DELETE FROM $t WHERE key < 100")
    spark.sql(s"UPDATE $t SET m = -9 WHERE key BETWEEN 100 AND 109")
    assert(spark.table(t).count() === 1910L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE m = -9")
      .as[Long].head() === 10L)
    val ch = spark.sql(s"SELECT * FROM graft_changes('$t', 2)")
    assert(ch.schema.fieldNames.contains("key"))
    assert(ch.where(col("_change_type") === "delete" &&
      col("key") < 100L).count() === 100L)
    // widening: INT -> BIGINT is one schema commit; old files upcast
    spark.sql(s"ALTER TABLE $t ALTER COLUMN m TYPE BIGINT")
    assert(spark.table(t).schema("m").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(spark.sql(s"SELECT sum(m) FROM $t WHERE key >= 110")
      .as[Long].head() > 0L)
    // an unsafe narrowing is a loud error — Spark's own analyzer
    // rejects it before the catalog sees the change; an unsafe change
    // it lets through (e.g. long -> string) hits our widening matrix
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN m TYPE INT")
    }
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e.getMessage.contains("widening"), e.getMessage)
    val e1 = intercept[Exception] {
      graft.sources.RowOps.widenColumn(spark, dir, "m",
        org.apache.spark.sql.types.IntegerType)
    }
    assert(e1.getMessage.contains("widening"), e1.getMessage)
    // partition columns cannot rename (their name IS the layout)
    val t2 = tbl()
    spark.sql(s"CREATE TABLE $t2 PARTITIONED BY (p) " +
      "TBLPROPERTIES ('statsCols' = 'k') " +
      "AS SELECT id AS k, CAST(id % 2 AS INT) AS p FROM range(10)")
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t2 RENAME COLUMN p TO q")
    }
    assert(e2.getMessage.contains("partition") ||
      Option(e2.getCause).exists(_.getMessage.contains("partition")),
      e2.getMessage)
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"DROP TABLE $t2")
  }

  test("static-partition INSERT OVERWRITE on a catalog name: the v2 " +
      "OverwriteByExpression lowers to one delete+append commit") {
    val t = tbl()
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (p) " +
      "TBLPROPERTIES ('statsCols' = 'k') " +
      "AS SELECT id AS k, CAST(id % 3 AS INT) AS p FROM range(300)")
    spark.sql(s"INSERT OVERWRITE $t PARTITION (p = 1) " +
      "SELECT id AS k FROM range(7000, 7010)")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = 1")
      .as[Long].head() === 10L)
    assert(spark.sql(s"SELECT min(k) FROM $t WHERE p = 1")
      .as[Long].head() === 7000L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE p <> 1")
      .as[Long].head() === 200L)
    // a general filtered overwrite works too (the v2 semantics)
    spark.sql(s"INSERT OVERWRITE $t PARTITION (p = 1) " +
      "SELECT id AS k FROM range(8000, 8003)")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = 1")
      .as[Long].head() === 3L)
    spark.sql(s"DROP TABLE $t")
  }

  test("table-level policy properties round-trip: CREATE TBLPROPERTIES " +
      "→ sidecar → SHOW/DETAIL; ALTER SET/UNSET; property beats " +
      "session conf beats default") {
    val t = tbl()
    spark.sql(s"CREATE TABLE $t (k BIGINT, m BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k', " +
      "'autoCompact.minFiles' = '8', 'retention.versions' = '12')")
    val dir = spark.table(t).queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.asInstanceOf[StatsManifest.ManifestFileIndex]
          .rootPaths.head.toString
    }.get
    // create-time properties landed in the sidecar
    assert(StatsManifest.tableProps(spark, dir)
      .get("autoCompact.minFiles").contains("8"))
    // SHOW TBLPROPERTIES reads them back through the v2 Table handle
    val shown = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("autoCompact.minFiles").contains("8"), shown)
    assert(shown.get("retention.versions").contains("12"), shown)
    // resolution order: table property > session conf > default
    assert(StatsManifest.tablePolicy(spark, dir,
      "autoCompact.minFiles", "16") === "8")
    spark.conf.set("spark.graft.autoCompact.targetBytes", "1234")
    try assert(StatsManifest.tablePolicy(spark, dir,
      "autoCompact.targetBytes", "67108864") === "1234")
    finally spark.conf.unset("spark.graft.autoCompact.targetBytes")
    assert(StatsManifest.tablePolicy(spark, dir,
      "autoCompact.targetBytes", "67108864") === "67108864")
    // ALTER TABLE SET / UNSET TBLPROPERTIES round-trips
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('autoCompact.minFiles' = '4', 'manifest.checkpointInterval' = '4')")
    assert(StatsManifest.tablePolicy(spark, dir,
      "autoCompact.minFiles", "16") === "4")
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('retention.versions')")
    assert(!StatsManifest.tableProps(spark, dir)
      .contains("retention.versions"))
    // layout keys are the table's physical identity — loud refusal
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('statsCols' = 'm')")
    }
    assert(e.getMessage.contains("fixed at CREATE"), e.getMessage)
    // DESCRIBE DETAIL surfaces the policy properties
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(10)")
    val d = spark.sql(s"DESCRIBE DETAIL $t").collect().head
    val props = d.getString(d.length - 1)
    assert(props.contains("autoCompact.minFiles=4"), props)
    assert(props.contains("manifest.checkpointInterval=4"), props)
    // the per-table checkpoint cadence is live: versions 4 and 8 fold
    // as checkpoints under the table's own interval
    (0 until 8).foreach(i =>
      spark.sql(s"INSERT INTO $t SELECT id + ${100 * i}, id " +
        "FROM range(5)"))
    assert(spark.table(t).count() === 50L)
    spark.sql(s"DROP TABLE $t")
  }

  test("dynamic-partition INSERT OVERWRITE on a catalog name: the v2 " +
      "OverwritePartitionsDynamic replaces exactly the partitions " +
      "present in the data, one 'replace' commit") {
    val t = tbl()
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (p) " +
      "TBLPROPERTIES ('statsCols' = 'k') " +
      "AS SELECT id AS k, CAST(id % 3 AS INT) AS p FROM range(300)")
    val saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // PARTITION (p) with no value: p ∈ {0, 1} present → replaced;
      // p = 2's 100 rows untouched
      spark.sql(s"INSERT OVERWRITE $t PARTITION (p) " +
        "SELECT id AS k, CAST(id % 2 AS INT) AS p FROM range(4000, 4020)")
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = 0")
        .as[Long].head() === 10L)
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = 1")
        .as[Long].head() === 10L)
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = 2")
        .as[Long].head() === 100L)
      // the bare form takes the same path in dynamic mode
      spark.sql(s"INSERT OVERWRITE $t " +
        "SELECT id AS k, CAST(2 AS INT) AS p FROM range(5000, 5004)")
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = 2")
        .as[Long].head() === 4L)
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE p < 2")
        .as[Long].head() === 20L)
    } finally spark.conf.set(
      "spark.sql.sources.partitionOverwriteMode", saved)
    spark.sql(s"DROP TABLE $t")
  }

  test("DML matrix on catalog names: DELETE, UPDATE, MERGE, and the " +
      "changefeed TVF — zero OPTIONS") {
    val t = tbl()
    spark.sql(s"CREATE TABLE $t (k BIGINT, m BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    spark.sql(s"INSERT INTO $t SELECT id, id % 7 FROM range(2000)")
    spark.sql(s"DELETE FROM $t WHERE k < 100")
    assert(spark.table(t).count() === 1900L)
    spark.sql(s"UPDATE $t SET m = -5 WHERE k BETWEEN 100 AND 199")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE m = -5")
      .as[Long].head() === 100L)
    spark.range(1950, 2050).selectExpr("id AS k", "99L AS m")
      .createOrReplaceTempView("cat_dml_src")
    spark.sql(s"MERGE INTO $t USING cat_dml_src s ON $t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    // 1950..1999 matched (replaced), 2000..2049 inserted
    assert(spark.table(t).count() === 1950L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE m = 99")
      .as[Long].head() === 100L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE m = -5")
      .as[Long].head() === 100L)
    // the CDC TVF accepts the catalog name
    val changes = spark.sql(
      s"SELECT * FROM graft_changes('$t', 1)")
    assert(changes.where(col("_change_type") === "delete")
      .count() >= 100L)
    spark.sql(s"DROP TABLE $t")
  }

  test("time travel on catalog names: VERSION AS OF and TIMESTAMP AS " +
      "OF resolve snapshots") {
    val t = tbl()
    spark.sql(s"CREATE TABLE $t (k BIGINT, m BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    spark.sql(s"INSERT INTO $t SELECT id, 0L FROM range(100)") // v2
    spark.sql(s"DELETE FROM $t WHERE k < 50") // v3
    assert(spark.table(t).count() === 50L)
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 2")
      .as[Long].head() === 100L)
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 1")
      .as[Long].head() === 0L)
    assert(spark.sql(
      s"SELECT count(*) FROM $t TIMESTAMP AS OF '2099-01-01'")
      .as[Long].head() === 50L)
    spark.sql(s"DROP TABLE $t")
  }

  test("ALTER TABLE ADD/DROP COLUMNS is metadata-only; RENAME and SHOW " +
      "TABLES work; maintenance statements accept catalog names") {
    val t = tbl()
    spark.sql(s"CREATE TABLE $t (k BIGINT, m BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    spark.sql(s"INSERT INTO $t SELECT id, 1L FROM range(100)")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (note STRING)")
    assert(spark.table(t).schema.fieldNames === Array("k", "m", "note"))
    assert(spark.table(t).where(col("note").isNull).count() === 100L)
    spark.sql(s"ALTER TABLE $t DROP COLUMN note")
    assert(spark.table(t).schema.fieldNames === Array("k", "m"))
    // maintenance: OPTIMIZE + VACUUM + DESCRIBE HISTORY on the name
    spark.sql(s"INSERT INTO $t SELECT id + 1000, 2L FROM range(100)")
    val opt = spark.sql(s"OPTIMIZE $t ZORDER BY (k)").collect().head
    assert(opt.getInt(1) >= 1)
    val hist = spark.sql(s"DESCRIBE HISTORY $t")
    assert(hist.count() >= 5L)
    val vac = spark.sql(s"VACUUM $t RETAIN 1 VERSIONS").collect().head
    assert(vac.getLong(1) === 1L)
    assert(spark.table(t).count() === 200L)
    // rename: data + manifest move with the name
    val t2 = s"${t}_renamed"
    spark.sql(s"ALTER TABLE $t RENAME TO ${t2.split("\\.").last}")
    assert(!spark.catalog.tableExists(t))
    assert(spark.table(s"graft.default.${t2.split("\\.").last}")
      .count() === 200L)
    val shown = spark.sql("SHOW TABLES IN graft.default")
      .select("tableName").as[String].collect()
    assert(shown.contains(t2.split("\\.").last))
    spark.sql(s"DROP TABLE graft.default.${t2.split("\\.").last}")
  }

  test("streaming read of a catalog table: version-offset micro-batches " +
      "via readStream.table") {
    val t = tbl()
    spark.sql(s"CREATE TABLE $t (k BIGINT, m BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    spark.sql(s"INSERT INTO $t SELECT id, 0L FROM range(100)")
    val sink = s"cat_stream_sink_$n"
    val q = spark.readStream.table(t)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 100L)
      spark.sql(s"INSERT INTO $t SELECT id + 1000, 1L FROM range(50)")
      q.processAllAvailable()
      assert(spark.table(sink).count() === 150L)
    } finally { q.stop(); q.awaitTermination() }
    spark.sql(s"DROP TABLE $t")
  }

  test("CDC stream of a catalog table: readChangeFeed + rate limit " +
      "via readStream.table options") {
    val t = tbl()
    spark.sql(s"CREATE TABLE $t (k BIGINT, m BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    spark.sql(s"INSERT INTO $t SELECT id, 0L FROM range(100)")
    spark.sql(s"DELETE FROM $t WHERE k < 10")
    val sink = s"cat_cdc_sink_$n"
    val q = spark.readStream
      .option("readChangeFeed", "true")
      .option("maxFilesPerTrigger", "1")
      .table(t)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table(sink)
      assert(got.schema.fieldNames.takeRight(2).toSeq ===
        Seq("_change_type", "_commit_version"))
      assert(got.where(org.apache.spark.sql.functions
        .col("_change_type") === "insert").count() === 100L)
      assert(got.where(org.apache.spark.sql.functions
        .col("_change_type") === "delete").count() === 10L)
    } finally { q.stop(); q.awaitTermination() }
    spark.sql(s"DROP TABLE $t")
  }
}
