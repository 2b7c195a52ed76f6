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
    // the statement committed a real version: snapshot + CDC exist
    assert(StatsManifest.versions(spark, dir) === Seq(1L, 2L))
    assert(RowOps.changes(spark, dir, 1L, 2L).count() === 100L)
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
    // DESCRIBE HISTORY reads the version log through SQL
    val h = spark.sql("DESCRIBE HISTORY dml_opt").collect()
    assert(h.length >= 1 && h.last.getLong(2) === 950L)
    spark.sql("DROP TABLE dml_opt")
  }

  test("unsupported MERGE forms and plain-parquet targets fail loudly") {
    mkTable("dml_bad")
    Seq((1L, 1L)).toDF("k", "m").createOrReplaceTempView("dml_src2")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO dml_bad t USING dml_src2 s ON t.k = s.k
                  |WHEN MATCHED THEN UPDATE SET m = s.m + 1
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("supported forms") ||
      Option(e.getCause).exists(_.getMessage.contains("supported forms")),
      e.getMessage)
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
}
