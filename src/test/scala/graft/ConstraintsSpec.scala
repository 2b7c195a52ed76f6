package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RowOps, StatsManifest}

/** CHECK constraints: ANSI semantics (NULL satisfies, FALSE violates),
  * inline write-job enforcement on EVERY write path (SQL insert,
  * row-level ops, the streaming append sink, format appends),
  * existing-data validation at ADD time, and the SQL surface. */
class ConstraintsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def mk(name: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_chk_$name").toString + "/t"
    (1 until 500).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "m")
      .repartitionByRange(4, col("k")).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    dir
  }

  test("ADD CONSTRAINT validates existing rows; writes then enforce " +
      "inline on INSERT, UPDATE, MERGE; DROP lifts it") {
    val dir = mk("chk_sql")
    spark.sql("ALTER TABLE chk_sql ADD CONSTRAINT k_pos CHECK (k > 0)")
    assert(StatsManifest.tableProps(spark, dir)
      .get("constraint.k_pos").contains("k > 0"))
    // a constraint existing rows violate refuses — and is NOT added
    val e0 = intercept[Exception] {
      spark.sql("ALTER TABLE chk_sql ADD CONSTRAINT m_low CHECK (m < 3)")
    }
    assert(e0.getMessage.contains("existing rows violate"), e0.getMessage)
    assert(!StatsManifest.tableProps(spark, dir).contains(
      "constraint.m_low"))
    // conforming writes pass
    spark.sql("INSERT INTO chk_sql VALUES (1000, 1)")
    assert(spark.table("chk_sql").count() === 500L)
    // violating INSERT fails loudly with name + row
    val e1 = SparkFixture.quietExpectedTaskFailures(
      intercept[Exception] {
        spark.sql("INSERT INTO chk_sql VALUES (-5, 1)")
      })
    def msg(t: Throwable): String = {
      var m = ""; var c: Throwable = t
      while (c != null) { m += c.getMessage + "\n"; c = c.getCause }
      m
    }
    assert(msg(e1).contains("k_pos"), msg(e1))
    assert(spark.table("chk_sql").where(col("k") < 0).count() === 0L)
    // violating UPDATE fails (row-level op path)
    val e2 = SparkFixture.quietExpectedTaskFailures(
      intercept[Exception] {
        spark.sql("UPDATE chk_sql SET k = -1 WHERE k = 10")
      })
    assert(msg(e2).contains("k_pos"), msg(e2))
    assert(spark.table("chk_sql").where(col("k") === 10).count() === 1L)
    // violating MERGE insert fails
    Seq((-77L, 0L)).toDF("k", "m").createOrReplaceTempView("chk_src")
    val e3 = SparkFixture.quietExpectedTaskFailures(
      intercept[Exception] {
        spark.sql("""MERGE INTO chk_sql t USING chk_src s ON t.k = s.k
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      })
    assert(msg(e3).contains("k_pos"), msg(e3))
    // NULL satisfies (ANSI): a null k inserts fine under k > 0
    spark.sql("INSERT INTO chk_sql VALUES (NULL, 2)")
    assert(spark.table("chk_sql").where(col("k").isNull).count() === 1L)
    // DROP lifts enforcement
    spark.sql("ALTER TABLE chk_sql DROP CONSTRAINT k_pos")
    spark.sql("INSERT INTO chk_sql VALUES (-5, 1)")
    assert(spark.table("chk_sql").where(col("k") === -5L).count() === 1L)
    intercept[Exception] {
      spark.sql("ALTER TABLE chk_sql DROP CONSTRAINT nope")
    }
    spark.sql("ALTER TABLE chk_sql DROP CONSTRAINT IF EXISTS nope")
    // raw TBLPROPERTIES writes of constraint.* refuse on the graft
    // catalog (they would skip the existing-data validation); a
    // session-catalog SET TBLPROPERTIES writes the METASTORE, never
    // the sidecar our enforcement reads — can't inject either way
    val t = "graft.default.chk_cat"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    val e4 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('constraint.x' = 'k > 0')")
    }
    assert(e4.getMessage.contains("ADD CONSTRAINT"), e4.getMessage)
    spark.sql(s"DROP TABLE $t")
    spark.sql("DROP TABLE chk_sql")
  }

  test("the streaming append sink and format appends enforce too") {
    val dir = mk("chk_stream")
    spark.sql(
      "ALTER TABLE chk_stream ADD CONSTRAINT m_small CHECK (m < 100)")
    // format append: conforming passes, violating fails
    Seq((2000L, 5L)).toDF("k", "m").write.format("graft-manifest")
      .option("statsCols", "k").mode("append").save(dir)
    assert(spark.table("chk_stream").count() === 500L)
    val e = SparkFixture.quietExpectedTaskFailures(intercept[Exception] {
      Seq((2001L, 500L)).toDF("k", "m").write.format("graft-manifest")
        .option("statsCols", "k").mode("append").save(dir)
    })
    assert(spark.table("chk_stream").where(col("m") >= 100L)
      .count() === 0L)
    // streaming append sink: the violating batch fails the query
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = graft.streaming.Streams.appendToManifestedTable(spark,
      mem.toDF().toDF("k", "m"), dir, Seq("k"))
    try {
      mem.addData((3000L, 1L), (3001L, 2L))
      q.processAllAvailable()
      // the sink commits outside SQL — read through the manifest scan
      assert(StatsManifest.scan(spark, dir).count() === 502L)
      mem.addData((3002L, 999L))
      val se = SparkFixture.quietExpectedStreamFailures(
        SparkFixture.quietExpectedTaskFailures(intercept[Exception] {
          q.processAllAvailable()
        }))
      assert(StatsManifest.scan(spark, dir).where(col("m") >= 100L)
        .count() === 0L, "the violating batch must not land")
    } finally { try q.stop() catch { case _: Exception => () } }
    spark.sql("DROP TABLE chk_stream")
  }
}
