package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RowOps, StatsManifest}

/** RESTORE — the write half of time travel: a new version whose live
  * set/schema/manifest equal an earlier version's, with history intact
  * and the CDC feed carrying the netted diff. Pins: exact content
  * round-trip, zero-data-scan commit (manifest-only), loud refusal
  * when the target was vacuumed, schema reverting across evolution,
  * CDC replay equality, and both SQL forms. */
class RestoreSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def mk(tag: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_restore_$tag").toString + "/t"
    (0 until 1000).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "m")
      .repartitionByRange(4, col("k")).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    dir
  }

  test("restore round-trips content exactly, keeps history, feeds CDC " +
      "with the netted diff, and is itself time-travelable") {
    val dir = mk("rt")
    val v1 = StatsManifest.latestVersion(spark, dir).get
    val fp0 = StatsManifest.scan(spark, dir)
      .agg(expr("bit_xor(xxhash64(k, m))")).collect().head.getLong(0)
    RowOps.delete(spark, dir, col("k") < 100, Seq("k"))
    RowOps.update(spark, dir, col("k") >= 900,
      Seq("m" -> lit(-1L)), Seq("k"))
    val v3 = StatsManifest.latestVersion(spark, dir).get
    assert(v3 === v1 + 2)
    assert(StatsManifest.scan(spark, dir).count() === 900L)

    val r = RowOps.restore(spark, dir, v1)
    assert(r.restoredTo === v1 && r.newVersion === v3 + 1)
    assert(r.filesReinstated >= 1L && r.filesDropped >= 1L)
    // exact content round-trip
    val t = StatsManifest.scan(spark, dir)
    assert(t.count() === 1000L)
    assert(t.agg(expr("bit_xor(xxhash64(k, m))"))
      .collect().head.getLong(0) === fp0)
    // history intact: the mutated state still reads AS OF v3
    assert(StatsManifest.scanAtVersion(spark, dir, v3)._1
      .count() === 900L)
    assert(StatsManifest.opAt(spark, dir, v3 + 1).contains("restore"))
    // CDC of the restore version nets to exactly the inverse of the
    // two mutations: 100 deleted rows come back as inserts, 100
    // updated rows emit old-out/new-in pairs
    val ch = RowOps.changes(spark, dir, v3, v3 + 1)
    val byType = ch.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType("insert") === 200L, byType.toString) // 100 + 100
    assert(byType("delete") === 100L, byType.toString) // the m=-1 rows
    assert(ch.where(col("_change_type") === "delete" &&
      col("m") =!= -1L).count() === 0L)
    // a second restore TO the mutated state round-trips back
    val r2 = RowOps.restore(spark, dir, v3)
    assert(StatsManifest.scan(spark, dir).count() === 900L)
    assert(r2.newVersion === v3 + 2)
    // restore-to-latest is a no-op (no commit)
    val rNoop = RowOps.restore(spark, dir,
      StatsManifest.latestVersion(spark, dir).get)
    assert(rNoop.filesReinstated === 0L && rNoop.filesDropped === 0L)
    assert(StatsManifest.latestVersion(spark, dir).get === v3 + 2)
  }

  test("restore reverts schema evolution; vacuumed targets refuse " +
      "loudly with the table unchanged") {
    val dir = mk("sv")
    val v1 = StatsManifest.latestVersion(spark, dir).get
    RowOps.addColumn(spark, dir, "extra",
      org.apache.spark.sql.types.LongType)
    RowOps.update(spark, dir, col("k") < 10,
      Seq("extra" -> lit(5L)), Seq("k"))
    assert(StatsManifest.scan(spark, dir).columns.contains("extra"))
    RowOps.restore(spark, dir, v1)
    // schema reverted with the content
    val t = StatsManifest.scan(spark, dir)
    assert(!t.columns.contains("extra"))
    assert(t.count() === 1000L)

    // age v1's replaced files out: mutate, then expire past the
    // restore point and reclaim bytes
    RowOps.delete(spark, dir, col("k") < 500, Seq("k"))
    val vDel = StatsManifest.latestVersion(spark, dir).get
    StatsManifest.expire(spark, dir, keep = 1)
    val before = StatsManifest.scan(spark, dir).count()
    val e = intercept[Exception] { RowOps.restore(spark, dir, vDel - 1) }
    assert(e.getMessage.contains("expired") ||
      e.getMessage.contains("vacuumed") ||
      e.getMessage.contains("not exist"), e.getMessage)
    assert(StatsManifest.scan(spark, dir).count() === before,
      "a refused restore must leave the table unchanged")
  }

  test("SQL front doors: RESTORE TABLE ... TO VERSION AS OF and " +
      "TO TIMESTAMP AS OF; foreign tables fall through") {
    val dir = mk("sql")
    spark.sql("DROP TABLE IF EXISTS restore_sql")
    spark.sql(s"CREATE TABLE restore_sql USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    val v1 = StatsManifest.latestVersion(spark, dir).get
    val t1ms = StatsManifest.history(spark, dir)
      .find(_.version == v1).get.committedAtMs
    Thread.sleep(5)
    spark.sql("DELETE FROM restore_sql WHERE k < 250")
    assert(spark.table("restore_sql").count() === 750L)
    val row = spark.sql(
      s"RESTORE TABLE restore_sql TO VERSION AS OF $v1")
      .collect().head
    assert(row.getLong(0) === v1)
    assert(row.getLong(4) === 250L, row.toString) // rows_reinstated
    assert(spark.table("restore_sql").count() === 1000L)
    // the timestamp form binds to the newest commit <= ts
    spark.sql("DELETE FROM restore_sql WHERE k >= 900")
    val ts = java.time.Instant.ofEpochMilli(t1ms)
    spark.sql(
      s"RESTORE TABLE restore_sql TO TIMESTAMP AS OF '$ts'")
    assert(spark.table("restore_sql").count() === 1000L)
    // DESCRIBE HISTORY shows the restore operations
    val ops = spark.sql("DESCRIBE HISTORY restore_sql").collect()
      .map(_.getString(1)).toSeq
    assert(ops.count(_ == "restore") >= 2, ops)
    spark.sql("DROP TABLE restore_sql")
  }
}
