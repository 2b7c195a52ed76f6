package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RowOps, StatsManifest}
import graft.streaming.Streams

/** CDC-apply: a keyed changelog stream MERGEs into a manifested table —
  * keep-last within each batch, upsert/delete split on a flag, first
  * batch bootstraps the table, every commit is atomic, and the table's
  * own CDC feed reflects exactly the net row changes. */
class UpsertStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("changelog stream materializes: inserts, keep-last updates, " +
      "flagged deletes; final table == the changelog's net state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_cdcapply_").toString + "/t"
    // keep one-output-per-touched-input: this tiny table would
    // otherwise (correctly) collapse to a single file under the
    // bytes-bounded rewrite, leaving the pruning assertion below
    // nothing to prune
    spark.conf.set("spark.graft.rowops.targetFileBytes", "1")
    val mem = MemoryStream[(Long, Long, Long, Boolean)]
    val q = Streams.upsertToManifestedTable(spark,
      mem.toDF().toDF("k", "v", "seq", "del"), dir,
      keys = Seq("k"), seqCol = "seq", statsCols = Seq("k"),
      deleteCol = Some("del"))
    try {
      // batch 0: bootstrap 0..999
      mem.addData((0 until 1000).map(i =>
        (i.toLong, i.toLong, 0L, false)): _*)
      q.processAllAvailable()
      // batch 1: update keys 100..109 (key 100 twice — keep-last wins),
      // insert keys 2000..2004
      mem.addData(((100 until 110).map(i =>
        (i.toLong, -1L, 1L, false)) ++
        Seq((100L, -2L, 2L, false)) ++
        (2000 until 2005).map(i => (i.toLong, 7L, 1L, false))): _*)
      q.processAllAvailable()
      // batch 2: delete keys 0..4, update key 200; a key upserted AND
      // deleted in one batch (300: upsert seq 1, delete seq 2) deletes
      mem.addData((
        (0 until 5).map(i => (i.toLong, 0L, 1L, true)) ++
          Seq((200L, -3L, 1L, false),
            (300L, 11L, 1L, false), (300L, 0L, 2L, true))): _*)
      q.processAllAvailable()
    } finally {
      q.stop(); q.awaitTermination()
      spark.conf.unset("spark.graft.rowops.targetFileBytes")
    }

    val t = StatsManifest.scan(spark, dir)
    assert(t.count() === 1000L + 5L - 5L - 1L)
    assert(t.where(col("k") === 100L).select("v").as[Long].head() === -2L)
    assert(t.where(col("k").between(101L, 109L) && col("v") === -1L)
      .count() === 9L)
    assert(t.where(col("k") === 200L).select("v").as[Long].head() === -3L)
    assert(t.where(col("k") < 5L || col("k") === 300L).count() === 0L)
    assert(t.where(col("k") >= 2000L).count() === 5L)
    // the stored table is a real manifested table: pruned reads work
    val (s2, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(s2.where(col("k") === 2004L).count() === 1L)
    assert(idx.selected.get() < idx.total.get())
  }

  test("upsert is idempotent: re-applying a batch commits a version " +
      "whose CDC diff is EMPTY") {
    val dir = Files.createTempDirectory("graft_idem_").toString + "/t"
    (0 until 500).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .repartitionByRange(4, col("k")).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    val src = Seq((10L, -1L), (11L, -1L), (9999L, 5L)).toDF("k", "v")
    val r1 = RowOps.upsert(spark, dir, src, Seq("k"), Seq("k"))
    val r2 = RowOps.upsert(spark, dir, src, Seq("k"), Seq("k"))
    assert(r2.version === r1.version + 1)
    // the replay rewrote files with identical content: netted CDC = ∅
    assert(RowOps.changes(spark, dir, r1.version, r2.version).count() === 0L)
    // and the first application's diff is exactly the 3 source rows
    // (2 replaced pairs + 1 insert = 2 deletes + 3 inserts)
    val c1 = RowOps.changes(spark, dir, r1.version - 1, r1.version)
    assert(c1.where(col("_change_type") === "insert").count() === 3L)
    assert(c1.where(col("_change_type") === "delete").count() === 2L)
  }
}
