package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RowOps, StatsManifest}

/** Metadata-only schema evolution on manifested tables: the
  * authoritative schema is a versioned sidecar, so ADD/DROP COLUMN cost
  * one manifest commit (no rewrite), old files serve nulls for added
  * columns, dropped columns project away, and snapshot reads keep the
  * schema AS OF their version. */
class SchemaEvolutionSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def mk(tag: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_schev_$tag").toString + "/t"
    (0 until 1000).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "m")
      .repartitionByRange(4, col("k")).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    dir
  }

  test("addColumn is metadata-only: old files serve nulls, new appends " +
      "carry values, pruning and reconciliation keep working") {
    val dir = mk("add")
    val filesBefore = StatsManifest.read(spark, dir).keySet
    val v = RowOps.addColumn(spark, dir, "tag", LongType)
    assert(v === 2L)
    // no data file was touched
    assert(StatsManifest.read(spark, dir).keySet === filesBefore)
    val t = StatsManifest.scan(spark, dir)
    assert(t.columns === Array("k", "m", "tag"))
    assert(t.where(col("tag").isNull).count() === 1000L)
    // appended files carry the column; incremental update reconciles
    (5000 until 5010).map(i => (i.toLong, 1L, 42L)).toDF("k", "m", "tag")
      .coalesce(1).write.mode("append").parquet(dir)
    StatsManifest.update(spark, dir, Seq("k"))
    val t2 = StatsManifest.scan(spark, dir)
    assert(t2.count() === 1010L)
    assert(t2.where(col("tag") === 42L).count() === 10L)
    // the k-range manifest stats still prune files
    val (s3, idx) = StatsManifest.scanWithIndex(spark, dir)
    assert(s3.where(col("k") === 5005L).count() === 1L)
    assert(idx.selected.get() < idx.total.get())
    // snapshot BEFORE the evolution: the old schema, faithfully
    val (snap, _) = StatsManifest.scanAtVersion(spark, dir, 1L)
    assert(snap.columns === Array("k", "m"))
    assert(snap.count() === 1000L)
  }

  test("backfill an added column with a predicate update; row ops write " +
      "the evolved schema") {
    val dir = mk("backfill")
    RowOps.addColumn(spark, dir, "tag", LongType)
    val r = RowOps.update(spark, dir, col("k") < 100,
      Seq("tag" -> lit(-5L)), Seq("k"))
    assert(r.matchedRows === 100L)
    val t = StatsManifest.scan(spark, dir)
    assert(t.where(col("tag") === -5L).count() === 100L)
    assert(t.where(col("tag").isNull).count() === 900L)
  }

  test("dropColumn projects the column away; the pre-drop snapshot keeps it") {
    val dir = mk("drop")
    val vDrop = RowOps.dropColumn(spark, dir, "m")
    val t = StatsManifest.scan(spark, dir)
    assert(t.columns === Array("k"))
    assert(t.count() === 1000L)
    val (snap, _) = StatsManifest.scanAtVersion(spark, dir, vDrop - 1)
    assert(snap.columns === Array("k", "m"))
    intercept[IllegalArgumentException] {
      RowOps.dropColumn(spark, dir, "nope")
    }
    intercept[IllegalArgumentException] {
      RowOps.addColumn(spark, dir, "k", LongType)
    }
  }
}
