package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StatsManifest

/** Metadata-only aggregates (engine/ManifestMetadataOnly): a global
  * count/min/max over a manifested scan folds to a LocalRelation at
  * optimization time — ZERO scan tasks — and equals the scanned answer
  * exactly. Also pins every safety gate: untracked files, filters,
  * grouping, distinct counts, and unsupported functions all leave the
  * plan alone. */
class ManifestMetadataOnlySpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  private def isMetadataOnly(df: DataFrame): Boolean = {
    val plan = df.queryExecution.optimizedPlan
    plan.collectFirst { case r: LogicalRelation => r }.isEmpty &&
      plan.collectFirst { case l: LocalRelation => l }.nonEmpty
  }

  private def mkTable(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mdonly_").toString + "/t"
    spark.range(5000)
      .select(col("id"),
        (col("id") % 97).cast("int").as("m"),
        concat(lit("k"), lpad(col("id").cast("string"), 6, "0")).as("s"),
        when(col("id") % 10 === 0, lit(null).cast("double"))
          .otherwise(col("id").cast("double") / 7.0).as("v"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          (col("id") % 365).cast("int")).as("d"),
        timestamp_seconds(col("id") * 60L).as("ts"))
      .repartition(8)
      .write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("id", "m", "s", "v", "d", "ts"))
    dir
  }

  test("count/min/max over every stats domain fold to a LocalRelation, oracle-equal") {
    val dir = mkTable()
    val scan = StatsManifest.scan(spark, dir)
    val agg = scan.agg(
      count(lit(1)).as("n"),
      count(col("v")).as("nv"),
      min(col("id")).as("lo_id"), max(col("id")).as("hi_id"),
      min(col("m")).as("lo_m"), max(col("m")).as("hi_m"),
      min(col("s")).as("lo_s"), max(col("s")).as("hi_s"),
      min(col("v")).as("lo_v"), max(col("v")).as("hi_v"),
      min(col("d")).as("lo_d"), max(col("d")).as("hi_d"),
      min(col("ts")).as("lo_ts"), max(col("ts")).as("hi_ts"))
    assert(isMetadataOnly(agg), agg.queryExecution.optimizedPlan.toString)

    val got = agg.collect().head
    val want = spark.read.parquet(dir).agg(
      count(lit(1)), count(col("v")),
      min(col("id")), max(col("id")), min(col("m")), max(col("m")),
      min(col("s")), max(col("s")), min(col("v")), max(col("v")),
      min(col("d")), max(col("d")), min(col("ts")), max(col("ts")))
      .collect().head
    assert(got === want)
    // and the executed plan launches no file scan at all
    assert(!agg.queryExecution.executedPlan.toString.contains("FileScan"),
      agg.queryExecution.executedPlan.toString)
  }

  test("Dataset.count() and arithmetic over aggregates fold too") {
    val dir = mkTable()
    assert(StatsManifest.scan(spark, dir).count() === 5000L)
    val df = StatsManifest.scan(spark, dir)
      .agg((count(lit(1)) + 1).as("n1"),
        (max(col("id")) - min(col("id"))).as("span"))
    assert(isMetadataOnly(df))
    assert(df.collect().head === org.apache.spark.sql.Row(5001L, 4999L))
  }

  test("an all-null column's min/max folds to NULL") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mdonly_null_").toString + "/t"
    spark.range(100)
      .select(col("id"), lit(null).cast("long").as("z"))
      .repartition(2).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("id", "z"))
    val df = StatsManifest.scan(spark, dir)
      .agg(min(col("z")).as("lo"), count(col("z")).as("nz"))
    assert(isMetadataOnly(df))
    val r = df.collect().head
    assert(r.isNullAt(0) && r.getLong(1) === 0L)
  }

  test("safety gates: untracked files, filters, grouping, distinct, other aggs stay on the scan") {
    val dir = mkTable()
    // 1. untracked append → coverage check fails → normal scan, right answer
    spark.range(5000, 5500)
      .select(col("id"), lit(1).as("m"), lit("x").as("s"),
        lit(1.0).as("v"), lit(java.sql.Date.valueOf("2030-01-01")).as("d"),
        timestamp_seconds(lit(0L)).as("ts"))
      .coalesce(1).write.mode("append").parquet(dir)
    spark.catalog.refreshByPath(dir) // listing cache must see the append
    val stale = StatsManifest.scan(spark, dir).agg(count(lit(1)).as("n"))
    assert(!isMetadataOnly(stale))
    assert(stale.collect().head.getLong(0) === 5500L)
    // ...and after a manifest update the rewrite fires again
    StatsManifest.update(spark, dir, Seq("id", "m", "s", "v", "d", "ts"))
    val fresh = StatsManifest.scan(spark, dir).agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(fresh))
    assert(fresh.collect().head.getLong(0) === 5500L)

    val scan = StatsManifest.scan(spark, dir)
    // 2. a filter below the aggregate
    val filtered = scan.where(col("id") < 100).agg(count(lit(1)).as("n"))
    assert(!isMetadataOnly(filtered))
    assert(filtered.collect().head.getLong(0) === 100L)
    // 3. grouped aggregation
    val grouped = scan.groupBy(col("m")).agg(count(lit(1)))
    assert(!isMetadataOnly(grouped))
    // 4. distinct count
    val distinctC = scan.agg(countDistinct(col("m")).as("n"))
    assert(!isMetadataOnly(distinctC))
    assert(distinctC.collect().head.getLong(0) === 97L)
    // 5. an agg the manifest can't answer rides along → whole rewrite
    // bails (double sums are order-sensitive and never folded)
    val mixed = scan.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    assert(!isMetadataOnly(mixed))
  }

  test("integral SUM folds exactly; double SUM never does") {
    val dir = mkTable()
    val scan = StatsManifest.scan(spark, dir)
    val df = scan.agg(sum(col("id")).as("sid"), sum(col("m")).as("sm"),
      count(lit(1)).as("n"))
    assert(isMetadataOnly(df), df.queryExecution.optimizedPlan.toString)
    val got = df.collect().head
    val want = spark.read.parquet(dir)
      .agg(sum(col("id")), sum(col("m")), count(lit(1))).collect().head
    assert(got === want)

    // double: correct answer, but through the scan
    val dv = StatsManifest.scan(spark, dir).agg(sum(col("v")).as("sv"))
    assert(!isMetadataOnly(dv))

    // all-null integral column sums to NULL metadata-only
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_mdonly_sum_").toString + "/t"
    spark.range(10).select(col("id"), lit(null).cast("long").as("z"))
      .coalesce(1).write.parquet(dir2)
    StatsManifest.write(spark, dir2, Seq("z"))
    val dz = StatsManifest.scan(spark, dir2).agg(sum(col("z")).as("sz"))
    assert(isMetadataOnly(dz))
    assert(dz.collect().head.isNullAt(0))
  }
}
