package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §4's co-located join claim, made concrete: two tables
  * bucketed on the join key join WITHOUT any Exchange — the bucketing
  * metadata satisfies the join's distribution requirement, so at 100 TB
  * a fact-fact join pre-bucketed at write time skips both shuffles
  * entirely (the biggest single cost in a repeated-join pipeline). */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  test("bucketed tables join with zero exchanges") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_buckets")
    val priorBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a non-broadcast join so an exchange WOULD appear without
    // bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$tmp/a").saveAsTable("bk_a")
      (0 until 1000).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "vb")
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$tmp/b").saveAsTable("bk_b")
      val joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$p")
      assert(joined.count() === 1000)
      // control: the same data unbucketed DOES shuffle
      val plain = (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
        .join((0 until 1000).map(i => (i.toLong, (i % 7).toLong))
          .toDF("k", "vb"), "k")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBc)
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }
}
