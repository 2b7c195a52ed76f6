package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates for 100 TB cardinality/frequency work: HyperLogLog
  * (approx distinct) and Count-Min (frequency), via Spark's native
  * codegen'd sketch functions. Error bounds asserted against exact
  * answers on the fixtures — the contract a pipeline relies on when the
  * exact computation is too big to shuffle.
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private def lineitem = graft.engine.Tables
    .load(spark, SparkFixture.sf, "lineitem")

  test("HLL sketch distinct estimate within 5% of exact") {
    val est = lineitem
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"))
      .collect().head.getLong(0)
    val exact = lineitem.select("l_partkey").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"HLL est=$est exact=$exact")
  }

  test("HLL sketches merge across partitions (union = global)") {
    val merged = lineitem
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getLong(0)
    val exact = lineitem.select("l_partkey").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05)
  }

  test("approx_count_distinct tracks exact within 5%") {
    val r = lineitem.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_suppkey")).as("approx"),
        countDistinct(col("l_suppkey")).as("exact"))
      .collect()
    r.foreach { row =>
      val (a, e) = (row.getLong(1), row.getLong(2))
      assert(math.abs(a - e).toDouble / e < 0.05, s"approx=$a exact=$e")
    }
  }

  test("count-min sketch overestimates by at most eps*N") {
    val eps = 0.001
    val sketch = lineitem
      .agg(count_min_sketch(col("l_returnflag"), lit(eps), lit(0.99),
        lit(42)).as("cms"))
      .collect().head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketch))
    val exact = lineitem.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (k, e) =>
      // the agg adds UTF8String items via their UTF-8 bytes
      val est = cms.estimateCount(k.getBytes("UTF-8"))
      assert(est >= e, s"CMS must never underestimate: $k est=$est exact=$e")
      assert(est <= e + (eps * n).toLong + 1, s"$k est=$est exact=$e")
    }
  }
}
