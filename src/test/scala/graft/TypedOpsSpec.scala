package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.12: the reference's DataSet/DataStream typed surface
  * (map/flatMap/filter/groupBy/reduce/cogroup/mapPartitions/distinct/
  * first) maps 1:1 onto Dataset[T]. These tests pin that mapping on the
  * real fixtures with case-class Encoders.
  */
case class Order(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
case class CustSpend(cust: Long, total: Double)

class TypedOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  private def orders = {
    import spark.implicits._
    graft.engine.Tables.load(spark, SparkFixture.sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice").as[Order]
  }

  test("map / filter / groupByKey / reduceGroups (DataSet.java:213-1480)") {
    import spark.implicits._
    val spend = orders
      .filter(_.o_totalprice > 0)
      .map(o => CustSpend(o.o_custkey, o.o_totalprice))
      .groupByKey(_.cust)
      .reduceGroups((a, b) => CustSpend(a.cust, a.total + b.total))
      .map(_._2)
    val viaSql = orders.toDF().groupBy("o_custkey")
      .agg(sum("o_totalprice").as("t"))
    assert(spend.count() === viaSql.count())
    val k = spend.filter(_.cust == 7L).collect()
    val kSql = viaSql.where(col("o_custkey") === 7L)
      .collect().map(_.getDouble(1))
    if (k.nonEmpty)
      assert(math.abs(k.head.total - kSql.head) < 1e-6)
  }

  test("flatMap + mapPartitions (FlatMapDriver / MapPartitionDriver)") {
    import spark.implicits._
    val exploded = orders.flatMap(o => Seq.fill(2)(o.o_orderkey))
    assert(exploded.count() === orders.count() * 2)
    val partitionSums = orders.mapPartitions { it =>
      var n = 0L; it.foreach(_ => n += 1); Iterator.single(n)
    }
    assert(partitionSums.collect().sum === orders.count())
  }

  test("cogroup (CoGroupDriver / CoGroupedStreams)") {
    import spark.implicits._
    val cust = graft.engine.Tables.load(spark, SparkFixture.sf, "customer")
      .select(col("c_custkey").as("id")).as[Long]
    val byCust = orders.groupByKey(_.o_custkey)
    val custKeys = cust.groupByKey(identity)
    val matched = byCust.cogroup(custKeys) { (k, os, cs) =>
      if (os.nonEmpty && cs.nonEmpty) Iterator.single(k) else Iterator.empty
    }
    // every order's customer exists → count = distinct custkeys with orders
    assert(matched.count() ===
      orders.toDF().select("o_custkey").distinct().count())
  }

  test("distinct / first / sortWithinPartitions (DataSet batch ops)") {
    import spark.implicits._
    val keys = orders.map(_.o_custkey).distinct()
    assert(keys.count() ===
      orders.toDF().select("o_custkey").distinct().count())
    assert(orders.sort(col("o_orderkey")).head().o_orderkey ===
      orders.toDF().agg(min("o_orderkey")).head().getLong(0))
  }
}
