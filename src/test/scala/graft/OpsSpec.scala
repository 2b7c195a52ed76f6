package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ops._

/** Operator-level invariants for graft.operators.Ops. */
class OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private def orders = graft.engine.Tables
    .load(spark, SparkFixture.sf, "orders")

  test("saltedAgg equals direct aggregation (skew mitigation)") {
    val direct = orders.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSet
    val salted = orders.saltedAgg(
      keys = Seq(col("o_orderpriority")),
      salt = 16,
      partial = Seq(
        "n" -> count(lit(1)),
        "s" -> sum(col("o_totalprice").cast("decimal(18,2)"))),
      combine = Seq(
        "n" -> (c => sum(c)),
        "s" -> (c => sum(c))))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSet
    assert(salted === direct)
  }

  test("topN emits at most n rows per key, ranked") {
    val top = orders.topN(2, Seq(col("o_orderpriority")),
      Seq(desc("o_totalprice"), col("o_orderkey")))
    val perKey = top.groupBy("o_orderpriority").count().collect()
    assert(perKey.forall(_.getLong(1) <= 2))
    assert(top.where(col("rn") > 2).count() === 0)
  }

  test("dedupKeepFirst keeps exactly one row per key") {
    val d = orders.dedupKeepFirst(Seq(col("o_custkey")),
      Seq(col("o_orderdate"), col("o_orderkey")))
    assert(d.count() ===
      orders.select("o_custkey").distinct().count())
    assert(!d.columns.contains("__rn"))
  }
}
