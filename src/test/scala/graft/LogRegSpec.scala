package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LogReg

/** Learned quality classifier (operators/LogReg): full-batch logistic
  * regression where the model is dim+1 driver doubles and each
  * iteration is ONE scan of dim+1 codegen'd SUM aggregates — the
  * KMeans control-flow pattern. Pins: separable data converges to
  * high accuracy, training is deterministic under repartitioning
  * (full-batch, no sampling), inference is scan-local (no exchange in
  * the scoring plan), and the gate composes with a funnel. */
class LogRegSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  /** 2-D synthetic: label 1 iff x0 + x1 > 1 (with a deterministic
    * pseudo-random cloud), linearly separable up to a thin margin. */
  private def cloud(n: Int, parts: Int) = {
    spark.range(n).repartition(parts)
      .select(col("id"),
        array(
          (pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("double")
            / 500.0 - 1.0),
          (pmod(xxhash64(col("id"), lit(2)), lit(1000)).cast("double")
            / 500.0 - 1.0)).as("x"))
      .withColumn("y",
        (col("x").getItem(0) + col("x").getItem(1) > 0.2).cast("int"))
  }

  test("fit converges on separable data; accuracy > 0.95; loss-monotone direction") {
    val df = cloud(4000, 8).cache()
    val m = LogReg.fit(df, "x", "y", dim = 2, iters = 120, lr = 2.0)
    val acc = df.select(
      (LogReg.gate(m, col("x")).cast("int") === col("y")).cast("int")
        .as("ok"))
      .agg(avg(col("ok"))).collect().head.getDouble(0)
    assert(acc > 0.95, s"accuracy $acc; model $m")
    // the learned boundary has the right orientation: both weights
    // positive (label fires on x0 + x1 large), bias negative
    assert(m.weights.forall(_ > 0), m.weights.mkString(","))
    assert(m.bias < 0)
    df.unpersist()
    ()
  }

  test("training is deterministic across partitioning; scoring is scan-local") {
    val m1 = LogReg.fit(cloud(2000, 2), "x", "y", 2, iters = 30)
    val m2 = LogReg.fit(cloud(2000, 16), "x", "y", 2, iters = 30)
    // full-batch gradients are partial-agg sums of doubles — identical
    // up to float re-association across partitionings; the MODELS must
    // agree to high precision, not just the predictions
    m1.weights.zip(m2.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
    assert(math.abs(m1.bias - m2.bias) < 1e-6)

    // inference: one projection, zero exchanges (score a frame with no
    // repartition of its own — the gate must not ADD one)
    val base = spark.range(100).select(
      array(col("id").cast("double"), col("id").cast("double")).as("x"))
    val scored = base.select(LogReg.score(m1, col("x")).as("s"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("gate composes with a funnel: kept set = score >= threshold exactly") {
    val df = cloud(1000, 4)
    val m = LogReg.fit(df, "x", "y", 2, iters = 60, lr = 2.0)
    val kept = df.where(LogReg.gate(m, col("x"), 0.7))
      .select("id").collect().map(_.getLong(0)).toSet
    val manual = df.select(col("id"), LogReg.score(m, col("x")).as("s"))
      .collect().filter(_.getDouble(1) >= 0.7).map(_.getLong(0)).toSet
    assert(kept === manual)
    assert(kept.nonEmpty && kept.size < 1000)
  }
}
