package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed binary LOGISTIC REGRESSION over a feature-array column —
  * the learned QUALITY CLASSIFIER a training-data pipeline runs after
  * the heuristic gates (the fastText/CCNet-style "does this document
  * look like reference text" filter, reference analogue: the scorer UDF
  * pattern of `flink-table-runtime-blink/…/functions/ScalarFunction`
  * pipelines — here the TRAINING is in-engine too).
  *
  * Scale shape, identical to [[KMeans]]'s accepted control-flow
  * pattern: model state is a driver-held weight vector of `dim+1`
  * doubles; each iteration is ONE column-pruned scan computing the
  * batch gradient as `dim+1` codegen'd SUM aggregates (the dot product
  * unrolls into a fixed expression over array elements — no UDF, no
  * per-row allocation), collected as a single tiny row. 100 TB of
  * features trains at scan parallelism with map-side partial
  * aggregation; nothing driver-side grows with rows. Full-batch
  * gradient descent from zero init — no sampling, no rand — so the
  * same data yields the same model bit-for-bit under a fixed
  * partitioning, and across partitionings models differ only by the
  * double-sum reassociation ulps of the gradient aggregates (no
  * rand()-style run-to-run divergence).
  *
  * [[score]]/[[gate]] apply the model scan-locally (one sigmoid
  * expression), so inference composes with the curation funnel exactly
  * like the heuristic `qualityGate` — the text column still never
  * crosses an exchange.
  */
object LogReg {

  final case class Model(weights: Array[Double], bias: Double) {
    def dim: Int = weights.length
  }

  /** w·x + b as one codegen'd expression over an array column. */
  private def margin(vecCol: Column, w: Array[Double], b: Double): Column =
    w.zipWithIndex.map { case (wj, j) =>
      vecCol.getItem(j) * lit(wj)
    }.foldLeft(lit(b))(_ + _)

  /** σ(w·x + b) — the model's quality probability, scan-local. */
  def score(m: Model, vecCol: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-margin(vecCol, m.weights, m.bias)))

  /** Boolean keep/drop gate at `threshold` — drop-in next to the
    * heuristic quality gate in a curation funnel. */
  def gate(m: Model, vecCol: Column, threshold: Double = 0.5): Column =
    score(m, vecCol) >= threshold

  /** Fit by full-batch gradient descent with L2 regularization.
    * `features` must be a fixed-length array<double> column; `label`
    * a 0/1 (castable-to-double) column. One scan per iteration:
    * residual r = σ(w·x+b) − y computed inline, gradient components
    * `sum(r·x_j)` / `sum(r)` as dim+1 aggregates. Feature scaling is
    * the caller's job (z-score or min-max the signals first — raw
    * Gopher signals span orders of magnitude and would need a tiny
    * learning rate otherwise). */
  def fit(df: DataFrame, featuresCol: String, labelCol: String, dim: Int,
      iters: Int = 50, lr: Double = 1.0, l2: Double = 0.0): Model = {
    require(dim >= 1 && iters >= 1, s"bad logreg params dim=$dim iters=$iters")
    val data = df.select(col(featuresCol).as("x"),
      col(labelCol).cast("double").as("y"))
    val w = new Array[Double](dim)
    var b = 0.0
    var n = -1L
    var i = 0
    while (i < iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-margin(col("x"), w, b)))
      val r = p - col("y")
      val aggs = count(lit(1)).as("n") +: sum(r).as("gb") +:
        (0 until dim).map(j => sum(r * col("x").getItem(j)).as(s"g$j"))
      val row = data.agg(aggs.head, aggs.tail: _*).collect().head
      if (n < 0) n = row.getLong(0)
      require(n > 0, "LogReg.fit: no rows")
      val scale = lr / n
      b -= scale * row.getDouble(1)
      var j = 0
      while (j < dim) {
        w(j) -= scale * (row.getDouble(2 + j) + l2 * w(j))
        j += 1
      }
      i += 1
    }
    Model(w, b)
  }
}
