package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Lloyd k-means over DataFrames — the learned coarse quantizer for IVF
  * ANN (the label-cell mode in SimilarityQueries is the deterministic
  * oracle-checked stand-in; this is the real thing).
  *
  * Scale shape per iteration:
  *   - assignment is SCAN-LOCAL: the k centroids are a driver-held array
  *     planted as an array literal, and argmin runs as a codegen'd
  *     higher-order-function fold per row — no shuffle, no crossJoin;
  *   - the update is ONE partial-aggregated shuffle of (cell, dim) sums
  *     — k·dim rows cross the exchange regardless of corpus size;
  *   - the k·dim update result is collected to the driver (control flow
  *     only, like connectedComponents' convergence counts), so lineage
  *     resets every round — no checkpoint needed.
  *
  * At 100 TB one fits on a sample (`points.sample(...)`) and assigns the
  * full corpus once — the standard IVF build. Fixed `iters` keeps the
  * driver loop bounded and deterministic in structure.
  */
object KMeans {

  private[operators] def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Learn `k` centroids from `vecCol` (array<double>). Init is
    * farthest-first traversal (Gonzalez; the deterministic cousin of
    * k-means++): seed 1 is the row with the smallest seeded content hash
    * — a pure function of the data, stable across partition layouts and
    * retries (a rand()-based init would not be) — and each next seed
    * maximizes its distance to the seeds so far, so well-separated
    * clusters get one seed each and Lloyd can't collapse into the
    * split-cluster local optimum a blind init invites. Each seed pick is
    * a TakeOrdered(1): k cheap scans, driver holds only k vectors.
    * With fewer distinct vectors than k the farthest-first loop repeats
    * a seed — harmless: duplicate cells simply stay empty in assign
    * (ties go to the lower cell id). */
  def fit(points: DataFrame, vecCol: String, k: Int, iters: Int,
      seed: Long = 42L): Array[Array[Double]] = {
    require(k >= 1 && iters >= 1, s"bad k-means params k=$k iters=$iters")
    val hashed = points
      .select(col(vecCol).as("v"))
      .withColumn("__h", md5(concat_ws(",",
        col("v").cast("string"), lit(seed.toString))))
    val firstRows = hashed.orderBy(col("__h")).limit(1).collect()
    require(firstRows.nonEmpty,
      s"KMeans.fit: input has no rows (column $vecCol) — nothing to seed from")
    val first = firstRows(0).getSeq[Double](0).toArray
    val seeds = scala.collection.mutable.ArrayBuffer(first)
    while (seeds.length < k) {
      val minDist = seeds.map(c => sqDist(col("v"), typedLit(c.toSeq)))
        .reduce((a, b) => least(a, b))
      val far = hashed.withColumn("__d", minDist)
        .orderBy(desc("__d"), col("__h")).limit(1)
        .collect()(0).getSeq[Double](0).toArray
      seeds += far
    }
    var cents: Array[Array[Double]] = seeds.toArray
    for (_ <- 1 to iters) {
      val assigned = assign(points, vecCol, cents, "__cell")
      // per-(cell, dim) mean: map-side partials collapse each partition
      // to ≤ k·dim rows before the exchange
      val sums = assigned.select(col("__cell"), posexplode(col(vecCol)))
        .groupBy(col("__cell"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            rows.sortBy(_.getInt(1)).map(r => r.getDouble(2) / r.getLong(3))
              .toArray
          case None => cents(c) // an emptied cell keeps its centroid
        }
      }.toArray
    }
    cents
  }

  /** Nearest-centroid cell id per row (squared euclidean, ties to the
    * lower cell id) — scan-local codegen'd argmin over the broadcast
    * centroid literals. */
  def assign(points: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], cellCol: String): DataFrame = {
    val centArr = array(centroids.map(c => typedLit(c.toSeq)): _*)
    val scored = transform(centArr, (cv, i) =>
      struct(sqDist(col(vecCol), cv).as("d"), i.as("cell")))
    points.withColumn(cellCol, array_min(scored).getField("cell"))
  }
}
