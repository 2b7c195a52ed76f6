package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Lloyd k-means over DataFrames — the learned coarse quantizer for IVF
  * ANN (the label-cell mode in SimilarityQueries is the deterministic
  * oracle-checked stand-in; this is the real thing).
  *
  * Scale shape per iteration:
  *   - assignment is SCAN-LOCAL: the k centroids are a driver-held array
  *     planted as an array literal (argmin as a codegen'd
  *     higher-order-function fold) for small k, or shipped as a Spark
  *     broadcast consumed by one mapPartitions argmin beyond
  *     [[LiteralCentroidLimit]] — no shuffle, no crossJoin either way;
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
    lloyd(points, vecCol, seeds.toArray, iters)
  }

  /** The Lloyd refinement loop shared by both inits. */
  private def lloyd(points: DataFrame, vecCol: String,
      init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    var cents = init
    for (_ <- 1 to iters) {
      val (assigned, bc) = assignTracked(points, vecCol, cents, "__cell")
      // per-(cell, dim) mean: map-side partials collapse each partition
      // to ≤ k·dim rows before the exchange
      val sums = assigned.select(col("__cell"), posexplode(col(vecCol)))
        .groupBy(col("__cell"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
      // the collect() above fully consumed the assignment: release the
      // per-iteration centroid broadcast instead of leaking one per round
      bc.foreach(_.destroy())
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

  /** Learn `k` centroids with k-means‖ initialization (Bahmani et al.,
    * PVLDB 2012) — the SCALE path: where farthest-first runs k
    * sequential full scans (prohibitive for large k), k-means‖ runs
    * `rounds` (≈5) scans, each pseudo-sampling ~`oversample`·k candidates
    * with probability ∝ their squared distance to the candidate set so
    * far, then reduces the ≤ rounds·oversample·k weighted candidates to
    * k seeds ON THE DRIVER (weighted farthest-first — the candidate set
    * is tiny). Sampling uses seeded content-hash thresholds, not rand():
    * the same candidates on every run, retry, and partitioning. The
    * running min-distance column is MATERIALIZED per round via
    * localCheckpoint, so round r's plan compares only against round r's
    * NEW candidates instead of re-deriving a k·rounds-wide least()
    * expression over the whole history. */
  def fitParallel(points: DataFrame, vecCol: String, k: Int, iters: Int,
      rounds: Int = 5, oversample: Double = 2.0,
      seed: Long = 42L): Array[Array[Double]] = {
    require(k >= 1 && iters >= 1 && rounds >= 1 && oversample > 0,
      s"bad k-means|| params k=$k iters=$iters rounds=$rounds")
    val hashed = points
      .select(col(vecCol).as("v"))
      .withColumn("__h", md5(concat_ws(",",
        col("v").cast("string"), lit(seed.toString))))
    val firstRows = hashed.orderBy(col("__h")).limit(1).collect()
    require(firstRows.nonEmpty,
      s"KMeans.fitParallel: input has no rows (column $vecCol)")
    val first = firstRows(0).getSeq[Double](0).toArray
    val cand = scala.collection.mutable.ArrayBuffer(first -> 1L)
    // __d = squared distance to the nearest candidate so far
    var df = hashed.withColumn("__d", sqDist(col("v"), typedLit(first.toSeq)))
      .localCheckpoint()
    for (r <- 1 to rounds) {
      val sumD = df.agg(sum(col("__d"))).collect()(0).getDouble(0)
      if (sumD > 0) {
        // P(pick x) = min(1, oversample·k·d²(x)/Σd²) via a per-round
        // seeded hash uniform — deterministic Bernoulli
        val u = conv(substring(md5(concat_ws(",", col("__h"),
          lit(s"r$r"))), 1, 8), 16, 10).cast("double") / 4294967296.0
        val picked = df.where(u < lit(oversample * k) * col("__d") / sumD)
          .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
        if (picked.nonEmpty) {
          cand ++= picked.map(_ -> 0L)
          val newMin = picked.map(c => sqDist(col("v"), typedLit(c.toSeq)))
            .reduce((a, b) => least(a, b))
          df = df.withColumn("__d", least(col("__d"), newMin))
            .localCheckpoint()
        }
      }
    }
    // weight candidates by their captured population (one assign pass)
    val candArr = cand.map(_._1).toArray
    val (candAssigned, candBc) = assignTracked(df, "v", candArr, "__c")
    val weights = candAssigned
      .groupBy(col("__c")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    candBc.foreach(_.destroy())
    // driver-side weighted farthest-first down to k seeds (candidates
    // number ≤ 1 + rounds·oversample·k — trivial)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val weighted = candArr.zipWithIndex.map { case (c, i) =>
      c -> weights.getOrElse(i, 0L).toDouble.max(1.0)
    }
    val seeds = scala.collection.mutable.ArrayBuffer(weighted.head._1)
    while (seeds.length < math.min(k, weighted.length)) {
      val next = weighted.maxBy { case (c, w) =>
        w * seeds.map(s0 => d2(c, s0)).min
      }._1
      seeds += next
    }
    while (seeds.length < k) seeds += seeds.head // degenerate tiny input
    lloyd(points, vecCol, seeds.toArray, iters)
  }

  /** Above this k the centroid set must leave the plan: a `typedLit`
    * array is an expression tree of k·dim double literals — at IVF scale
    * (k = 4k–65k cells × 64+ dims) that is a multi-MB plan that blows up
    * codegen long before data size matters. Large sets ship as a Spark
    * broadcast variable consumed by one scan-local mapPartitions argmin
    * instead. */
  private[graft] val LiteralCentroidLimit = 256

  /** Nearest-centroid cell id per row (squared euclidean, ties to the
    * lower cell id) — always scan-local, no shuffle. Small centroid sets
    * are planted as plan literals (whole-stage codegen'd fold); sets
    * beyond [[LiteralCentroidLimit]] go through the broadcast path. */
  def assign(points: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], cellCol: String): DataFrame =
    assignTracked(points, vecCol, centroids, cellCol)._1

  /** Like [[assign]], but surfaces the broadcast the large-k path
    * created so a caller that fully consumes the result (e.g. the Lloyd
    * loop's per-iteration collect) can `destroy()` it instead of
    * leaking one broadcast of the whole centroid set per call. None on
    * the literal path. */
  private def assignTracked(points: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], cellCol: String)
      : (DataFrame, Option[org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]]) =
    if (centroids.length <= LiteralCentroidLimit) {
      val centArr = array(centroids.map(c => typedLit(c.toSeq)): _*)
      val scored = transform(centArr, (cv, i) =>
        struct(sqDist(col(vecCol), cv).as("d"), i.as("cell")))
      (points.withColumn(cellCol, array_min(scored).getField("cell")), None)
    } else assignBroadcast(points, vecCol, centroids, cellCol)

  /** Large-k assignment: centroids travel once per executor as a
    * broadcast array (one contiguous struct, not k literals) and a
    * single mapPartitions computes the argmin imperatively — the plan
    * stays O(1) in k. Ties resolve to the lower cell id (strict `<`
    * keeps the first minimum), matching the literal path's
    * struct-ordered array_min. */
  private[graft] def assignBroadcast(points: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], cellCol: String)
      : (DataFrame, Option[org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]]) = {
    import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}
    import org.apache.spark.sql.{Encoders, Row}
    val bc = points.sparkSession.sparkContext.broadcast(centroids)
    val vIdx = points.schema.fieldIndex(vecCol)
    // float embeddings (the embeddings fixture) read as Seq[Float]; the
    // literal path coerces through Catalyst, so match that here
    val isFloat = points.schema(vIdx).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    // nullable: a null vector gets a null cell, matching the literal
    // path (where sqDist of a null array folds to a null array_min)
    val outSchema = points.schema.add(cellCol, IntegerType, nullable = true)
    val out = points.mapPartitions { it =>
      val cents = bc.value
      it.map { r =>
        if (r.isNullAt(vIdx)) Row.fromSeq(r.toSeq :+ null)
        else {
          val v: scala.collection.Seq[Double] =
            if (isFloat) r.getSeq[Float](vIdx).map(_.toDouble)
            else r.getSeq[Double](vIdx)
          var best = 0
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cents.length) {
            val cv = cents(c)
            var s = 0.0
            var i = 0
            while (i < cv.length) { val t = v(i) - cv(i); s += t * t; i += 1 }
            if (s < bestD) { bestD = s; best = c }
            c += 1
          }
          Row.fromSeq(r.toSeq :+ best)
        }
      }
    }(Encoders.row(outSchema))
    (out, Some(bc))
  }
}
