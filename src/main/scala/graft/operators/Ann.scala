package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}
import org.apache.spark.sql.{Encoders, Row}

/** IVF ANN search over an explicit learned coarse quantizer — the
  * generic engine behind the catalog's `q_knn_ivf*` (whose cells are the
  * deterministic label stand-in for oracle parity). Feed it
  * `KMeans.fit(...)` output for the real thing.
  *
  * Plan shape (the part that must survive 100 TB):
  *   - corpus cell assignment is SCAN-LOCAL (argmin over broadcast
  *     centroid literals, codegen'd — no shuffle);
  *   - each query expands to its `nprobe` nearest cells, and the
  *     (q_id, qv, cell) probe table — |queries|·nprobe rows — is
  *     broadcast, so candidate generation is a broadcast equi-join on
  *     cell id against the corpus scan: O(corpus + collisions), never
  *     O(corpus × queries);
  *   - exact cosine only within probed cells; per-query top-k via
  *     window rank (InferWindowGroupLimit keeps it bounded).
  */
object Ann {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Top-k cosine neighbors for each query, searching only the `nprobe`
    * cells nearest (squared-euclidean) to the query. `corpus` and
    * `queries` both expose `idCol` (long) and `vecCol` (array<double>);
    * a candidate sharing the query's id is excluded (self-match).
    * Output: (q_id, vec_id, cos, rn), rn = 1..topK. */
  def ivfSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Double]], nprobe: Int,
      topK: Int): DataFrame = {
    require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length,
      s"bad ivf params: ${centroids.length} cells, nprobe=$nprobe")
    require(topK >= 1, s"bad topK=$topK")
    val assigned = KMeans.assign(corpus, vecCol, centroids, "__cell")
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"), col("__cell"))
    val centArr = array(centroids.map(c => typedLit(c.toSeq)): _*)
    val qs = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    // nprobe nearest cells per query: sort the (dist, cell) struct array
    // and take the prefix — scan-local, no per-cell shuffle
    val scoredQ = transform(centArr, (cv, i) =>
      struct(KMeans.sqDist(col("qv"), cv).as("d"), i.as("cell")))
    val probed = qs.select(col("q_id"), col("qv"),
      explode(slice(array_sort(scoredQ), 1, nprobe).getField("cell"))
        .as("__cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), col("vec_id"))
    assigned.join(broadcast(probed), Seq("__cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine(col("v"), col("qv")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= topK)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rn"))
  }

  // --- Product quantization (PQ / ADC) ------------------------------------
  //
  // The memory-compression half of a 100 TB vector index (FAISS-style):
  // each vector is stored as m small codes (one per subspace) instead of
  // dim floats — 64×f32 = 256 bytes shrinks to m = 8 bytes, so a corpus
  // that cannot hold raw vectors in executor memory holds its codes. A
  // query is NOT quantized: it precomputes a lookup table of its distance
  // to every codeword (m·k folds, once per query), and each candidate's
  // approximate distance is then m table reads + adds (asymmetric distance
  // computation) — no per-candidate O(dim) fold at all. Train the
  // codebooks with [[KMeans.fit]] on each subspace slice; compose with
  // [[ivfSearch]] cells for IVFADC.

  /** (m subspaces, dsub dims each) after shape validation. */
  private def pqShape(codebook: Array[Array[Array[Double]]]): (Int, Int) = {
    require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
      "PQ codebook needs >= 1 codeword per subspace")
    val dsub = codebook(0)(0).length
    require(dsub >= 1 && codebook.forall(_.forall(_.length == dsub)),
      "PQ codewords must all share one subspace dimension")
    (codebook.length, dsub)
  }

  /** Squared L2 between `v[start, start+len)` (0-based) and a codeword. */
  private def subSqDist(v: Column, cw: Column, start: Int, len: Int): Column =
    aggregate(zip_with(slice(v, start + 1, len), cw, (x, y) => (x - y) * (x - y)),
      lit(0.0), (a, x) => a + x)

  /** PQ-encode `vecCol` into `outCol`: array<int> of length m, element s =
    * the 0-based id of the nearest codeword (squared L2, ties to the lower
    * id) in subspace s. SCAN-LOCAL both ways: codebooks small enough for
    * the plan go in as literals (codegen'd fold, like [[KMeans.assign]]);
    * larger ones ship once per executor as a broadcast consumed by one
    * mapPartitions. A null vector encodes to a null code array. */
  def pqEncode(df: DataFrame, vecCol: String,
      codebook: Array[Array[Array[Double]]], outCol: String): DataFrame = {
    val (m, dsub) = pqShape(codebook)
    if (codebook.map(_.length).max <= KMeans.LiteralCentroidLimit) {
      val codes = (0 until m).map { sub =>
        val scored = transform(
          array(codebook(sub).map(cw => typedLit(cw.toSeq)): _*),
          (cw, i) => struct(
            subSqDist(col(vecCol), cw, sub * dsub, dsub).as("d"), i.as("c")))
        array_min(scored).getField("c")
      }
      df.withColumn(outCol,
        when(col(vecCol).isNotNull, array(codes: _*)))
    } else pqEncodeBroadcast(df, vecCol, codebook, m, dsub, outCol)
  }

  /** Large-codebook encode: one broadcast, one mapPartitions, plan O(1)
    * in m·k (the [[KMeans.assignBroadcast]] pattern per subspace). */
  private[graft] def pqEncodeBroadcast(df: DataFrame, vecCol: String,
      codebook: Array[Array[Array[Double]]], m: Int, dsub: Int,
      outCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(codebook)
    val vIdx = df.schema.fieldIndex(vecCol)
    val isFloat = df.schema(vIdx).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val outSchema = df.schema.add(outCol, ArrayType(IntegerType), nullable = true)
    df.mapPartitions { it =>
      val cb = bc.value
      it.map { r =>
        if (r.isNullAt(vIdx)) Row.fromSeq(r.toSeq :+ null)
        else {
          val v: scala.collection.Seq[Double] =
            if (isFloat) r.getSeq[Float](vIdx).map(_.toDouble)
            else r.getSeq[Double](vIdx)
          val codes = Array.tabulate(m) { sub =>
            var best = 0; var bestD = Double.PositiveInfinity; var c = 0
            while (c < cb(sub).length) {
              val cw = cb(sub)(c)
              var s = 0.0; var i = 0
              while (i < dsub) {
                val t = v(sub * dsub + i) - cw(i); s += t * t; i += 1
              }
              if (s < bestD) { bestD = s; best = c }
              c += 1
            }
            best
          }
          Row.fromSeq(r.toSeq :+ codes.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Per-query ADC lookup table: `outCol` = array (by subspace) of arrays
    * (by codeword id) of squared L2 from the query's subvector — m·k
    * folds per QUERY, zero per candidate. */
  private def pqLutLiteral(df: DataFrame, vecCol: String,
      codebook: Array[Array[Array[Double]]], m: Int, dsub: Int,
      outCol: String): DataFrame =
    df.withColumn(outCol, array((0 until m).map { sub =>
      array(codebook(sub).map(cw =>
        subSqDist(col(vecCol), typedLit(cw.toSeq), sub * dsub, dsub)): _*)
    }: _*))

  private def pqLutBroadcast(df: DataFrame, vecCol: String,
      codebook: Array[Array[Array[Double]]], m: Int, dsub: Int,
      outCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(codebook)
    val vIdx = df.schema.fieldIndex(vecCol)
    val isFloat = df.schema(vIdx).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val outSchema = df.schema.add(outCol,
      ArrayType(ArrayType(org.apache.spark.sql.types.DoubleType)),
      nullable = true)
    df.mapPartitions { it =>
      val cb = bc.value
      it.map { r =>
        if (r.isNullAt(vIdx)) Row.fromSeq(r.toSeq :+ null)
        else {
          val v: scala.collection.Seq[Double] =
            if (isFloat) r.getSeq[Float](vIdx).map(_.toDouble)
            else r.getSeq[Double](vIdx)
          val lut = Array.tabulate(m) { sub =>
            cb(sub).map { cw =>
              var s = 0.0; var i = 0
              while (i < dsub) {
                val t = v(sub * dsub + i) - cw(i); s += t * t; i += 1
              }
              s
            }.toSeq
          }
          Row.fromSeq(r.toSeq :+ lut.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Top-k ADC neighbors (squared L2, ascending) for each query. The
    * corpus is PQ-encoded scan-locally; the tiny query side carries its
    * precomputed lookup table and is broadcast, so scoring a candidate is
    * an m-step fold of table reads over its codes — the plan is one
    * corpus scan, one broadcast join, one per-query window. Rows with a
    * null vector are skipped (they have no codes to score). Output:
    * (q_id, vec_id, adc, rn), rn = 1..topK. */
  def pqSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, codebook: Array[Array[Array[Double]]],
      topK: Int): DataFrame = {
    val (m, dsub) = pqShape(codebook)
    require(topK >= 1, s"bad topK=$topK")
    val enc = pqEncode(corpus, vecCol, codebook, "__code")
      .where(col("__code").isNotNull)
      .select(col(idCol).as("vec_id"), col("__code"))
    val qs = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val lut =
      if (codebook.map(_.length).max <= KMeans.LiteralCentroidLimit)
        pqLutLiteral(qs, "qv", codebook, m, dsub, "__lut")
      else pqLutBroadcast(qs, "qv", codebook, m, dsub, "__lut")
    val qlut = lut.where(col("__lut").isNotNull).drop("qv")
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (a, s) => a + element_at(element_at(col("__lut"), s + 1),
        element_at(col("__code"), s + 1) + 1))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    enc.crossJoin(broadcast(qlut))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), adc.as("adc"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= topK)
      .select(col("q_id"), col("vec_id"), col("adc"), col("rn"))
  }
}
