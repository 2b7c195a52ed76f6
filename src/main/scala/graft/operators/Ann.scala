package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

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
}
