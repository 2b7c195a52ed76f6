package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, KMeans}

/** Lloyd k-means + learned-cell IVF: the verdict-item fixture where the
  * label column does NOT follow the natural clusters, so label-cell IVF
  * (the oracle-checked stand-in in SimilarityQueries) must lose to cells
  * learned by k-means. */
class KMeansSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  private val dim = 8
  private val nPerCluster = 20

  /** 60 vectors in 3 well-separated clusters (axis spikes at dims 0/1/2),
    * deterministic jitter; label = vec_id % 5 — orthogonal to cluster. */
  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val rows = for {
      c <- 0 until 3
      j <- 0 until nPerCluster
      id = (c * nPerCluster + j).toLong
    } yield {
      val v = Array.tabulate(dim) { d =>
        val spike = if (d == c) 5.0 else 0.0
        spike + ((id * 31 + d * 17) % 7 - 3) * 0.1
      }
      (id, (id % 5).toInt, v.toSeq)
    }
    rows.toDF("vec_id", "label", "v")
  }

  private lazy val queriesDf = corpus.where(col("vec_id").isin(0L, 1L, 20L, 21L, 40L, 41L))

  /** exact top-3 cosine neighbors per query (self excluded). */
  private lazy val bruteTop3: Map[Long, Set[Long]] = {
    val a = corpus.select(col("vec_id"), col("v"))
    val q = queriesDf.select(col("vec_id").as("q_id"), col("v").as("qv"))
    val dotc = aggregate(zip_with(col("v"), col("qv"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(zip_with(col("qv"), col("qv"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), col("vec_id"))
    a.crossJoin(broadcast(q)).where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), (dotc / (na * nb)).as("cos"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
  }

  private def recall(got: Array[(Long, Long)]): Double = {
    val byQ = got.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val hits = bruteTop3.toSeq.map { case (q, truth) =>
      (byQ.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    hits.sum / hits.size
  }

  test("fit recovers the natural clusters (assignment purity)") {
    val cents = KMeans.fit(corpus, "v", k = 3, iters = 4)
    assert(cents.length === 3 && cents.forall(_.length === dim))
    val assigned = KMeans.assign(corpus, "v", cents, "cell")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // every natural cluster maps to exactly one learned cell, 3 distinct
    val cellOf = assigned.groupBy { case (id, _) => id / nPerCluster }
      .map { case (c, rows) => c -> rows.map(_._2).distinct }
    assert(cellOf.values.forall(_.length === 1), s"impure cells: $cellOf")
    assert(cellOf.values.map(_.head).toSet.size === 3)
  }

  test("learned-cell IVF beats label-cell IVF when labels != clusters") {
    val cents = KMeans.fit(corpus, "v", k = 3, iters = 4)
    val kmeansGot = Ann.ivfSearch(corpus, queriesDf, "vec_id", "v",
        cents, nprobe = 1, topK = 3)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // label-cell IVF exactly as the catalog's ivfRun does it: per-label
    // mean centroid, probe the nearest label centroid, search its rows
    val labelCents = corpus.select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label").as("cell"),
        transform(col("pc"), x => x.getField("c")).as("cv"))
    val q = queriesDf.select(col("vec_id").as("q_id"), col("v").as("qv"))
    val dcos = aggregate(zip_with(col("qv"), col("cv"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x) /
      (sqrt(aggregate(zip_with(col("qv"), col("qv"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)) *
       sqrt(aggregate(zip_with(col("cv"), col("cv"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)))
    val wp = Window.partitionBy(col("q_id")).orderBy(desc("ccos"), col("cell"))
    val probed = q.crossJoin(broadcast(labelCents))
      .select(col("q_id"), col("qv"), col("cell"), dcos.as("ccos"))
      .withColumn("rn", row_number().over(wp)).where(col("rn") <= 1)
      .select(col("q_id"), col("qv"), col("cell"))
    val vcos = aggregate(zip_with(col("v"), col("qv"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x) /
      (sqrt(aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)) *
       sqrt(aggregate(zip_with(col("qv"), col("qv"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)))
    val wt = Window.partitionBy(col("q_id")).orderBy(desc("cos"), col("vec_id"))
    val labelGot = corpus.join(broadcast(probed),
        col("label") === col("cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), vcos.as("cos"))
      .withColumn("rn", row_number().over(wt)).where(col("rn") <= 3)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val kRecall = recall(kmeansGot)
    val lRecall = recall(labelGot)
    assert(kRecall >= lRecall,
      s"kmeans-cell recall $kRecall < label-cell recall $lRecall")
    assert(kRecall >= 0.9, s"kmeans-cell recall too low: $kRecall")
  }

  test("fitParallel (k-means||) recovers the same clusters as farthest-first fit") {
    val viaFF = KMeans.fit(corpus, "v", k = 3, iters = 5)
    val viaPar = KMeans.fitParallel(corpus, "v", k = 3, iters = 5)
    assert(viaPar.length === 3)
    // same clustering quality: within-cluster squared distance of the
    // parallel init must match farthest-first (both find the 3 natural
    // clusters on this well-separated fixture)
    def wcss(cents: Array[Array[Double]]): Double =
      KMeans.assign(corpus, "v", cents, "__c")
        .select(col("__c"), col("v")).collect().map { r =>
          val v = r.getSeq[Double](1).toArray
          val c = cents(r.getInt(0))
          v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
        }.sum
    val a = wcss(viaFF); val b = wcss(viaPar)
    assert(b <= a * 1.05, s"k-means|| init degraded quality: $b vs $a")
    // deterministic: content-hash sampling, not rand()
    val again = KMeans.fitParallel(corpus, "v", k = 3, iters = 5)
    assert(viaPar.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("large-k assignment: broadcast path agrees with literals, bounded plan") {
    // k = 1024 synthetic centroids: the typedLit path would plant
    // k·dim = 8192 double literals in the plan (the codegen blowup the
    // verdict flagged); the broadcast path must keep the plan O(1) in k
    // and agree with the literal path's argmin (incl. tie-to-lower-cell)
    val k = 1024
    val cents = Array.tabulate(k) { c =>
      Array.tabulate(dim)(d => ((c * 13 + d * 7) % 29 - 14) * 0.25)
    }
    val viaBroadcast = KMeans.assign(corpus, "v", cents, "cell")
    assert(k > KMeans.LiteralCentroidLimit)
    val planLen = viaBroadcast.queryExecution.executedPlan.toString.length
    assert(planLen < 20000, s"large-k plan not bounded: $planLen chars")
    val got = viaBroadcast.select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    // ground truth: driver-side argmin with first-minimum tie-breaking
    val rows = corpus.select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    rows.foreach { case (id, v) =>
      val want = cents.zipWithIndex.minBy { case (c, i) =>
        (v.indices.map(j => (v(j) - c(j)) * (v(j) - c(j))).sum, i)
      }._2
      assert(got(id) === want, s"vec $id")
    }
    // both paths agree where both are feasible (same small centroid set)
    val small = cents.take(8)
    val lit = KMeans.assign(corpus, "v", small, "cell")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val bc = KMeans.assignBroadcast(corpus, "v", small, "cell")._1
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(lit === bc)
  }

  test("assignBroadcast handles float embedding vectors") {
    import spark.implicits._
    // the embeddings fixture carries array<float>; the broadcast path
    // must coerce like the literal path's Catalyst cast
    val fdf = Seq((1L, Seq(0.1f, 0.2f)), (2L, Seq(5.0f, 5.1f)))
      .toDF("id", "v")
    val cents = Array(Array(0.0, 0.0), Array(5.0, 5.0))
    val got = KMeans.assignBroadcast(fdf, "v", cents, "cell")._1
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(got === Map(1L -> 0, 2L -> 1))
  }

  test("assignBroadcast gives a null cell for a null vector (literal-path parity)") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq(0.0, 0.0))), (2L, None)).toDF("id", "v")
    // > LiteralCentroidLimit forces the broadcast path
    val cents = (0 until 300).map(i =>
      Array(i.toDouble + 1, i.toDouble + 1)).toArray
    val got = KMeans.assign(df, "v", cents, "cell").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(got === Map(1L -> Some(0), 2L -> None))
  }

  // --- PQ / ADC ----------------------------------------------------------

  /** Per-subspace codebooks learned with KMeans.fit on the slice — the
    * real training path the catalog's label-derived stand-in replaces. */
  private def trainedCodebook(m: Int, k: Int): Array[Array[Array[Double]]] = {
    val dsub = dim / m
    (0 until m).map { sub =>
      val sliced = corpus.select(
        slice(col("v"), sub * dsub + 1, dsub).as("sv"))
      KMeans.fit(sliced, "sv", k, iters = 3)
    }.toArray
  }

  test("pqEncode: literal and broadcast paths agree with driver argmin") {
    val cb = trainedCodebook(m = 4, k = 3)
    val viaLit = Ann.pqEncode(corpus, "v", cb, "code")
      .select(col("vec_id"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val viaBc = Ann.pqEncodeBroadcast(corpus, "v", cb, 4, 2, "code")
      .select(col("vec_id"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(viaLit === viaBc)
    // driver-side ground truth, first-minimum tie-break
    val rows = corpus.select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    rows.foreach { case (id, v) =>
      val want = (0 until 4).map { sub =>
        cb(sub).zipWithIndex.minBy { case (cw, i) =>
          ((0 until 2).map(j => {
            val t = v(sub * 2 + j) - cw(j); t * t
          }).sum, i)
        }._2
      }
      assert(viaLit(id) === want, s"vec $id")
    }
  }

  test("pqEncode routes large codebooks to the broadcast path (bounded plan)") {
    val k = KMeans.LiteralCentroidLimit + 10
    val cb = (0 until 4).map(sub => Array.tabulate(k)(c =>
      Array.tabulate(2)(j => ((c * 13 + sub * 5 + j * 7) % 23 - 11) * 0.3))).toArray
    val enc = Ann.pqEncode(corpus, "v", cb, "code")
    val planLen = enc.queryExecution.executedPlan.toString.length
    assert(planLen < 20000, s"large-codebook plan not bounded: $planLen chars")
    val got = enc.select(col("vec_id"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(got.size === 60 && got.values.forall(cs =>
      cs.length === 4 && cs.forall(c => c >= 0 && c < k)))
  }

  test("pqEncode: null vector encodes to null codes, and pqSearch skips it") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq(0.0, 0.0, 0.0, 0.0))), (2L, None))
      .toDF("vec_id", "v")
    val cb = Array(Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(0.0, 0.0), Array(2.0, 2.0)))
    val enc = Ann.pqEncode(df, "v", cb, "code").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some(r.getSeq[Int](2).toSeq))).toMap
    assert(enc === Map(1L -> Some(Seq(0, 0)), 2L -> None))
    val res = Ann.pqSearch(df, df.where(col("vec_id") === 1L),
      "vec_id", "v", cb, topK = 3)
    assert(res.collect().isEmpty) // only candidate is self / null
  }

  test("pqSearch ADC finds the right cluster (learned subspace codebooks)") {
    val cb = trainedCodebook(m = 4, k = 3)
    val got = Ann.pqSearch(corpus, queriesDf, "vec_id", "v", cb, topK = 3)
      .select(col("q_id"), col("vec_id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every query returns a full top-3 and every neighbor is from the
    // query's own natural cluster (PQ collapses intra-cluster detail but
    // must not cross the well-separated cluster gaps)
    val byQ = got.groupBy(_._1)
    assert(byQ.size === 6 && byQ.values.forall(_.length === 3))
    got.foreach { case (q, v, _) =>
      assert(q / nPerCluster === v / nPerCluster,
        s"ADC crossed clusters: query $q -> $v")
    }
    // and ADC ordering is usable: decent overlap with exact cosine top-3
    val r = recall(got.map { case (q, v, _) => (q, v) })
    assert(r >= 0.5, s"ADC recall vs exact top-3 too low: $r")
  }

  test("fit is deterministic and an emptied cell keeps its centroid") {
    val a = KMeans.fit(corpus, "v", k = 3, iters = 3)
    val b = KMeans.fit(corpus, "v", k = 3, iters = 3)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // k far above the natural cluster count: some cells may empty out;
    // fit must still return k finite centroids
    val many = KMeans.fit(corpus, "v", k = 10, iters = 3)
    assert(many.length === 10)
    assert(many.forall(_.forall(x => !x.isNaN && !x.isInfinite)))
  }
}
