package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Catalog

/** Invariants for the training-data-pipeline operators that the DuckDB
  * oracle can't fully pin (approximate/hash-based paths). */
class DedupSimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("minhash-LSH candidate pairs are ordered and self-free") {
    val pairs = Catalog.byName("q_dedup_minhash_lsh").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length === pairs.length)
  }

  test("ngram jaccard values lie in (0, 1]") {
    val rows = Catalog.byName("q_dedup_ngram_jaccard").run(spark, sf)
      .collect().map(_.getDouble(2))
    assert(rows.nonEmpty)
    assert(rows.forall(j => j > 0.0 && j <= 1.0))
  }

  test("simhash is deterministic across runs") {
    def run() = Catalog.byName("q_dedup_simhash").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run() === run())
  }

  test("LSH kNN results are a subset of brute-force candidates with sane cosines") {
    val brute = Catalog.byName("q_knn_cosine").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Catalog.byName("q_knn_lsh").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(lsh.nonEmpty)
    assert(lsh.forall { case (_, _, c) => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 })
    // recall vs brute force top-5: LSH top-3 should overlap at least some
    val overlap = lsh.count { case (q, v, _) => brute.contains((q, v)) }
    assert(overlap > 0, "LSH found no brute-force top-5 neighbor at all")
  }

  test("IVF kNN returns ranked neighbors from the probed cell") {
    val ivf = Catalog.byName("q_knn_ivf").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(ivf.nonEmpty)
    // per query: ranks are 1..k and cosines non-increasing
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1 to sorted.length))
      assert(sorted.map(_._3).toSeq.reverse.sorted.reverse ===
        sorted.map(_._3).toSeq)
    }
    // overlap with brute force top-5 exists (cells = label clusters)
    val brute = Catalog.byName("q_knn_cosine").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.exists { case (q, v, _, _) => brute.contains((q, v)) })
  }

  test("native kNN agrees with compositional kNN") {
    val a = Catalog.byName("q_knn_cosine").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Catalog.byName("q_knn_native").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b)
  }
}
