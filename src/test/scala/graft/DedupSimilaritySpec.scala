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

  test("lshBucketPairs: exact all-pairs under the cap") {
    import spark.implicits._
    // 3 buckets of sizes 1/3/4 — all under cap → plain all-pairs
    val bands = Seq(
      (0L, 1L, 10L), (0L, 1L, 11L), (0L, 1L, 12L),
      (1L, 2L, 20L), (1L, 2L, 21L), (1L, 2L, 22L), (1L, 2L, 23L),
      (2L, 3L, 30L)).toDF("band", "k", "doc_id")
    val got = graft.operators.Ops
      .lshBucketPairs(bands, Seq("band", "k"), "doc_id", cap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set((10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L), (20L, 22L), (20L, 23L), (21L, 22L), (21L, 23L),
      (22L, 23L))
    assert(got === want)
  }

  test("lshBucketPairs: degenerate 10k-id bucket stays bounded and connected") {
    import spark.implicits._
    val n = 10000
    val cap = 16
    // one giant bucket (the failure mode: 10k near-identical docs whose
    // signatures collide) plus a small healthy bucket
    val bands = ((1 to n).map(i => (0L, 0L, i.toLong)) ++
      Seq((1L, 1L, 100001L), (1L, 1L, 100002L))).toDF("band", "k", "doc_id")
    val pairs = graft.operators.Ops
      .lshBucketPairs(bands, Seq("band", "k"), "doc_id", cap = cap)
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    // bounded: cap*(cap-1)/2 head pairs + (n-cap) star pairs + 1 healthy
    assert(rows.length === cap * (cap - 1) / 2 + (n - cap) + 1)
    // no row ever held more than `cap` ids; connectivity is lossless:
    // every doc of the giant bucket reaches the bucket min (id 1)
    val comp = graft.operators.Ops
      .connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1 to n).forall(i => comp(i.toLong) === 1L))
    assert(comp(100002L) === 100001L)
  }

  test("jaccard stop-shingle filter shrinks the self-join input") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 30 docs all sharing one ubiquitous trigram; pairwise-distinct rest
    val docs = (1 to 30).map(i =>
      (i.toLong, s"of the and unique$i token$i word$i end$i"))
      .toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1),
          element_at(toks, i + 2), element_at(toks, i + 3))))).as("sh"))
    val hot = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") > 20).select(col("sh"))
    val filtered = sh.join(broadcast(hot), Seq("sh"), "left_anti")
    // the ubiquitous "of the and" shingle (df=30) is gone → the self-join
    // emits zero candidate rows instead of 30*29/2
    def joinRows(in: org.apache.spark.sql.DataFrame) =
      in.as("x").join(in.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .count()
    assert(joinRows(sh) === 30L * 29 / 2)
    assert(joinRows(filtered) === 0L)
  }

  test("duplicatedSpans: degenerate corpus (10k identical docs) stays bounded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Ops.GraftDataFrameOps
    // the span-path failure mode: every shingle of every doc lands in one
    // digest bucket of 10k rows. The windows over h must spill per bucket
    // (not hold a groupBy/join state explosion), and the per-doc merge
    // must produce exactly one whole-doc span per document
    val n = 10000
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = (1 to n).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val spans = docs.duplicatedSpans(col("doc_id"), col("text"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.length === n)
    assert(spans.forall { case (_, s, e, c) => s == 0L && e == 29L && c == 26L })
  }

  test("substring dedup merges overlapping duplicated runs into one span") {
    val spans = Catalog.byName("q_dedup_substring").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty)
    // every span covers at least SpanLen=5 tokens and is internally
    // consistent: n flagged starts, each covering 5 tokens and at most
    // 5 apart (the touch-merge rule), bound the island's length to
    // [5, 5n] — equality `len == n+4` would over-constrain: starts in a
    // merged island need not be consecutive positions
    assert(spans.forall { case (_, s, e, n) =>
      val len = e - s + 1
      len >= 5 && n >= 1 && len <= 5 * n
    })
    // islands are maximal: consecutive spans of one doc never touch
    // (a touching pair would have merged)
    spans.groupBy(_._1).foreach { case (_, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1 + 1)
        case _ =>
      }
    }
  }
}
