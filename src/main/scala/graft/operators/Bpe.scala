package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING — the "train a tokenizer on the
  * corpus" step of a training-data pipeline, in-engine (reference
  * analogue: none — Flink 1.13 ships no tokenizer training; the public
  * algorithm is Sennrich et al. 2016, arXiv:1508.07909).
  *
  * The scale trick is the WORD-HISTOGRAM reduction: exactly ONE scan of
  * the corpus builds the (word, count) vocabulary, and every merge
  * round after that runs over the VOCAB — ~10^5..10^6 rows for any
  * natural-language corpus, INDEPENDENT of corpus bytes. 100 TB of text
  * trains at the cost of one corpus scan plus `numMerges` jobs over a
  * cached million-row table. Per round:
  *
  *  - pair counting: adjacent-pair explode over the segmentations,
  *    weighted by word count, one tiny groupBy — all builtins
  *    (`transform`/`element_at`/`explode`), codegen'd;
  *  - winner selection: deterministic total order (count DESC, then
  *    pair lexicographic) — same data, same merges, any partitioning;
  *  - merge application: a left-to-right non-overlapping fold over each
  *    segmentation, expressed with `aggregate` over a (out, pending)
  *    struct state — a pure Catalyst expression, no UDF;
  *  - `localCheckpoint` truncates the per-round plan lineage (the
  *    vocab is tiny; K rounds would otherwise stack K nested
  *    expressions into one unplannable tree).
  *
  * ENCODING with the learned merges ([[tokens]]) is the one deliberate
  * UDF in this module: greedy lowest-rank merging loops a
  * data-dependent number of times per word, which has no builtin form
  * — the same justified-kernel trade as the multimodal codec and the
  * token packer's `mapPartitions` (real tokenizers are native
  * functions). It is partition-local: encoding adds no exchange.
  */
object Bpe {

  /** End-of-word marker (Sennrich's `</w>`): merges can't cross word
    * boundaries, and a token ending in the marker is word-final. */
  val End = "</w>"

  final case class Merge(a: String, b: String)

  /** Characters of `w` plus the end marker, as a segmentation array. */
  private def initSeg(w: Column): Column =
    concat(filter(split(w, ""), x => x =!= ""), array(lit(End)))

  /** One merge (a,b)→ab applied left-to-right, non-overlapping — the
    * training-side fold, all builtins. State: (out, pending). */
  private[graft] def applyMerge(seg: Column, a: String, b: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"), lit("").as("p"))
    aggregate(seg, init,
      (st, t) => {
        val out = st.getField("out")
        val p = st.getField("p")
        when(p === lit(a) && t === lit(b),
          struct(concat(out, array(lit(a + b))).as("out"), lit("").as("p")))
          .when(p === "", struct(out.as("out"), t.as("p")))
          .otherwise(struct(concat(out, array(p)).as("out"), t.as("p")))
      },
      st =>
        when(st.getField("p") === "", st.getField("out"))
          .otherwise(concat(st.getField("out"),
            array(st.getField("p")))))
  }

  /** Adjacent (a, b) pairs of a segmentation, as structs. */
  private def adjacentPairs(seg: Column): Column =
    transform(slice(seg, lit(1), size(seg) - 1),
      (x, i) => struct(x.as("a"), element_at(seg, i + 2).as("b")))

  /** The (word, count) vocabulary of `textCol` — the one corpus scan. */
  def wordHistogram(docs: DataFrame, textCol: String,
      minCount: Long = 1L): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)

  /** Learn `numMerges` merges. Stops early when no adjacent pair
    * reaches `minPairCount`. Deterministic: ties break lexicographic. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 1L, minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, s"Bpe.train: numMerges=$numMerges")
    val spark = docs.sparkSession
    var vocab = wordHistogram(docs, textCol, minCount)
      .select(initSeg(col("w")).as("seg"), col("cnt"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = vocab
        .select(col("cnt"), explode(adjacentPairs(col("seg"))).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(desc("n"), col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getAs[Long]("n") < minPairCount)
        exhausted = true
      else {
        val (a, b) = (top.head.getAs[String]("a"), top.head.getAs[String]("b"))
        merges += Merge(a, b)
        val prev = vocab
        vocab = vocab
          .select(applyMerge(col("seg"), a, b).as("seg"), col("cnt"))
          .localCheckpoint(true)
        prev.unpersist()
        i += 1
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Greedy lowest-rank-first replay of the learned merges on one word
    * — reproduces the training-side segmentation (leftmost occurrence
    * first within a rank, rescan after each merge). */
  private[graft] def segment(word: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var toks = word.map(_.toString).toArray :+ End
    var done = toks.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var j = 0
      while (j < toks.length - 1) {
        val r = ranks.getOrElse((toks(j), toks(j + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        toks = toks.patch(bi, Array(toks(bi) + toks(bi + 1)), 2)
        done = toks.length < 2
      }
    }
    toks
  }

  /** Encode `textCol` with the learned merges: adds `outCol` =
    * array<string> of BPE tokens. Partition-local (the one justified
    * UDF — see the object doc); no exchange added. */
  def tokens(df: DataFrame, textCol: String, merges: Seq[Merge],
      outCol: String = "bpe_tokens"): DataFrame = {
    val ranks = merges.zipWithIndex
      .map { case (m, r) => (m.a, m.b) -> r }.toMap
    val enc = udf((text: String) =>
      if (text == null) null
      else text.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => segment(w, ranks)))
    df.withColumn(outCol, enc(col(textCol)))
  }
}
