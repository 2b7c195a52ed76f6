package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe
import graft.operators.Bpe.Merge

/** BPE tokenizer training (operators/Bpe): one corpus scan builds the
  * word histogram, every merge round runs over the vocab — corpus-size
  * independent. Pins: the classic Sennrich fixture learns the known
  * merge sequence, the expression-side fold equals the kernel-side
  * greedy replay on every vocab word, segmentations always concatenate
  * back to word+</w>, training is partitioning-invariant, and encoding
  * adds no exchange. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Sennrich et al.'s worked example: {low:5, lower:2, newest:6,
    * widest:3}. First merges: (e,s)→es 9, (es,t)→est 9, (est,</w>) 9,
    * (l,o) 7, (lo,w) 7. */
  private def fixture = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .mkString(" ")

  test("learns the classic merge sequence with deterministic tie-breaks") {
    val docs = Seq(fixture).toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 5)
    assert(merges === Seq(Merge("e", "s"), Merge("es", "t"),
      Merge("est", "</w>"), Merge("l", "o"), Merge("lo", "w")))
  }

  test("encode replays training exactly; concatenation invariant holds") {
    val docs = Seq(fixture).toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 8)
    val words = Seq("low", "lower", "newest", "widest", "lowest", "wide")
    val enc = Bpe.tokens(words.toDF("text"), "text", merges, "toks")
      .select(col("text"), col("toks")).collect()
    enc.foreach { r =>
      val toks = r.getSeq[String](1)
      // invariant: tokens concatenate back to word + </w>
      assert(toks.mkString === r.getString(0) + Bpe.End, toks)
    }
    // trained words segment to the trained units: "lowest" (unseen)
    // composes from learned subwords low + est</w>
    val lowest = enc.find(_.getString(0) == "lowest").get.getSeq[String](1)
    assert(lowest === Seq("low", "est</w>"), lowest)
  }

  test("expression-side fold == kernel-side greedy replay on every vocab word") {
    // a messier corpus incl. repeated letters (overlap edge: "aaa")
    val docs = Seq("aaa aaa aab banana bandana cabana banana banana " +
      "aaa abc abc abc").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 10, minPairCount = 1L)
    val ranks = merges.zipWithIndex.map { case (m, r) => (m.a, m.b) -> r }
      .toMap
    // replay training's folds with the expression path
    var seg = Bpe.wordHistogram(docs, "text")
      .select(col("w"), concat(filter(split(col("w"), ""), x => x =!= ""),
        array(lit(Bpe.End))).as("seg"))
    merges.foreach(m =>
      seg = seg.select(col("w"), Bpe.applyMerge(col("seg"), m.a, m.b)
        .as("seg")))
    seg.collect().foreach { r =>
      val viaExpr = r.getSeq[String](1)
      val viaKernel = Bpe.segment(r.getString(0), ranks).toSeq
      assert(viaExpr === viaKernel, s"word ${r.getString(0)}")
    }
  }

  test("training is partitioning-invariant; encoding adds no exchange") {
    val words = (0 until 2000).map(i => s"w${i % 37}token${i % 11}")
    val d1 = words.toDF("text").coalesce(1)
    val d2 = words.toDF("text").repartition(16)
    val m1 = Bpe.train(d1, "text", numMerges = 6)
    val m2 = Bpe.train(d2, "text", numMerges = 6)
    assert(m1 === m2)

    val plan = Bpe.tokens(spark.range(10).select(col("id").cast("string")
      .as("text")), "text", m1).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
