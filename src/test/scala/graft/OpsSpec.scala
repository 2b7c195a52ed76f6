package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ops
import graft.operators.Ops._

/** Operator-level invariants for graft.operators.Ops. */
class OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private def orders = graft.engine.Tables
    .load(spark, SparkFixture.sf, "orders")

  test("saltedAgg equals direct aggregation (skew mitigation)") {
    val direct = orders.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSet
    val salted = orders.saltedAgg(
      keys = Seq(col("o_orderpriority")),
      salt = 16,
      partial = Seq(
        "n" -> count(lit(1)),
        "s" -> sum(col("o_totalprice").cast("decimal(18,2)"))),
      combine = Seq(
        "n" -> (c => sum(c)),
        "s" -> (c => sum(c))))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSet
    assert(salted === direct)
  }

  test("topN emits at most n rows per key, ranked") {
    val top = orders.topN(2, Seq(col("o_orderpriority")),
      Seq(desc("o_totalprice"), col("o_orderkey")))
    val perKey = top.groupBy("o_orderpriority").count().collect()
    assert(perKey.forall(_.getLong(1) <= 2))
    assert(top.where(col("rn") > 2).count() === 0)
  }

  test("stratified sample respects per-stratum fractions, seeded") {
    val docs = graft.engine.Tables.load(spark, SparkFixture.sf, "documents")
    val fr: Map[Any, Double] = Map("web" -> 0.5, "book" -> 0.1)
    def sample() = docs.stratifiedSample("source", fr, seed = 42L)
    val counts = sample().groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.keySet.foreach(k => assert(fr.contains(k))) // others excluded
    for ((k, f) <- fr; ks = k.toString; if totals.contains(ks)) {
      val got = counts.getOrElse(ks, 0L).toDouble / totals(ks)
      assert(math.abs(got - f) < 0.35, s"stratum $k: got $got want ~$f")
    }
    assert(sample().collect().toSeq === sample().collect().toSeq) // seeded
  }

  test("trainValTest split is disjoint, complete, deterministic") {
    val docs = graft.engine.Tables.load(spark, SparkFixture.sf, "documents")
    val Seq(tr, va, te) = docs.trainValTest(Array(0.8, 0.1, 0.1), seed = 7L)
    val n = docs.count()
    assert(tr.count() + va.count() + te.count() === n)
    val ids = (tr.select("doc_id") union va.select("doc_id")
      union te.select("doc_id")).distinct().count()
    assert(ids === n) // disjoint + complete
    val Seq(tr2, _, _) = docs.trainValTest(Array(0.8, 0.1, 0.1), seed = 7L)
    assert(tr.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      tr2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("bandedRangeJoin equals the nested-loop theta join") {
    import org.apache.spark.sql.functions.abs
    val sup = graft.engine.Tables.load(spark, SparkFixture.sf, "supplier")
      .select(col("s_suppkey"), col("s_acctbal"))
    val cust = graft.engine.Tables.load(spark, SparkFixture.sf, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    val naive = sup.join(cust,
        abs(col("c_acctbal") - col("s_acctbal")) <= 20.0)
      .select("s_suppkey", "c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = sup.bandedRangeJoin(cust, col("s_acctbal"),
        col("c_acctbal"), 20.0)
      .select("s_suppkey", "c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === naive)
    assert(banded.nonEmpty)
    // and the plan is an equi hash join, not a nested loop
    val plan = sup.bandedRangeJoin(cust, col("s_acctbal"),
      col("c_acctbal"), 20.0).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("dedupKeepFirst keeps exactly one row per key") {
    val d = orders.dedupKeepFirst(Seq(col("o_custkey")),
      Seq(col("o_orderdate"), col("o_orderkey")))
    assert(d.count() ===
      orders.select("o_custkey").distinct().count())
    assert(!d.columns.contains("__rn"))
  }

  test("connectedComponents labels every endpoint with the min reachable id") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (12L, 10L), (21L, 20L)).toDF("a", "b")
    val got = Ops.connectedComponents(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // maxIter bounds the propagation: one round can't close the chain
    val partial = Ops.connectedComponents(edges, maxIter = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(partial(4L) === 3L) // min label moved one hop only
  }

  test("large-star/small-star equals min-label propagation on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val df = edges.toDF("a", "b")
      val viaStars = Ops.connectedComponentsLogN(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val viaLabels = Ops.connectedComponents(df, maxIter = 100).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(viaStars === viaLabels, s"trial $trial differs")
      assert(viaStars.nonEmpty)
      // every component id is its own root
      viaStars.values.foreach(c => assert(viaStars(c) === c))
    }
    // a long chain: the O(log n) path must close it in far fewer rounds
    // than its diameter (correctness checked; round count is the design)
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Ops.connectedComponentsLogN(chain, maxIter = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 63L).forall(i => got(i) === 0L),
      "64-node chain must fully collapse within 12 star rounds")
  }

  test("asofJoin equals the brute-force latest-at-or-before scan on random data") {
    // differential check: for random keyed timelines (duplicate
    // timestamps included), the single-shuffle union+window formulation
    // must agree with the obvious per-row definition — the latest right
    // payload whose ts is <= the left ts (ties between right versions
    // at one timestamp broken by the larger tie-breaker id, per the
    // window's (ts, side, tieBreaker) order)
    import graft.operators.Ops._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(99L)
    val lefts = (1 to 300).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong, i.toLong))
    val rights = (1 to 200).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong, i * 1000.0, i.toLong))
    val l = lefts.toDF("k", "secs", "event_id")
      .select(col("k"), col("secs").cast("timestamp").as("lts"),
        col("event_id"))
    val r = rights.toDF("k", "secs", "price", "rid")
      .select(col("k"), col("secs").cast("timestamp").as("rts"),
        col("price"), col("rid"))
      .withColumnRenamed("rid", "event_id")
    val got = l.asofJoin(r, "k", "lts", "rts", "price", "event_id")
      .collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).getTime / 1000,
        x.getLong(2), if (x.isNullAt(3)) -1.0 else x.getDouble(3)))
      .toSet
    val expected = lefts.map { case (k, ts, id) =>
      val cand = rights.filter(rr => rr._1 == k && rr._2 <= ts)
      // -1.0 sentinel for "no version yet": NaN breaks set equality
      val pay = if (cand.isEmpty) -1.0
        else cand.maxBy(rr => (rr._2, rr._4))._3
      (k, ts, id, pay)
    }.toSet
    assert(got.size === lefts.size)
    assert(got === expected)
  }

  test("packByTokenBudget: bins respect the budget, cover all docs, stay deterministic") {
    import graft.operators.Ops._
    import org.apache.spark.sql.functions.{col, size, split}
    val docs = graft.engine.Tables.load(spark, SparkFixture.sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("toks"))
    val budget = 256L
    def run() = docs.packByTokenBudget(col("doc_id"), col("toks"), budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val packed = run()
    val input = docs.collect().map(r => (r.getLong(0), r.getInt(1).toLong))
    // complete and exactly-once
    assert(packed.map(_._1).sorted.toSeq === input.map(_._1).sorted.toSeq)
    // every bin within budget unless it is a single oversized doc
    packed.groupBy(_._3).foreach { case (bin, ds) =>
      val total = ds.map(_._2).sum
      assert(total <= budget || ds.length == 1,
        s"bin $bin holds $total tokens across ${ds.length} docs")
    }
    // greedy fill: bins are dense — at most one doc per bin would also
    // have fit in the PREVIOUS bin of its partition (the one that
    // overflowed it); equivalently each non-final bin's total plus its
    // successor's first doc exceeds the budget
    val byPartition = packed.groupBy(_._3 >> 32)
    byPartition.values.foreach { part =>
      val bins = part.groupBy(_._3).toSeq.sortBy(_._1)
        .map { case (_, ds) => ds.sortBy(_._1) }
      bins.sliding(2).foreach {
        case Seq(prev, next) =>
          assert(prev.map(_._2).sum + next.head._2 > budget ||
            next.head._2 > budget,
            "a doc was placed in a new bin although it fit the previous")
        case _ =>
      }
    }
    // deterministic across runs
    assert(run().toSeq === packed.toSeq)
  }
}
