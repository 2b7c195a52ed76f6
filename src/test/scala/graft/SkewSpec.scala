package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ops
import graft.operators.Ops._

/** Skew battery (VERDICT r6 #2): prove the skew-mitigation paths ENGAGE
  * on hot-key data, not just exist. Fixture-derived zipf-ish inputs (one
  * hot key at ~20-30% of rows) drive three mechanisms:
  *
  *   1. AQE's OptimizeSkewedJoin splits the hot SMJ partition at runtime
  *      (the Spark-side analogue of the reference's skew handling next to
  *      SplitAggregateRule.scala);
  *   2. `Ops.saltedAgg` spreads the hot group over `salt` reducers in
  *      phase 1 — asserted structurally through the operator's own public
  *      API (the phase-2 partial-row count per key IS the number of
  *      phase-1 reducers that key used);
  *   3. `Ops.lshBucketPairs` caps a degenerate hot bucket at linear
  *      output (cap·(cap−1)/2 pairs + one star row per overflow member)
  *      instead of the quadratic all-pairs blow-up.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Skewed join input: hot key 0 carries half the rows, the rest spread
    * over 5k keys; 100-char payload so partition BYTES (what AQE's skew
    * detector measures) are skewed, not just row counts. */
  private def zipfSide(n: Long, tag: String, hotPct: Int = 30) =
    spark.range(n)
      .withColumn("k", when(pmod(col("id"), lit(10)) < hotPct / 10, lit(0L))
        .otherwise(pmod(col("id"), lit(5000))))
      .withColumn("payload", concat(lit(tag), lpad(col("id"), 100, "x")))

  test("AQE OptimizeSkewedJoin splits the hot partition of an SMJ") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k))
    try {
      // force a shuffle join and make the detector's thresholds
      // proportionate to the test's MBs (defaults are cluster-sized)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "256KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val left = zipfSide(400000, "L", hotPct = 50)
      // keyed dimension side: one row per key, but broadcast is disabled
      // so the join MUST shuffle both sides — the hot left partition
      // (~200k rows × ~110 B ≈ 20 MB vs sibling partitions' ~2 MB) is
      // skewed by both the factor and the byte threshold
      val right = spark.range(5001).select(col("id").as("k"),
        lpad(col("id"), 100, "y").as("rpay"))
      // consume the join with a GLOBAL aggregate: a groupBy on the join
      // key would require hash distribution on k and legally veto the
      // split (OptimizeSkewedJoin preserves required distributions); the
      // global agg leaves the join free to re-partition. sum(length())
      // keeps the wide payload alive through the join — column pruning
      // would otherwise shrink the shuffled bytes below the threshold.
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("b"))
      // collect() runs THIS queryExecution, so the AdaptiveSparkPlan
      // below is the runtime-final plan (skew split is an AQE decision)
      val row = joined.collect().head
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), s"expected an SMJ:\n$p")
      assert(p.contains("skewed"),
        s"AQE did not split the skewed partition:\n$p")
      // and the split didn't change the answer (every left row joins)
      assert(row.getLong(0) === 400000L)
      assert(row.getLong(1) === 400000L * 101L)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("q_ds_inventory_ahead shape: skew split needs " +
      "forceOptimizeSkewedJoin when the aggregate shares the join grain") {
    // the two-grain fact×fact shape (SMJ feeding a groupBy ON THE JOIN
    // KEY): OptimizeSkewedJoin legally VETOES the split here, because
    // splitting breaks the hash distribution the downstream aggregate
    // requires. The documented mitigation for this shape is
    // spark.sql.adaptive.forceOptimizeSkewedJoin=true (accept one extra
    // shuffle to un-skew the join) — prove the flag actually engages.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "256KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val left = zipfSide(400000, "L", hotPct = 50)
      val right = spark.range(5001).select(col("id").as("k"),
        lpad(col("id"), 100, "y").as("rpay"))
      val joined = left.join(right, "k")
        .groupBy("k").agg(count(lit(1)).as("n"), max("payload").as("p"))
      val rows = joined.collect()
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), s"expected an SMJ:\n$p")
      assert(p.contains("skewed"),
        s"forced skew split did not engage:\n$p")
      assert(rows.find(_.getLong(0) == 0L).map(_.getLong(1)) ===
        Some(200000L))
      assert(rows.map(_.getLong(1)).sum === 400000L)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("saltedAgg spreads the hot group over `salt` phase-1 reducers " +
      "and agrees with the unsalted aggregate") {
    val df = zipfSide(300000, "S").select(col("k"), col("id").as("v"))
    val salt = 16
    // the `parts` combine column counts PHASE-1 PARTIAL ROWS per key —
    // i.e. how many (key, salt) groups phase 1 actually produced
    val salted = df.saltedAgg(Seq(col("k")), salt,
      partial = Seq("s" -> sum(col("v")), "c" -> count(lit(1)),
        "parts" -> count(lit(1))),
      combine = Seq("s" -> ((c: org.apache.spark.sql.Column) => sum(c)),
        "c" -> ((c: org.apache.spark.sql.Column) => sum(c)),
        "parts" -> ((c: org.apache.spark.sql.Column) => count(c))))
    val plain = df.groupBy("k")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
    // correctness: exact agreement with the single-phase aggregate
    val diff = salted.select(col("k"), col("s"), col("c"))
      .except(plain).count() +
      plain.except(salted.select(col("k"), col("s"), col("c"))).count()
    assert(diff === 0L, "salted aggregate diverged from groupBy")
    // structure: the 90k-row hot key used (nearly) every salt bucket;
    // a singleton key used exactly one
    val hotParts = salted.filter(col("k") === 0).head
      .getAs[Long]("parts")
    assert(hotParts >= salt / 2 && hotParts <= salt,
      s"hot key spread over $hotParts of $salt salt buckets")
    val typicalMax = salted.filter(col("k") =!= 0)
      .agg(max(col("parts"))).head.getLong(0)
    assert(typicalMax <= salt)
  }

  test("lshBucketPairs stays linear on a degenerate hot bucket") {
    val hotN = 1000
    val cap = 16
    // one bucket shared by 1000 ids (a boilerplate band every doc emits)
    // plus healthy buckets of size 2
    val hot = spark.range(hotN).select(lit(0L).as("band"),
      lit("HOT").as("sig"), col("id").as("doc"))
    val ok = spark.range(200).select(
      (col("id") / 2 + 1).cast("long").as("band"),
      lit("ok").as("sig"), (col("id") + 10000).as("doc"))
    val pairs = Ops.lshBucketPairs(hot.union(ok),
      Seq("band", "sig"), "doc", cap = cap)
    val hotPairs = pairs.filter(col("a") < hotN && col("b") < hotN).count()
    val quadratic = hotN.toLong * (hotN - 1) / 2
    val linearBound = cap.toLong * (cap - 1) / 2 + hotN
    assert(hotPairs <= linearBound,
      s"hot bucket emitted $hotPairs pairs (quadratic would be $quadratic)")
    // overflow members still connect to the bucket (star to the head),
    // so corpus-dedup connectivity survives the cap
    val connected = pairs.filter(col("a") < hotN && col("b") < hotN)
      .select(explode(array(col("a"), col("b"))).as("d"))
      .distinct().count()
    assert(connected === hotN.toLong,
      s"cap disconnected bucket members: $connected of $hotN present")
    // healthy buckets are untouched: exactly one pair each
    assert(pairs.filter(col("a") >= 10000).count() === 100L)
  }
}
