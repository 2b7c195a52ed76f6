package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic scale-up of the driver fixtures.
  *
  * The driver testdata tops out at sf0.1 (~600k lineitem rows;
  * TESTDATA.md); the 100 TB claims need a measured scale step, not just
  * plan-shape argument. `scale(src, dst, factor)` replicates every fixture
  * table `factor`× with KEY-SPACE GROWTH, so the scaled data stresses the
  * same things real growth does:
  *
  *   - fact and fact-adjacent-dimension key domains grow `factor`×
  *     (new orderkeys / custkeys / partkeys / suppkeys / user_ids /
  *     doc_ids / vec_ids per replica — join build sides, distinct-agg
  *     cardinalities, and group counts all grow, not just row counts);
  *   - per-key fan-outs stay CONSTANT (lines per order, orders per
  *     customer, events per user — the TPC-H property: a join that fans
  *     out k× at sf0.1 still fans out k× at sf1);
  *   - constant-domain dimensions stay constant (region, nation,
  *     p_brand/p_type — dims don't scale with fact volume);
  *   - dates shift by `replica` days so date-grain group keys spread
  *     instead of stacking 10 identical copies on every timestamp;
  *   - document texts are re-worded per replica (every 4th token swapped
  *     for a replica-tagged token) so cross-replica pairs are NOT
  *     near-duplicates — dedup output grows linearly, as a real corpus's
  *     would, instead of quadratically as naive row replication forces;
  *     within-replica duplicate structure is preserved exactly (replicas
  *     of a dup pair get identical re-wordings);
  *   - embeddings are jittered ±60% per component so replicas are
  *     correlated-but-distinct vectors (cosine ≈ 0.94 to the original),
  *     keeping ANN cell structure realistic without creating `factor`-way
  *     exact ties.
  *
  * Everything is a deterministic column expression (`hash(id, r, i)` —
  * no RNG, no driver-side data); the scaler is itself a distributed Spark
  * job, so the same code producing sf1 here would produce sf100 on a
  * cluster. Reference analogue: the corpus-scale intent of
  * `flink-tpcds-test/TpcdsTestProgram.java:49` (run the suite at a real
  * scale factor, not a toy one).
  */
object ScaleData {

  /** Marker written after ALL tables land; its content pins (src, factor)
    * so a stale or partial dir is never silently reused. */
  private def markerFor(src: String, factor: Int): String =
    s"graft-scale v1 src=$src factor=$factor"

  def isComplete(dst: String, src: String, factor: Int): Boolean = {
    val f = new java.io.File(dst, "_GRAFT_SCALE_OK")
    f.isFile && {
      val got = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      got == markerFor(src, factor)
    }
  }

  /** Scale every fixture table from `src` into `dst` by `factor`. */
  def scale(spark: SparkSession, src: String, dst: String,
            factor: Int): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    import graft.engine.Tables

    def load(name: String): DataFrame = Tables.load(spark, src, name)
    // one tiny scalar agg per table: the key stride is the source's own
    // key-domain size, so the scaler composes (sf0.1 -> sf1 -> sf10)
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    val nCust = stride(load("customer"), "c_custkey")
    val nSupp = stride(load("supplier"), "s_suppkey")
    val nPart = stride(load("part"), "p_partkey")
    val nOrd = stride(load("orders"), "o_orderkey")
    val nEvent = stride(load("events"), "event_id")
    val nUser = stride(load("events"), "user_id")
    val nDoc = stride(load("documents"), "doc_id")
    val nVec = stride(load("embeddings"), "vec_id")

    // replicate: one output row per (input row, replica r in [0, factor))
    def reps(df: DataFrame): DataFrame =
      df.withColumn("r", explode(sequence(lit(0L), lit(factor - 1L))))

    def shiftKey(c: String, n: Long) = (col(c) + col("r") * n).as(c)
    // r=0 is the identity replica: byte-for-byte the source rows
    def tagName(c: String) =
      when(col("r") === 0, col(c))
        .otherwise(concat(col(c), lit("#r"), col("r"))).as(c)
    def shiftDays(c: String) = expr(s"timestampadd(DAY, r, $c)").as(c)

    def write(df: DataFrame, name: String, files: Int): Unit =
      df.drop("r").repartition(files)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")

    // constant-domain dims: copy (their cardinality does not scale)
    write(load("region"), "region", 1)
    write(load("nation"), "nation", 1)

    write(reps(load("customer")).select(
      shiftKey("c_custkey", nCust), tagName("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")), "customer", 4)

    write(reps(load("supplier")).select(
      shiftKey("s_suppkey", nSupp), tagName("s_name"), col("s_nationkey"),
      col("s_acctbal")), "supplier", 2)

    write(reps(load("part")).select(
      shiftKey("p_partkey", nPart), tagName("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")), "part", 4)

    write(reps(load("orders")).select(
      shiftKey("o_orderkey", nOrd), shiftKey("o_custkey", nCust),
      col("o_orderstatus"), col("o_totalprice"),
      shiftDays("o_orderdate"), col("o_orderpriority")), "orders", 16)

    // o_orderdate and l_shipdate shift by the SAME r days, preserving
    // the ship-lag distribution the interval/as-of joins depend on
    write(reps(load("lineitem")).select(
      shiftKey("l_orderkey", nOrd), shiftKey("l_partkey", nPart),
      shiftKey("l_suppkey", nSupp), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"),
      shiftDays("l_shipdate")), "lineitem", 32)

    write(reps(load("events")).select(
      shiftKey("event_id", nEvent), shiftDays("ts"),
      shiftKey("user_id", nUser), col("event_type"), col("value"),
      col("props")), "events", 16)

    // Re-word replica texts so cross-replica pairs fall BELOW near-dup
    // thresholds: every 4th token (offset rotates with r) becomes a
    // replica-tagged token, so any k>=4 consecutive-token shingle
    // contains at least one replaced slot and shingle sets across
    // replicas are disjoint. The replacement depends only on (r, i) —
    // NOT doc_id — so two docs that were (near-)duplicates in the source
    // receive identical re-wordings and stay (near-)duplicates within
    // every replica: dup-group COUNT grows factor×, group SIZES don't.
    val perturbedText = expr(
      """array_join(transform(split(text, ' '), (w, i) ->
        |  CASE WHEN r > 0 AND pmod(i, 4) = pmod(r - 1, 4)
        |       THEN concat('zq', r, 'w', pmod(i, 13)) ELSE w END), ' ')
        |""".stripMargin).as("text")
    write(reps(load("documents")).select(
      shiftKey("doc_id", nDoc), perturbedText, col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents", 8)

    // Deterministic ±60% per-component jitter: replicas are correlated
    // with the original (same cluster/IVF cell neighborhood) but not
    // exact ties — cosine(orig, replica) ≈ 0.94, below exact-dup range.
    val jittered = expr(
      """transform(embedding, (x, i) -> CAST(x * (1.0D +
        |  1.2D * (pmod(hash(vec_id, r, i), 1001) / 1000.0D - 0.5D))
        |  AS FLOAT))""".stripMargin).as("embedding")
    write(reps(load("embeddings")).select(
      shiftKey("vec_id", nVec), jittered, col("label")), "embeddings", 4)

    val marker = new java.io.File(dst, "_GRAFT_SCALE_OK")
    java.nio.file.Files.write(marker.toPath,
      (markerFor(src, factor) + "\n").getBytes("UTF-8"))
  }

  /** Scale `src` into `dst` unless a complete, matching run is already
    * there. Returns generation seconds (0.0 on reuse). */
  def ensure(spark: SparkSession, src: String, dst: String,
             factor: Int): Double = {
    if (isComplete(dst, src, factor)) 0.0
    else {
      val t0 = System.nanoTime()
      scale(spark, src, dst, factor)
      (System.nanoTime() - t0) / 1e9
    }
  }

  /** CLI: ScaleData <srcDir> <dstDir> [factor=10]. */
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse(
      new java.io.File("target/scaledata/sf1").getAbsolutePath)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.engine.GraftSession.local()
    val sec = ensure(spark, src, dst, factor)
    println(f"scaled $src -> $dst factor=$factor in $sec%.1f s")
    spark.stop()
  }
}
