package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The engine's reusable relational operator surface — the operators the
  * reference ships as dedicated runtime classes, exposed here as
  * composable DataFrame transforms (`import graft.operators.Ops._`).
  *
  * Each method returns a plain DataFrame so Catalyst plans/fuses it like
  * any built-in; nothing here materializes, collects, or caches.
  */
object Ops {

  implicit final class GraftDataFrameOps(private val df: DataFrame)
      extends AnyVal {

    /** Top-N rows per partition key (reference StreamExecRank.java:69 /
      * AppendOnlyTopNFunction.java:48 — the ROW_NUMBER()<=N pattern).
      * `order` must give a total order for deterministic results. */
    def topN(n: Int, partitionBy: Seq[Column], order: Seq[Column],
        rankCol: String = "rn"): DataFrame = {
      val w = Window.partitionBy(partitionBy: _*).orderBy(order: _*)
      df.withColumn(rankCol, row_number().over(w))
        .where(col(rankCol) <= n)
    }

    /** Deduplicate keeping the first row per key in `order` (reference
      * StreamExecDeduplicate.java:70, keep-first). */
    def dedupKeepFirst(keys: Seq[Column], order: Seq[Column]): DataFrame =
      df.topN(1, keys, order, rankCol = "__rn").drop("__rn")

    /** Event-time as-of join (reference TemporalRowTimeJoinOperator.java:78,
      * FOR SYSTEM_TIME AS OF): for each left row, attach `payload` from
      * the latest right row with the same key and rightTs <= leftTs.
      *
      * Scalable pattern: union both sides, ONE shuffle on the key, running
      * last_value(ignore nulls) over event time — no per-row point
      * lookups, no build-side materialization of version history.
      * Ties at equal timestamps resolve right-before-left (inclusive
      * as-of), then by `tieBreaker` (latest wins).
      */
    def asofJoin(right: DataFrame, key: String, leftTs: String,
        rightTs: String, payload: String, tieBreaker: String,
        as: String = "asof_value"): DataFrame = {
      require(df.columns.contains(tieBreaker),
        s"asofJoin tieBreaker '$tieBreaker' must be a column of the left " +
          s"DataFrame (it orders the unioned timeline); left columns: " +
          df.columns.mkString(", "))
      val leftCols = df.columns
      val l = df
        .withColumn("__ts", col(leftTs))
        .withColumn("__pay", lit(null).cast(
          right.schema(payload).dataType))
        .withColumn("__side", lit(1))
      // keep the tie-breaker's real value on the right side (it orders
      // concurrent versions at equal timestamps); all other left columns
      // ride along as typed nulls
      val rBase = right.select(
        (Seq(col(key), col(rightTs).as("__ts"), col(payload).as("__pay"),
          lit(0).as("__side")) ++
          (if (right.columns.contains(tieBreaker) && tieBreaker != key)
            Seq(col(tieBreaker)) else Seq.empty)): _*)
      val rAligned = l.columns.foldLeft(rBase) { (acc, c) =>
        if (acc.columns.contains(c)) acc
        else acc.withColumn(c, lit(null).cast(l.schema(c).dataType))
      }.select(l.columns.map(col).toIndexedSeq: _*)
      val w = Window.partitionBy(col(key))
        .orderBy(col("__ts"), col("__side"), col(tieBreaker))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      l.unionByName(rAligned)
        .withColumn(as, last(col("__pay"), ignoreNulls = true).over(w))
        .where(col("__side") === 1)
        .select((leftCols.map(col) :+ col(as)).toIndexedSeq: _*)
    }

    /** Time-interval join (reference StreamExecIntervalJoin.java:67):
      * rows of `right` with the same key and rightTs in
      * [leftTs + lower, leftTs + upper]. Equi-join on the key; Catalyst
      * evaluates the range as a post-join predicate, so the shuffle is
      * key-partitioned exactly once per side. */
    def intervalJoin(right: DataFrame, keyEq: Column, leftTs: Column,
        rightTs: Column, lower: String, upper: String): DataFrame =
      df.join(right, keyEq
        && rightTs >= leftTs + expr(s"interval $lower")
        && rightTs <= leftTs + expr(s"interval $upper"))

    /** Two-phase salted aggregation for skewed keys (reference
      * SplitAggregateRule.scala — distinct-agg skew split; general skew
      * mitigation next to AQE's skew-join): phase 1 aggregates on
      * (key, salt) so one hot key spreads over `salt` reducers, phase 2
      * combines the partials. Correct for algebraic aggregates
      * (sum/count/min/max) — pass the same exprs to both phases via
      * `partial` and `combine`. */
    def saltedAgg(keys: Seq[Column], salt: Int,
        partial: Seq[(String, Column)],
        combine: Seq[(String, Column => Column)]): DataFrame = {
      val salted = df.withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      val p1 = salted.groupBy((keys :+ col("__salt")): _*)
        .agg(partial.head._2.as(partial.head._1),
          partial.tail.map { case (n, c) => c.as(n) }: _*)
      p1.groupBy(keys: _*)
        .agg(combine.head._2(col(combine.head._1)).as(combine.head._1),
          combine.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
    }

    /** Banded range join: pairs with |leftVal − rightVal| ≤ width,
      * executed as an EQUI-join on width-sized buckets (left side
      * explodes to its bucket ±1) plus an exact residual filter — the
      * scale path for the reference's theta/range joins: a
      * BroadcastNestedLoopJoin is O(n·m) and unshippable at 100 TB; this
      * shuffles each side once on the bucket key. */
    def bandedRangeJoin(right: DataFrame, leftVal: Column, rightVal: Column,
        width: Double): DataFrame = {
      val lb = floor(leftVal / width).cast("long")
      val exploded = df.withColumn("__bucket",
        explode(array(lb - 1, lb, lb + 1)))
      val r = right.withColumn("__rbucket",
        floor(rightVal / width).cast("long"))
      exploded.join(r, col("__bucket") === col("__rbucket")
          && rightVal >= leftVal - width && rightVal <= leftVal + width)
        .drop("__bucket", "__rbucket")
    }

    /** Deterministic cap-per-key sample: keep at most `n` rows per key,
      * chosen by a seeded content hash rather than arrival order — the
      * "at most N documents per domain" balancing step of a corpus
      * pipeline. Unlike rand()-based sampling the choice is a pure
      * function of (key, id, seed): stable across partition layouts,
      * retries, and cluster sizes. One shuffle on the key. */
    def capPerKey(keyCol: Column, idCol: Column, n: Int,
        seed: Long): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      // the hash is materialized as a column and the window orders by the
      // ATTRIBUTE, not the expression: a Column val reused in both a
      // projection and a window spec plants the same Conv instance at two
      // plan sites, and evaluation then yields corrupt values (observed
      // on Spark 4.1; pinned by the q_sample_per_key oracle)
      val ord = conv(substring(md5(concat_ws("",
        idCol.cast("string"), lit(seed.toString))), 1, 8), 16, 10)
        .cast("long")
      val w = Window.partitionBy(keyCol).orderBy(col("__ord"), idCol)
      df.withColumn("__ord", ord)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= n)
        .drop("__ord", "__rn")
    }

    /** Sequence packing for training-batch construction: assign each
      * document to a bin so every bin's token total stays within
      * `budget`, filling greedily in id order (a document larger than
      * the budget gets a bin of its own). Output: (id, n_tokens,
      * bin_id), bin ids globally unique. Null or negative token counts
      * fail fast with a clear error.
      *
      * Determinism & scale: ids are bucketed into `buckets` equal-width
      * id-range BLOCKS computed from the exact (min, max) id — a pure
      * function of the data and the argument, NOT of sampling, RDD ids,
      * or executor count (repartitionByRange would be none of those: its
      * boundaries come from reservoir sampling seeded by the
      * per-execution RDD id). Each block packs sequentially (packing is
      * inherently a sequential scan — the reset-on-overflow running sum
      * has no window-function form); bins never span blocks, so bin ids
      * compose as (block << 32 | local). Cost: one O(1) min/max
      * aggregate + one hash exchange on the block id; the same
      * assignment on every run, retry, and cluster size for a fixed
      * `buckets`. At most one underfilled bin per block — the standard
      * distributed-packing trade. Id-range blocks assume roughly
      * uniform id density (true for sequence ids); a skewed id space
      * packs correctly but with uneven task sizes. */
    def packByTokenBudget(idCol: Column, tokensCol: Column,
        budget: Long, buckets: Int = 0): DataFrame =
      Ops.packByTokenBudgetImpl(df, idCol, tokensCol, budget, buckets)

    /** Stratified sample: per-stratum Bernoulli fractions, seeded
      * (training-pipeline class balancing; `DataSet.sample` analogue with
      * per-key control). Scan-local — no shuffle. */
    def stratifiedSample(stratumCol: String, fractions: Map[Any, Double],
        seed: Long): DataFrame =
      df.stat.sampleBy(stratumCol, fractions, seed)

    /** Deterministic train/validation/test split. Weights normalize;
      * partitions are disjoint and complete, stable under the seed. */
    def trainValTest(weights: Array[Double], seed: Long): Seq[DataFrame] =
      df.randomSplit(weights, seed).toSeq

    /** Exact duplicate groups by content columns: one row per duplicate
      * class with the kept (minimal) id and the class size. */
    def exactDupGroups(idCol: Column, contentCols: Column*): DataFrame =
      df.groupBy(md5(concat_ws("\u0000", contentCols: _*)).as("__h"))
        .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))
        .drop("__h")

    /** Substring-level (span) dedup — ExactSubstr (Lee et al. 2021):
      * merged [span_start, span_end] token intervals (0-based, inclusive)
      * of every run of ≥ `spanLen` whitespace tokens that occurs verbatim
      * in MORE THAN ONE document. Output: (id, span_start, span_end,
      * n_shingles), unordered — the regions a cleaning pass cuts.
      *
      * Scale: positions+digests are scan-local (one md5 per position —
      * a 16-byte shuffle key, never the span text); cross-doc frequency
      * and the flag-back share ONE digest shuffle: two pipelined windows
      * over `partition by h` (dense_rank by doc id, then partition max =
      * distinct-doc count) replace the groupBy + semi-join, which forked
      * the plan into two scans of the tokenize+md5 explode — at 100 TB
      * that explode IS the dominant cost, so the fork was a guaranteed
      * 2×. The second window reuses the first's exchange AND sort (same
      * partitioning, prefix ordering — the lshBucketPairs pattern), and
      * WindowExec buffers spill per bucket, so a degenerate shingle
      * (boilerplate in millions of docs) stays disk-bounded. Interval
      * merging is a per-document window. A span duplicated across k docs
      * costs O(k) rows — no pair materialization. The token array
      * materializes once per row BEFORE the position lambda (Catalyst
      * does not CSE across lambda boundaries; inline split is
      * O(tokens²)/doc). */
    def duplicatedSpans(idCol: Column, textCol: Column,
        spanLen: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
      val tk = col("__tk")
      val pos = df
        .select(idCol.as("__id"), split(textCol, " ").as("__tk"))
        .where(size(tk) >= spanLen)
        .select(col("__id"), posexplode(transform(
          sequence(lit(0), size(tk) - spanLen),
          i => md5(array_join(slice(tk, i + 1, lit(spanLen)), " ")))))
        .toDF("__id", "pos", "h")
      // distinct docs per digest without re-reading the input: rank docs
      // within the digest bucket, then the bucket-wide max rank IS the
      // distinct-doc count (ties collapse under dense_rank)
      val wH = Window.partitionBy(col("h"))
      val flagged = pos
        .withColumn("__dr", dense_rank().over(wH.orderBy(col("__id"))))
        .withColumn("__nd", max(col("__dr")).over(wH))
        .where(col("__nd") > 1)
        .select(col("__id"), col("pos"))
      val w = Window.partitionBy(col("__id")).orderBy(col("pos"))
      // a flagged start p covers tokens [p, p+spanLen-1]; runs whose
      // covered intervals overlap or touch merge into one island
      val prevEnd = max(col("pos") + (spanLen - 1))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
      flagged
        .withColumn("nw",
          when(prevEnd.isNull || col("pos") > prevEnd + 1, 1).otherwise(0))
        .withColumn("island", sum(col("nw")).over(w))
        .groupBy(col("__id"), col("island"))
        .agg(min(col("pos")).cast("long").as("span_start"),
          (max(col("pos")) + (spanLen - 1)).cast("long").as("span_end"),
          count(lit(1)).as("n_shingles"))
        .select(col("__id").as("id"), col("span_start"), col("span_end"),
          col("n_shingles"))
    }
  }

  /** Candidate pairs per LSH band bucket, with BOUNDED per-bucket state —
    * the skew-safe core of a MinHash/SimHash near-dup pipeline. A naive
    * `collect_list(id)` per bucket holds every colliding id in ONE row: at
    * 100 TB a degenerate bucket (boilerplate docs sharing a signature)
    * holds millions of ids → single-task OOM plus an O(bucket²) pair
    * explosion. Here each bucket contributes:
    *
    *   - all pairs among its `cap` smallest ids (ranked via a spilling
    *     window sort, so no row ever carries more than `cap` ids), and
    *   - one star pair (bucket-min, id) for each id beyond the cap —
    *     linear in bucket size.
    *
    * Pair enumeration beyond the cap is lossy BY DESIGN (capped recall
    * for pairwise verification), but connectivity is lossless: every
    * member of a bucket stays connected to the bucket minimum, so the
    * downstream connected-components clustering — the step corpus dedup
    * actually runs — produces identical clusters. Buckets under the cap
    * (the overwhelming majority; df distribution of real shingle data is
    * heavy-tailed but bucket sizes are small) are exact.
    *
    * SINGLE-PASS: one shuffle on the bucket keys feeding two pipelined
    * same-partitioning windows (rank, then a cap-bounded head-id list),
    * then a per-row projection emits each pair exactly once — a head
    * row pairs with every LARGER head id, an overflow row stars to the
    * bucket minimum. No self-join, no branch re-reading the input: the
    * (often expensive) upstream — e.g. a MinHash signature pipeline —
    * is computed exactly once.
    */
  def lshBucketPairs(bands: DataFrame, bucketKeys: Seq[String],
      idCol: String, cap: Int = 256): DataFrame = {
    require(cap >= 2, s"lshBucketPairs cap must be >= 2, got $cap")
    val keys = bucketKeys.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(idCol))
    val wAll = Window.partitionBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // collect_list skips nulls → the head list never exceeds `cap` ids,
    // whatever the bucket size; the second window reuses the first's
    // exchange AND sort (same partitioning, prefix ordering)
    val headed = bands
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__heads", sort_array(collect_list(
        when(col("__rn") <= cap, col(idCol))).over(wAll)))
    headed.select(explode(
        when(col("__rn") <= cap,
          transform(
            filter(col("__heads"), h => h > col(idCol)),
            h => struct(col(idCol).as("a"), h.as("b"))))
          .otherwise(array(struct(
            element_at(col("__heads"), 1).as("a"),
            col(idCol).as("b"))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the O(log n)-round scale path for components whose
    * diameter is NOT small (web-graph-like chains), where min-label
    * propagation's O(diameter) rounds would dominate. Per round: one
    * shuffle agg + one shuffle join per star phase. Returns
    * `(id, component)`, component = min node id, same contract as
    * [[connectedComponents]].
    *
    * large-star points every neighbor larger than `u` at `u`'s minimum
    * neighborhood node; small-star re-points `u` and its smaller
    * neighbors there. The edge set monotonically flattens into stars
    * rooted at each component's minimum; convergence = a round that
    * changes nothing. */
  def connectedComponentsLogN(edges: DataFrame, a: String = "a",
      b: String = "b", maxIter: Int = 50): DataFrame = {
    // every endpoint must appear in the output — including nodes whose
    // only edges are self-loops, which the proper-edge set drops
    val allNodes = edges.select(col(a).cast("long").as("id"))
      .union(edges.select(col(b).cast("long").as("id")))
      .distinct()
    var e = edges.select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var iter = 0
    var done = e.isEmpty
    while (!done && iter < maxIter) {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      // large-star: v > u re-points to m(u) = min(Γ(u) ∪ {u})
      val m = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = sym.join(m, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      val symL = large.union(large.select(col("v").as("u"), col("u").as("v")))
      // small-star: u and its smaller neighbors re-point to the min
      val down = symL.where(col("v") < col("u"))
      val m2 = down.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = down.join(m2, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(m2.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      // both sides are distinct sets, so equal counts + empty one-way
      // difference = equality (one set-difference job instead of two)
      done = small.count() == e.count() && small.exceptAll(e).isEmpty
      e.unpersist() // release the previous round's checkpoint blocks
      e = small
      iter += 1
    }
    // converged to stars: non-roots point at their root; roots self-map;
    // nodes untouched by any proper edge map to themselves
    val labels = e.select(col("u").as("id"), col("v").as("comp"))
      .union(e.select(col("v").as("id"), col("v").as("comp")))
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
    labels.union(
      allNodes.join(labels.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("comp")))
  }

  /** Connected components over an undirected edge list `(a, b)` — the
    * clustering stage of a near-dedup pipeline (LSH candidate pairs →
    * duplicate clusters → keep one representative per cluster). Returns
    * `(id, component)` for every endpoint, component = minimum reachable
    * id.
    *
    * Min-label propagation: each round joins the symmetrized edge list
    * against the current labels and takes the per-node minimum — one
    * shuffle join + one shuffle agg per round, converging in
    * O(component diameter) rounds. LSH duplicate clusters are band-bucket
    * overlaps (near-cliques, diameter a few hops), so a handful of rounds
    * closes them; `maxIter` bounds pathological chains. `localCheckpoint`
    * truncates the growing lineage each round — without it, plan size
    * (and task serialization cost) grows linearly in rounds. The label
    * relation is one row per distinct node — orders of magnitude smaller
    * than the input corpus at 100 TB, since only docs that collide in
    * some band appear. */
  def connectedComponents(edges: DataFrame, a: String = "a", b: String = "b",
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .union(edges.select(col(b).as("src"), col(a).as("dst")))
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.union(prop)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      changed = next
        .join(labels.withColumnRenamed("comp", "comp_old"), "id")
        .where(col("comp") =!= col("comp_old")).count()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }
  /** Implementation of [[GraftDataFrameOps.packByTokenBudget]] — lives on the
    * object because the value-class wrapper cannot hold the closure's
    * anonymous classes. */
  private[operators] def packByTokenBudgetImpl(df: DataFrame, idCol: Column,
      tokensCol: Column, budget: Long, buckets: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (buckets > 0) buckets
      else spark.sparkContext.defaultParallelism
    val base = df.select(idCol.cast("long").as("id"),
      when(tokensCol.isNull || tokensCol < 0,
        raise_error(concat(lit("packByTokenBudget: null or negative " +
          "token count for id "), idCol.cast("string"))))
        .otherwise(tokensCol).cast("long").as("n_tokens"))
    // exact id range → equal-width blocks: deterministic for fixed
    // (data, buckets), unlike sampled range boundaries
    val Array(lo, hi) = base.agg(min(col("id")), max(col("id")))
      .collect().headOption.map(r =>
        if (r.isNullAt(0)) Array(0L, -1L)
        else Array(r.getLong(0), r.getLong(1))).getOrElse(Array(0L, -1L))
    if (hi < lo) return base.withColumn("bin_id", lit(0L)).limit(0)
    val width = math.max(1L, (hi - lo) / n + 1)
    val typed = base
      .withColumn("__blk", ((col("id") - lo) / width).cast("long"))
      .repartition(n, col("__blk"))
      .sortWithinPartitions(col("__blk"), col("id"))
      .select(col("__blk"), col("id"), col("n_tokens"))
      .as[(Long, Long, Long)]
    typed.mapPartitions { rows =>
      // a partition may hold several blocks (hash assignment); packing
      // state resets at each block boundary so bins never span blocks
      var blk = -1L
      var localBin = 0L
      var filled = 0L
      rows.map { case (b, id, tokens) =>
        if (b != blk) { blk = b; localBin = 0L; filled = 0L }
        else if (filled + tokens > budget) { localBin += 1; filled = 0L }
        filled += tokens
        (id, tokens, (blk << 32) | localBin)
      }
    }.toDF("id", "n_tokens", "bin_id")
  }

}
