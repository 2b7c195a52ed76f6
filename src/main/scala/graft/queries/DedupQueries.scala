package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Catalog.t

/** Deduplication operators for training-data pipelines: exact hash dedup,
  * MinHash+LSH, n-gram Jaccard, SimHash.
  *
  * Scale design: every variant is a groupBy/join on a derived key — never a
  * cartesian pair enumeration. MinHash LSH turns near-dup search into an
  * equi-join on band keys (shuffle on band key ~ O(n·bands)); Jaccard
  * verification joins only on shared shingles. MinHash permutations use
  * md5(token ⊕ seed), which both Spark and the DuckDB oracle compute
  * identically, so the whole MinHash→LSH→candidate pipeline is
  * oracle-checked end to end.
  */
object DedupQueries {

  private val NumHashes = 8
  private val BandSize = 2 // → 4 bands

  /** Per-bucket cap for LSH pair emission (see Ops.lshBucketPairs). */
  private val LshBucketCap = 64

  /** Token-run length for substring-level (span) dedup. Production
    * ExactSubstr uses ~50 tokens; the fixture docs are ≤100 tokens, so 5
    * keeps the operator observable at test scale. */
  private val SpanLen = 5

  /** Shingles appearing in more documents than this are dropped before
    * the Jaccard self-join: a shingle shared by k docs emits k² join
    * rows, and ubiquitous n-grams ("of the and") make k ≈ corpus size —
    * the classic quadratic blowup of shingle-join dedup. Stop-shingles
    * carry no discriminative signal (they match everything), so dropping
    * them is both the scale fix and standard practice; the DuckDB oracle
    * applies the identical filter. sf0.01 max df = 7 → results unchanged
    * there. */
  private val MaxShingleDf = 20

  /** Distinct 3-token shingles per doc — pure per-row array transform
    * (no explode-then-window shuffle: at 100 TB the tokenize→shingle step
    * must run scan-local, and this formulation is one narrow projection).
    * The token array is materialized ONCE per row before the lambda:
    * Catalyst does not common-subexpression-eliminate across lambda
    * boundaries, so an inline `split(...)` would re-tokenize the text for
    * every element_at — O(tokens²) per document. */
  private def shingles(s: SparkSession, d: String): DataFrame = {
    val tk = col("__tk")
    t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("__tk"))
      .where(size(tk) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), size(tk) - 3),
          i => concat_ws(" ", element_at(tk, i + 1),
            element_at(tk, i + 2), element_at(tk, i + 3))))).as("sh"))
  }

  /** The same shingle set in DuckDB SQL. */
  private val shinglesSql =
    """SELECT DISTINCT doc_id, w || ' ' || w2 || ' ' || w3 AS sh FROM (
      |  SELECT doc_id, w,
      |    LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY idx) AS w2,
      |    LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY idx) AS w3
      |  FROM (
      |    SELECT doc_id,
      |      UNNEST(string_split(text, ' ')) AS w,
      |      GENERATE_SUBSCRIPTS(string_split(text, ' '), 1) AS idx
      |    FROM documents) tk
      |) x WHERE w3 IS NOT NULL""".stripMargin

  /** The MinHash→LSH candidate-pair pipeline as a DuckDB CTE list ending
    * in `pairs(a, b)` — shared by the LSH oracle and the clustering
    * oracle. */
  private lazy val minhashPairCtes: String = {
    val P = 4294967311L
    // reconstruct the same big-endian 32-bit md5 prefix from DuckDB's
    // md5_number_upper (little-endian uint64 of digest bytes 0-7)
    val x32 = "CAST((u & 255) * 16777216 + ((u >> 8) & 255) * 65536 " +
      "+ ((u >> 16) & 255) * 256 + ((u >> 24) & 255) AS BIGINT)"
    val hashCols = (0 until NumHashes).map { i =>
      val a = 1L + i * 7368787L
      val b = 12345L + i * 104729L
      s"MIN(($a * x + $b) % $P) AS h$i"
    }.mkString(",\n    ")
    val bandSelects = (0 until NumHashes / BandSize).map { b =>
      s"SELECT doc_id, $b AS band, h${BandSize * b} AS k1, h${BandSize * b + 1} AS k2 FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""sh AS ($shinglesSql),
       |shx AS (
       |  SELECT doc_id, $x32 AS x
       |  FROM (SELECT doc_id, md5_number_upper(sh) AS u FROM sh) t),
       |sig AS (
       |  SELECT doc_id,
       |    $hashCols
       |  FROM shx GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.k1 = y.k1 AND x.k2 = y.k2
       |    AND x.doc_id < y.doc_id)""".stripMargin
  }


  /** Merged duplicated-span intervals per document (the ExactSubstr core):
    * (doc_id, span_start, span_end, n_shingles), unordered. Shared by
    * q_dedup_substring (the span listing) and q_dedup_span_ratio (the
    * per-doc coverage metric). */
  private def spanIslands(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Ops._
    t(s, d, "documents")
      .duplicatedSpans(col("doc_id"), col("text"), SpanLen)
      .withColumnRenamed("id", "doc_id")
  }

  /** The same span relation as DuckDB CTEs ending in `spans`. */
  private lazy val spanCtes: String =
    s"""tk AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w,
       |    GENERATE_SUBSCRIPTS(string_split(text, ' '), 1) AS idx
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, idx - 1 AS pos,
       |    MD5(w${(1 until SpanLen).map(j =>
             s" || ' ' || LEAD(w, $j) OVER win").mkString}) AS h
       |  FROM tk WINDOW win AS (PARTITION BY doc_id ORDER BY idx)),
       |ok AS (SELECT doc_id, pos, h FROM sh WHERE h IS NOT NULL),
       |dup AS (
       |  SELECT h FROM ok GROUP BY h
       |  HAVING COUNT(DISTINCT doc_id) > 1),
       |flagged AS (
       |  SELECT o.doc_id, o.pos FROM ok o JOIN dup USING (h)),
       |marked AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos > COALESCE(MAX(pos + ${SpanLen - 1}) OVER (
       |        PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      -2) + 1 THEN 1 ELSE 0 END AS nw
       |  FROM flagged),
       |isl AS (
       |  SELECT doc_id, pos,
       |    SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM marked),
       |spans AS (
       |  SELECT doc_id, MIN(pos) AS span_start,
       |    MAX(pos) + ${SpanLen - 1} AS span_end,
       |    COUNT(1) AS n_shingles
       |  FROM isl GROUP BY doc_id, island)""".stripMargin

  val queries: Seq[Query] = Seq(

    // Exact dedup: hash-groupBy on content digest, keep lowest doc_id —
    // via the library operator.
    Query(
      "q_dedup_exact",
      (s, d) => {
        import graft.operators.Ops._
        t(s, d, "documents")
          .exactDupGroups(col("doc_id"), col("text"))
          .orderBy(col("keep_id"))
      },
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(1) AS n_copies
             |FROM documents GROUP BY MD5(text)
             |ORDER BY keep_id""".stripMargin),
      bench = true),

    // MinHash + LSH candidate pairs: ONE md5 per shingle → 32-bit value →
    // 8 affine permutations h_i = (a_i·x + b_i) mod P (classic universal
    // hashing), banded 2-per-band → equi-join on numeric band keys. At
    // 100 TB the per-shingle hash cost dominates this operator; one digest
    // + integer multiply-mods is ~8× cheaper than 8 digests, and the band
    // join keys stay numeric (no string materialization in the shuffle).
    Query(
      "q_dedup_minhash_lsh",
      (s, d) => {
        val P = 4294967311L // prime > 2^32
        def aCoef(i: Int) = 1L + i * 7368787L // < 2^30: a·x < 2^62, no overflow
        def bCoef(i: Int) = 12345L + i * 104729L
        // Signature via explode + hash aggregation: shingle rows → one
        // codegen'd md5 projection → groupBy(doc_id) with 8 MIN aggregates.
        // Everything after the explode runs inside WholeStageCodegen, and
        // the partial (map-side) MIN collapses each doc to one signature
        // row BEFORE the shuffle — the exchange carries one row per doc,
        // same volume as a per-row array formulation, without the
        // interpreted higher-order-function lambdas (which measure ~2.5×
        // slower end-to-end and pay seconds of extra planning/codegen on a
        // cold JVM — see tools.MinhashProbe3). MIN is duplicate-insensitive
        // so the shingle set needs no array_distinct/DISTINCT.
        // tokenize ONCE per row before the lambda (no CSE across lambda
        // boundaries — an inline split re-tokenizes per element_at,
        // O(tokens²) per doc; see shingles())
        val tk = col("__tk")
        val shArr = transform(
          sequence(lit(0), size(tk) - 3),
          i => concat_ws(" ", element_at(tk, i + 1),
            element_at(tk, i + 2), element_at(tk, i + 3)))
        // the repartition spreads docs across cores first: the fixture is
        // a single-row-group file = one scan split, and at 100 TB it is a
        // cheap narrow-row exchange ahead of the expensive hashing stage
        val n = s.sparkContext.defaultParallelism
        val sig = t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("__tk"))
          .where(size(tk) >= 3)
          .repartition(n)
          .select(col("doc_id"), explode(shArr).as("sh"))
          // big-endian 32-bit prefix of md5 (hex chars 1-8), once per shingle
          .select(col("doc_id"),
            conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long").as("x"))
          .groupBy(col("doc_id"))
          .agg(
            min(pmod(lit(aCoef(0)) * col("x") + lit(bCoef(0)), lit(P))).as("h0"),
            (1 until NumHashes).map(i =>
              min(pmod(lit(aCoef(i)) * col("x") + lit(bCoef(i)), lit(P)))
                .as(s"h$i")): _*)
        // one generator row → NumBands band rows; no union, the signature
        // aggregation runs exactly once (a union of N projections would
        // re-execute the whole shingle+agg pipeline N times)
        val stackArgs = (0 until NumHashes / BandSize).map { b =>
          s"$b, h${BandSize * b}, h${BandSize * b + 1}"
        }.mkString(", ")
        val bands = sig.selectExpr("doc_id",
          s"stack(${NumHashes / BandSize}, $stackArgs) AS (band, k1, k2)")
        // bucket pair emission via the bounded operator: per-bucket state
        // is capped (no unbounded collect_list row on a degenerate
        // bucket), overflow members connect to the bucket min — exact
        // under the cap (all sf buckets are; max sf0.01 bucket = 3),
        // connectivity-lossless above it. One shuffle on the bucket keys.
        graft.operators.Ops
          .lshBucketPairs(bands, Seq("band", "k1", "k2"), "doc_id",
            cap = LshBucketCap)
          .orderBy(col("a"), col("b"))
      },
      Some(s"WITH $minhashPairCtes\nSELECT a, b FROM pairs ORDER BY a, b"),
      bench = true),

    // Near-dup clustering: LSH candidate pairs → connected components →
    // one duplicate cluster id per colliding doc (the keep-one-per-cluster
    // step of a corpus dedup pipeline). Oracle: recursive CTE transitive
    // closure over the same pair list.
    Query(
      "q_dedup_cluster",
      (s, d) => {
        val pairs = Catalog.byName("q_dedup_minhash_lsh").run(s, d)
        graft.operators.Ops.connectedComponents(pairs)
          .toDF("doc_id", "component")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $minhashPairCtes,
              |edges AS (
              |  SELECT a AS src, b AS dst FROM pairs
              |  UNION ALL SELECT b, a FROM pairs),
              |reach(id, r) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, reach.r FROM reach
              |  JOIN edges e ON e.src = reach.id)
              |SELECT id AS doc_id, MIN(r) AS component
              |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

    // The full corpus-dedup pipeline, end to end: LSH candidate pairs →
    // connected components → keep each cluster's representative (min id),
    // drop the other members, pass non-colliding docs through. This is
    // the operation a 100 TB pretraining pipeline actually runs; the
    // anti-join against the (tiny) drop list is broadcast-able.
    Query(
      "q_dedup_corpus",
      (s, d) => {
        val pairs = Catalog.byName("q_dedup_minhash_lsh").run(s, d)
        val drop = graft.operators.Ops.connectedComponents(pairs)
          .toDF("doc_id", "component")
          .where(col("doc_id") =!= col("component"))
          .select(col("doc_id"))
        t(s, d, "documents")
          .join(broadcast(drop), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $minhashPairCtes,
              |edges AS (
              |  SELECT a AS src, b AS dst FROM pairs
              |  UNION ALL SELECT b, a FROM pairs),
              |reach(id, r) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, reach.r FROM reach
              |  JOIN edges e ON e.src = reach.id),
              |comp AS (
              |  SELECT id, MIN(r) AS component FROM reach GROUP BY id)
              |SELECT doc_id, n_chars FROM documents
              |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
              |ORDER BY doc_id""".stripMargin)),

    // n-gram (3-shingle) Jaccard similarity: verification join on shared
    // shingles — intersection via equi-join, union from per-doc counts.
    Query(
      "q_dedup_ngram_jaccard",
      (s, d) => {
        val sh0 = shingles(s, d)
        // stop-shingle filter: document frequencies are one map-side
        // partial-agg shuffle; the hot set is tiny → broadcast anti-join
        val hot = sh0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .where(col("df") > MaxShingleDf)
          .select(col("sh"))
        val sh = sh0.join(broadcast(hot), Seq("sh"), "left_anti")
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        val inter = sh.as("x").join(sh.as("y"),
            col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.withColumnRenamed("doc_id", "a")
            .withColumnRenamed("n_sh", "na"), "a")
          .join(sizes.withColumnRenamed("doc_id", "b")
            .withColumnRenamed("n_sh", "nb"), "b")
          .select(col("a"), col("b"),
            (col("n_inter").cast("double")
              / (col("na") + col("nb") - col("n_inter"))).as("jaccard"))
          .where(col("jaccard") >= 0.2)
          .orderBy(col("a"), col("b"))
      },
      Some(s"""WITH sh0 AS ($shinglesSql),
              |hot AS (
              |  SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(1) > $MaxShingleDf),
              |sh AS (
              |  SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
              |sizes AS (SELECT doc_id, COUNT(1) AS n_sh FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(1) AS n_inter
              |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
              |  GROUP BY 1, 2)
              |SELECT a, b,
              |  CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
              |FROM inter
              |JOIN sizes sa ON sa.doc_id = a
              |JOIN sizes sb ON sb.doc_id = b
              |WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
              |ORDER BY a, b""".stripMargin)),

    // SimHash: 32-bit signature from per-token md5-derived sign bits —
    // per-bit majority vote over the document's distinct tokens. Same
    // md5-prefix derivation as minhash, so the DuckDB oracle reproduces
    // the exact signatures (md5_number_upper byte reconstruction).
    Query(
      "q_dedup_simhash",
      (s, d) => {
        val tok = t(s, d, "documents")
          .select(col("doc_id"),
            explode(array_distinct(split(col("text"), " "))).as("w"))
          .withColumn("x",
            conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long"))
        val bitSums = (0 until 32).map(i =>
          sum(when(shiftright(col("x"), i).bitwiseAND(1) === 1, 1)
            .otherwise(-1)).as(s"b$i"))
        val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
        val sim = (0 until 32).map(i =>
          when(col(s"b$i") > 0, lit(1L) * (1L << i)).otherwise(0L))
          .reduce(_ + _)
        agg.select(col("doc_id"), sim.as("simhash")).orderBy(col("doc_id"))
      },
      Some {
        val x32 = "CAST((u & 255) * 16777216 + ((u >> 8) & 255) * 65536 " +
          "+ ((u >> 16) & 255) * 256 + ((u >> 24) & 255) AS BIGINT)"
        val bitSums = (0 until 32).map(i =>
          s"SUM(CASE WHEN (x >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
          .mkString(",\n    ")
        val sim = (0 until 32).map(i =>
          s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
        s"""WITH tok AS (
           |  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w
           |  FROM documents),
           |tx AS (
           |  SELECT doc_id, $x32 AS x
           |  FROM (SELECT doc_id, md5_number_upper(w) AS u FROM tok) t),
           |bits AS (
           |  SELECT doc_id,
           |    $bitSums
           |  FROM tx GROUP BY doc_id)
           |SELECT doc_id, CAST($sim AS BIGINT) AS simhash
           |FROM bits ORDER BY doc_id""".stripMargin
      }),

    // Substring-level (span) dedup — the ExactSubstr operator of
    // training-data pipelines (Lee et al. 2021, "Deduplicating Training
    // Data Makes Language Models Better"): find token runs of length
    // ≥ SpanLen that occur verbatim in MORE THAN ONE document, and emit
    // each document's duplicated regions as merged [span_start, span_end]
    // token intervals (the spans a cleaning pass would cut).
    //
    // Scale design: positions + digests are produced scan-local (one
    // md5 per window of SpanLen tokens — the md5 narrows the shuffle to
    // a 16-byte key instead of the span text); cross-doc frequency is a
    // partial-agg groupBy on the digest; the flag-back is a left-semi
    // join on the same digest (two shuffles total, both on the digest);
    // interval merging is a per-document window — state per task is one
    // document's flagged positions. No step materializes pair lists, so
    // a span duplicated across k docs costs O(k), not O(k²).
    Query(
      "q_dedup_substring",
      (s, d) => spanIslands(s, d).orderBy(col("doc_id"), col("span_start")),
      Some(s"""WITH $spanCtes
              |SELECT doc_id, span_start, span_end, n_shingles
              |FROM spans
              |ORDER BY doc_id, span_start""".stripMargin),
      bench = true),

    // Per-document duplication coverage — the number a cleaning pass
    // actually thresholds on: fraction of a doc's tokens inside
    // cross-document duplicated spans. Docs with no duplicated span
    // report 0.0 (left join), so the output is a full per-doc quality
    // column. One extra agg + a left join against the doc lengths;
    // both sides partition by doc_id.
    Query(
      "q_dedup_span_ratio",
      (s, d) => {
        val covered = spanIslands(s, d)
          .groupBy(col("doc_id"))
          .agg(sum(col("span_end") - col("span_start") + 1).as("covered"))
        val docs = t(s, d, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        docs.join(covered, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("covered"), lit(0L)).as("covered"),
            (coalesce(col("covered"), lit(0L)) / col("n_tokens"))
              .as("dup_ratio"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $spanCtes,
              |cov AS (
              |  SELECT doc_id,
              |    SUM(span_end - span_start + 1) AS covered
              |  FROM spans GROUP BY doc_id)
              |SELECT d.doc_id AS doc_id,
              |  CAST(LEN(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
              |  CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered,
              |  CAST(COALESCE(c.covered, 0) AS BIGINT)
              |    / CAST(LEN(string_split(d.text, ' ')) AS BIGINT)
              |    AS dup_ratio
              |FROM documents d LEFT JOIN cov c ON d.doc_id = c.doc_id
              |ORDER BY doc_id""".stripMargin)),

    // The CUT: rebuild each document's text with every duplicated span
    // removed — detect (q_dedup_substring) → measure (q_dedup_span_ratio)
    // → cut. Per doc, the merged span list folds back as an array column
    // (bounded by the doc's own length — per-doc state, same unit as the
    // merge window); the rebuild is a scan-local indexed filter over the
    // token array, with the containment test a nested lambda over the
    // span array. One extra shuffle (the span collect) + one join.
    Query(
      "q_dedup_cut",
      (s, d) => {
        val spanArr = spanIslands(s, d)
          .groupBy(col("doc_id"))
          .agg(collect_list(struct(col("span_start").as("s"),
            col("span_end").as("e"))).as("spans"))
        val tk = col("__tk")
        t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("__tk"))
          .join(spanArr, Seq("doc_id"), "left")
          .select(col("doc_id"), tk,
            coalesce(col("spans"),
              array().cast("array<struct<s:bigint,e:bigint>>")).as("sp"))
          .select(col("doc_id"),
            filter(tk, (x, i) =>
              !exists(col("sp"), sp => i >= sp.getField("s")
                && i <= sp.getField("e"))).as("kept"),
            size(tk).as("n_tokens"))
          .select(col("doc_id"),
            array_join(col("kept"), " ").as("clean_text"),
            (col("n_tokens") - size(col("kept"))).cast("long")
              .as("n_removed"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $spanCtes,
              |sp AS (
              |  SELECT doc_id,
              |    LIST(STRUCT_PACK(s := span_start, e := span_end)) AS spans
              |  FROM spans GROUP BY doc_id),
              |base AS (
              |  SELECT d.doc_id, string_split(d.text, ' ') AS tk,
              |    CASE WHEN sp.spans IS NULL
              |      THEN CAST([] AS STRUCT(s BIGINT, e BIGINT)[])
              |      ELSE sp.spans END AS sp
              |  FROM documents d LEFT JOIN sp ON d.doc_id = sp.doc_id),
              |cut AS (
              |  SELECT doc_id,
              |    list_filter(tk, (x, i) -> LEN(list_filter(sp,
              |      r -> i - 1 >= r.s AND i - 1 <= r.e)) = 0) AS kept,
              |    LEN(tk) AS n_tokens
              |  FROM base)
              |-- COALESCE: DuckDB's array_to_string([]) is NULL where
              |-- Spark's array_join([]) is '' (a fully-duplicated doc)
              |SELECT doc_id,
              |  COALESCE(array_to_string(kept, ' '), '') AS clean_text,
              |  CAST(n_tokens - LEN(kept) AS BIGINT) AS n_removed
              |FROM cut ORDER BY doc_id""".stripMargin)))
}
