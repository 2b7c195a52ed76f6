package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Catalog.t

/** End-to-end corpus-curation FUNNEL — the composition the individual
  * text/dedup operators exist for, in ONE pass: per document compute the
  * quality signals (Gopher token/word-length/repetition gates), the
  * language-ID heuristic, and the exact-dup digest; drop duplicate
  * losers first (min doc_id per digest survives — the batch dedup
  * convention), then gate the survivors on quality+language; report the
  * per-source funnel (total → dup-dropped → quality-rejected → accepted,
  * plus accepted token volume — the number a training-data pipeline
  * actually budgets on).
  *
  * Scale shape (the reason this is one query and not four chained ones):
  * the text column NEVER crosses an exchange. All per-doc signals and
  * the digest are computed scan-locally in one projection, so the dedup
  * window shuffles only (digest, doc_id, source, 4 small numerics) —
  * ~50 bytes/row against documents' kilobytes — and the funnel
  * aggregation partial-aggs to |sources| rows before its exchange. At
  * 100 TB: one full scan, one narrow hash shuffle on digest, one
  * tiny agg shuffle. A naive compose-by-join of q_text_gopher +
  * q_text_langid + q_dedup_exact would scan the corpus three times and
  * join on doc_id twice.
  */
object PipelineQueries {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopwordsSql = stopwords.map(w => s"'$w'").mkString(", ")

  /** The quality + language gate as ONE boolean expression over a text
    * column — the Gopher bounds (token count, mean word length,
    * repetition) plus the stopword language heuristic. Shared by the
    * batch funnel ([[flagged]] computes `keep_q` with this exact
    * expression) and the streaming curation path ([[curateStream]]), so
    * backfill and live feed agree on "keep". */
  def qualityGate(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val toks = split(text, " ")
    val nTok = size(toks)
    val mwl = length(translate(text, " ", "")).cast("double") / nTok
    val rep = lit(1.0) - size(array_distinct(toks)).cast("double") / nTok
    val nStop = size(filter(toks, x => x.isin(stopwords: _*)))
    nTok >= 30 && mwl.between(4.0, 5.0) && rep < 0.6 && nStop >= 2
  }

  /** Per-document curation flags over a (doc_id, source, text) frame —
    * NARROW rows only: the text column is consumed by the scan-local
    * signal projection and never crosses the dedup window's exchange.
    * Columns: doc_id, source, n_tokens, mean_wlen, rep_ratio, n_stop,
    * digest, is_dup (exact-dup loser), keep_q (quality+language gate). */
  def flagged(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    docs
      .select(col("doc_id"), col("source"),
        nTok.as("n_tokens"),
        (length(translate(col("text"), " ", "")).cast("double") / nTok)
          .as("mean_wlen"),
        (lit(1.0) - size(array_distinct(toks)).cast("double") / nTok)
          .as("rep_ratio"),
        expr(s"size(filter(split(text, ' '), x -> x IN ($stopwordsSql)))")
          .as("n_stop"),
        md5(col("text")).as("digest"),
        // the gate itself evaluates scan-locally too — SAME expression
        // as the streaming path, shared by construction
        qualityGate(col("text")).as("keep_q"))
      .withColumn("is_dup",
        col("doc_id") =!= min(col("doc_id"))
          .over(Window.partitionBy("digest")))
  }

  /** The funnel as a PRODUCTION WRITE PATH: the cleaned corpus (full
    * documents) with texts that still never shuffle in the common case.
    * The quality gate re-evaluates scan-locally on the output scan (it
    * is a pure row expression — recomputing beats joining), so the only
    * join-back is a LEFT ANTI against the DUP-LOSER id set — the one
    * flag that needs the digest window. That right side is the
    * duplicated fraction of the corpus, not the accepted ~whole of it:
    * at a typical few-percent dup rate it broadcasts at corpus sizes
    * where an accepted-id semi join (≈|corpus| rows) long since
    * couldn't, and the anti join keeps the text column on the
    * build-free probe side. When the loser set outgrows broadcast, AQE
    * falls back to a shuffled join and the text crosses ONE exchange —
    * that regime means the corpus is mostly duplicates, and the
    * cheaper move is running exact dedup first. Pair with
    * `Observe.observed` to collect the funnel counters on the same job
    * (no separate report query): observe [[flagged]]'s output. */
  def curatedDocs(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val losers = flagged(docs)
      .where(col("is_dup"))
      .select(col("doc_id"))
    docs.where(qualityGate(col("text")))
      .join(losers, Seq("doc_id"), "left_anti")
  }

  /** STREAMING curation — the live-feed twin of [[curatedDocs]]:
    * quality-gate each micro-batch ([[qualityGate]], the batch funnel's
    * exact expression), then drop exact duplicates against the growing
    * accepted-digest index (`NearDupStream.exactDupFilter`, same replay
    * contract as the near-dup filter). Accepted documents flow to `out`.
    * Funnel counters ride the query as observed metrics — harvest
    * per-batch with `Observe.StreamObserver.listen(spark,
    * s"${obsPrefix}_in")` / `s"${obsPrefix}_q"` (rows arrived / rows
    * surviving the gate); accepted counts are `out`'s row counts. Give
    * each concurrently-running curation stream its own `obsPrefix`:
    * observation names are session-global, and while the observer keys
    * by query run, a shared name would merge two pipelines' sums. Gate order is dedup-equivalent to
    * the batch funnel: byte-identical docs share quality flags, so
    * gating before dedup admits the same set (first-seen winner) as
    * dedup-then-gate.
    *
    * Batch/stream agreement: feed id-ordered batches and the accepted
    * set equals [[curatedDocs]] on the same corpus (pinned in
    * PipelineStreamSpec). */
  def curateStream(spark: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame, indexDir: String,
      out: (org.apache.spark.sql.DataFrame, Long) => Unit,
      idCol: String = "doc_id", textCol: String = "text",
      triggerMs: Long = 500L,
      checkpointDir: Option[String] = None,
      floorBatchId: Long = 0L,
      obsPrefix: String = "curate")
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.NearDupStream.exactDupFilter(spark,
      docs
        .observe(s"${obsPrefix}_in", count(lit(1)).as("n_in"))
        .where(qualityGate(col(textCol)))
        .observe(s"${obsPrefix}_q", count(lit(1)).as("n_q")),
      indexDir, out, idCol, textCol, triggerMs, checkpointDir,
      floorBatchId)

  val queries: Seq[Query] = Seq(
    Query(
      // The layout + data-skipping read path end-to-end under the
      // DuckDB oracle (r9): z-order lineitem on (orderkey, partkey) into
      // 16 manifested files, then read THROUGH the ManifestFileIndex
      // with a predicate on the NON-leading clustered column — the scan
      // plans only the files whose stats admit the predicate
      // (StatsManifestSpec pins the file counts; this row pins that the
      // pruned read returns exactly the full table's answer). The
      // rewrite targets a per-sfDir temp dir so reruns and different
      // scale factors never cross-contaminate.
      "q_layout_zorder_scan",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val dir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          "graft_layout_scan_" + java.security.MessageDigest
            .getInstance("MD5").digest(d.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(12)).getAbsolutePath
        graft.operators.Layout.zorderWrite(
          li, Seq("l_orderkey", "l_partkey"), dir, 16)
        graft.sources.StatsManifest.scan(s, dir)
          .where(col("l_partkey") < 400)
          .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      },
      Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
             |WHERE l_partkey < 400 ORDER BY 1, 2, 3""".stripMargin)),

    Query(
      // Metadata-only aggregates (r9): a global count/min/max over the
      // manifested layout folds to a LocalRelation — the manifest
      // answers, ZERO scan tasks launch (ManifestMetadataOnlySpec pins
      // the plan; this row pins that the folded answer equals DuckDB
      // scanning the real rows). Temp dir keyed per sfDir, like
      // q_layout_zorder_scan.
      "q_manifest_agg",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val dir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          "graft_manifest_agg_" + java.security.MessageDigest
            .getInstance("MD5").digest(d.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(12)).getAbsolutePath
        // stats cols ⊋ cluster cols: l_quantity gets manifest stats too,
        // so count(l_quantity) folds along with the rest — a column
        // missing stats would (correctly) disable the whole rewrite
        graft.operators.Layout.zorder(
          li, Seq("l_orderkey", "l_partkey"), 16)
          .write.mode("overwrite").parquet(dir)
        graft.sources.StatsManifest.write(s, dir,
          Seq("l_orderkey", "l_partkey", "l_quantity"))
        graft.sources.StatsManifest.scan(s, dir)
          .agg(count(lit(1)).as("n"),
            min(col("l_orderkey")).as("min_ok"),
            max(col("l_orderkey")).as("max_ok"),
            min(col("l_partkey")).as("min_pk"),
            max(col("l_partkey")).as("max_pk"),
            sum(col("l_partkey")).as("sum_pk"),
            count(col("l_quantity")).as("n_qty"))
      },
      Some("""SELECT COUNT(*) AS n,
             |MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok,
             |MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
             |CAST(SUM(l_partkey) AS BIGINT) AS sum_pk,
             |COUNT(l_quantity) AS n_qty FROM lineitem""".stripMargin)),

    Query(
      // Bloom-manifest point lookup (r9): digest = md5(text) is
      // hash-scattered, so every file's [min,max] spans the hex domain
      // and range stats prune NOTHING — the per-file bloom is what
      // skips files (BloomManifestSpec pins selected ≪ total; this row
      // pins the pruned answer against DuckDB). The probe digest is a
      // 1-row driver lookup (control flow: a point-lookup literal, the
      // same shape as Ops' id-range probe).
      "q_bloom_point",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"), md5(col("text")).as("digest"))
        val dir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          "graft_bloom_point_" + java.security.MessageDigest
            .getInstance("MD5").digest(d.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(12)).getAbsolutePath
        docs.repartition(16).write.mode("overwrite").parquet(dir)
        graft.sources.StatsManifest.write(s, dir,
          Seq("digest"), Seq("digest"))
        val probe = docs
          .where(col("doc_id") === docs.agg(min(col("doc_id")))
            .collect().head.getLong(0))
          .select("digest").collect().head.getString(0)
        graft.sources.StatsManifest.scan(s, dir)
          .where(col("digest") === probe)
          .select("doc_id", "source", "digest")
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, source, md5(text) AS digest FROM documents
             |WHERE md5(text) = (SELECT md5(text) FROM documents
             |  WHERE doc_id = (SELECT MIN(doc_id) FROM documents))
             |ORDER BY doc_id""".stripMargin)),

    Query(
      // Time travel (r9): manifest versions are immutable atomic
      // commits, so a SNAPSHOT read reproduces the table AS OF an
      // earlier version. v1 = the real lineitem; then junk rows are
      // appended and the manifest updated (v2); the snapshot at v1 must
      // equal DuckDB scanning the ORIGINAL table — the junk is
      // invisible (ManifestVersionsSpec pins the mechanics: atomic
      // rename commits, race retry, retention).
      "q_time_travel",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val dir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          "graft_time_travel_" + java.security.MessageDigest
            .getInstance("MD5").digest(d.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(12)).getAbsolutePath
        li.repartition(8).write.mode("overwrite").parquet(dir)
        graft.sources.StatsManifest.write(s, dir, Seq("l_orderkey"))
        val v1 = graft.sources.StatsManifest.versions(s, dir).last
        li.limit(50).withColumn("l_quantity", lit(-999.0))
          .write.mode("append").parquet(dir)
        graft.sources.StatsManifest.update(s, dir, Seq("l_orderkey"))
        graft.sources.StatsManifest.scanAtVersion(s, dir, v1)._1
          .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      },
      Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
             |ORDER BY 1, 2, 3""".stripMargin)),

    Query(
      // RESTORE (r13) — the WRITE half of time travel: mutate the
      // table (a SQL DELETE and an UPDATE), then RESTORE TABLE ... TO
      // VERSION AS OF the original; the final LATEST state must equal
      // DuckDB scanning the untouched fixture — and the mutated
      // history stays readable underneath (RestoreSpec pins history/
      // CDC/vacuum-refusal mechanics).
      "q_time_travel_restore",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val dir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          "graft_restore_q_" + java.security.MessageDigest
            .getInstance("MD5").digest(d.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(12)).getAbsolutePath
        li.repartition(8).write.mode("overwrite").parquet(dir)
        graft.sources.StatsManifest.write(s, dir, Seq("l_orderkey"))
        val v1 = graft.sources.StatsManifest.versions(s, dir).last
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = "graft_restore_" + h
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        s.sql(s"DELETE FROM $tbl WHERE l_orderkey < 1000")
        s.sql(s"UPDATE $tbl SET l_quantity = -5 WHERE l_partkey < 50")
        s.sql(s"RESTORE TABLE $tbl TO VERSION AS OF $v1")
        s.table(tbl)
          .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      },
      Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
             |ORDER BY 1, 2, 3""".stripMargin)),

    Query(
      // Incremental compaction (r9): land orders in the streaming-sink
      // shape (many small files + one big), compactSmall bin-packs ONLY
      // the small tail, and the compacted table must still equal DuckDB
      // scanning the original rows — content is invariant under
      // physical reorganization (StatsManifestSpec pins the
      // incremental-manifest and untouched-big-file mechanics).
      "q_compact_small",
      (s, d) => {
        val o = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val dir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          "graft_compact_q_" + java.security.MessageDigest
            .getInstance("MD5").digest(d.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(12)).getAbsolutePath
        o.where(col("o_orderkey") % 10 =!= 0).coalesce(1)
          .write.mode("overwrite").parquet(dir)
        o.where(col("o_orderkey") % 10 === 0).repartition(8)
          .write.mode("append").parquet(dir)
        graft.sources.StatsManifest.write(s, dir, Seq("o_orderkey"))
        graft.operators.Layout.compactSmall(s, dir, Seq("o_orderkey"),
          targetBytes = 1L << 26, smallBytes = 64L << 10)
        graft.sources.StatsManifest.scan(s, dir)
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    Query(
      // Partition-scoped OPTIMIZE (r13): `OPTIMIZE t WHERE p = v`
      // bin-packs exactly the spec'd partition's files (the backfill
      // maintenance shape — O(scoped bytes), never the table) under a
      // deferDelete commit; content is invariant under the physical
      // reorganization and the untouched partitions' files never move
      // (SqlDmlSpec pins the file-set mechanics).
      "q_compact_partition",
      (s, d) => {
        val o = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .withColumn("p", (col("o_orderkey") % 3).cast("int"))
        val dir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          "graft_cpart_q_" + java.security.MessageDigest
            .getInstance("MD5").digest(d.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(12)).getAbsolutePath
        o.repartitionByRange(8, col("o_orderkey"))
          .write.mode("overwrite").partitionBy("p").parquet(dir)
        graft.sources.StatsManifest.write(s, dir, Seq("o_orderkey"))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = "graft_cpart_" + h
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        s.sql(s"OPTIMIZE $tbl WHERE p = 1")
        s.table(tbl).orderBy(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("p"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
             |  CAST(o_orderkey % 3 AS INT) AS p FROM orders
             |ORDER BY 1, 2, 3, 4""".stripMargin)),

    Query(
      "q_pipeline_curate",
      (s, d) => {
        flagged(t(s, d, "documents").select("doc_id", "source", "text"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
            sum(when(!col("is_dup") && !col("keep_q"), 1L).otherwise(0L))
              .as("n_rejected"),
            sum(when(!col("is_dup") && col("keep_q"), 1L).otherwise(0L))
              .as("n_accepted"),
            sum(when(!col("is_dup") && col("keep_q"),
              col("n_tokens").cast("long")).otherwise(0L))
              .as("tok_accepted"))
          .orderBy(col("source"))
      },
      Some(s"""WITH per AS (
              |  SELECT doc_id, source,
              |    LEN(string_split(text, ' ')) AS n_tokens,
              |    CAST(LEN(REPLACE(text, ' ', '')) AS DOUBLE)
              |      / LEN(string_split(text, ' ')) AS mean_wlen,
              |    1.0 - CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
              |      / LEN(string_split(text, ' ')) AS rep_ratio,
              |    LEN(list_filter(string_split(text, ' '),
              |      x -> x IN ($stopwordsSql))) AS n_stop,
              |    md5(text) AS digest
              |  FROM documents),
              |flagged AS (
              |  SELECT *,
              |    doc_id <> MIN(doc_id) OVER (PARTITION BY digest) AS is_dup,
              |    n_tokens >= 30 AND mean_wlen BETWEEN 4.0 AND 5.0
              |      AND rep_ratio < 0.6 AND n_stop >= 2 AS keep_q
              |  FROM per)
              |SELECT source,
              |  COUNT(1) AS n_docs,
              |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
              |  CAST(SUM(CASE WHEN NOT is_dup AND NOT keep_q THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_rejected,
              |  CAST(SUM(CASE WHEN NOT is_dup AND keep_q THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_accepted,
              |  CAST(SUM(CASE WHEN NOT is_dup AND keep_q THEN n_tokens ELSE 0 END)
              |    AS BIGINT) AS tok_accepted
              |FROM flagged
              |GROUP BY source
              |ORDER BY source""".stripMargin),
      bench = true),

    // Sequence packing, oracle-checked: the greedy reset-on-overflow
    // fold is inherently sequential per block, so the DuckDB oracle
    // replays it as a RECURSIVE CTE stepping one row per block per
    // iteration — breadth-wise across blocks, exactly the operator's
    // parallel unit. Fixed buckets=8 keeps the block geometry (and so
    // the assignment) identical on both engines regardless of
    // parallelism. bin_id = blk * 2^32 + local, the operator's encoding.
    Query(
      "q_pipeline_pack",
      (s, d) => {
        import graft.operators.Ops._
        t(s, d, "documents")
          .select(col("doc_id").as("id"),
            size(split(col("text"), " ")).as("n_tokens"))
          .packByTokenBudget(col("id"), col("n_tokens"), 2000L, buckets = 8)
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id AS id,
             |    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |ext AS (
             |  SELECT MIN(id) AS lo,
             |    GREATEST(1, (MAX(id) - MIN(id)) // 8 + 1) AS width
             |  FROM base),
             |ord AS (
             |  -- // (floor division): a double CAST would ROUND in
             |  -- DuckDB where Spark's cast truncates
             |  SELECT id, n_tokens,
             |    (id - lo) // width AS blk,
             |    ROW_NUMBER() OVER (
             |      PARTITION BY (id - lo) // width
             |      ORDER BY id) AS rn
             |  FROM base, ext),
             |pack AS (
             |  SELECT blk, rn, id, n_tokens,
             |    CAST(0 AS BIGINT) AS bin, n_tokens AS filled
             |  FROM ord WHERE rn = 1
             |  UNION ALL
             |  SELECT o.blk, o.rn, o.id, o.n_tokens,
             |    CASE WHEN p.filled + o.n_tokens > 2000
             |         THEN p.bin + 1 ELSE p.bin END,
             |    CASE WHEN p.filled + o.n_tokens > 2000
             |         THEN o.n_tokens ELSE p.filled + o.n_tokens END
             |  FROM pack p JOIN ord o ON o.blk = p.blk AND o.rn = p.rn + 1)
             |SELECT id, n_tokens,
             |  blk * 4294967296 + bin AS bin_id
             |FROM pack
             |ORDER BY id""".stripMargin)))
}
