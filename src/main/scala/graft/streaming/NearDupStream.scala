package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming near-duplicate FILTERING against a growing index — the
  * ingest-time half of a training-corpus dedup pipeline: every arriving
  * micro-batch of documents is checked against everything already
  * accepted, novel documents are emitted downstream and their LSH
  * buckets are appended to the index, near-duplicates are dropped. The
  * batch side of the same pipeline is `q_dedup_minhash_lsh` →
  * `connectedComponents` (one-shot corpus dedup); this operator is what
  * runs AFTER that backfill, on the live feed.
  *
  * Mechanism per micro-batch (all distributed, nothing driver-side):
  *  1. MinHash signatures → banded bucket keys for the batch's docs
  *     (same integer kernel as the batch query: md5-prefix shingle
  *     hashes, 8 universal-hash mins, 4 bands × 2 rows — scan-local,
  *     one narrow groupBy per doc).
  *  2. LEFT SEMI join of batch buckets against the index buckets → doc
  *     ids colliding with any ACCEPTED doc's bucket = cross-batch dups.
  *  3. Intra-batch: within the surviving docs, each bucket keeps its
  *     minimum doc id (the LSH pair convention — the min is the
  *     survivor); a doc colliding with a smaller id in the same batch
  *     drops.
  *  4. `out(novel, batchId)` — the accepted documents.
  *  5. The novel docs' buckets are appended to the index through the
  *     staged-rename writer ([[IterativeStream.writeFeedback]]): file
  *     names are deterministic in (batchId, part), so a replayed batch
  *     REPLACES its own appendix instead of duplicating it.
  *
  * Replay correctness (foreachBatch is at-least-once): when batch B
  * replays after a crash, the index may already contain B's own files
  * from the failed attempt — reading them would make every B doc look
  * like a duplicate of itself and the replay would emit nothing while
  * step 5 erased the attempt's files. The index view is therefore
  * BATCH-SCOPED: batch B reads only files with batchId < B
  * ([[indexFilesBefore]]), i.e. exactly the state the original attempt
  * saw. Emission via `out` carries the usual at-least-once contract —
  * pair it with an idempotent sink.
  *
  * Scale: the per-batch cost is one scan+join of the index bucket table
  * (4 narrow rows per accepted doc). The join shuffles on the bucket
  * key — or broadcasts while the index is small; at corpus scale,
  * periodically compact the index directory (the batch-scoped read
  * makes compaction safe for any batchId below the live watermark).
  * Docs shorter than 3 tokens produce no shingles and are always
  * emitted as novel.
  */
object NearDupStream {

  /** MinHash band/bucket keys — (id, band, k1, k2) — for a bounded
    * batch of (idCol, textCol) documents. Integer kernel identical to
    * the oracle-checked batch query (`DedupQueries.q_dedup_minhash_lsh`)
    * so streaming and backfill agree on what "near-duplicate" means. */
  private[graft] def minhashBands(docs: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 8, bandSize: Int = 2): DataFrame = {
    val P = 4294967311L // prime > 2^32
    def aCoef(i: Int) = 1L + i * 7368787L
    def bCoef(i: Int) = 12345L + i * 104729L
    val tk = col("__tk")
    val shArr = transform(
      sequence(lit(0), size(tk) - 3),
      i => concat_ws(" ", element_at(tk, i + 1),
        element_at(tk, i + 2), element_at(tk, i + 3)))
    val sig = docs
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__tk"))
      .where(size(tk) >= 3)
      .select(col("__id"), explode(shArr).as("sh"))
      .select(col("__id"),
        conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long").as("x"))
      .groupBy(col("__id"))
      .agg(
        min(pmod(lit(aCoef(0)) * col("x") + lit(bCoef(0)), lit(P))).as("h0"),
        (1 until numHashes).map(i =>
          min(pmod(lit(aCoef(i)) * col("x") + lit(bCoef(i)), lit(P)))
            .as(s"h$i")): _*)
    val stackArgs = (0 until numHashes / bandSize).map { b =>
      s"$b, h${bandSize * b}, h${bandSize * b + 1}"
    }.mkString(", ")
    sig.selectExpr("__id AS id",
      s"stack(${numHashes / bandSize}, $stackArgs) AS (band, k1, k2)")
  }

  /** Strict appendix-name shape: `fb-<batchId %012d>-<part %05d>.parquet`.
    * The glob `fb-*.parquet` alone would admit foreign or half-staged
    * files whose second segment isn't numeric, and an unconditional
    * `split("-")(1).toLong` on those would throw in EVERY later
    * micro-batch — so names are matched strictly and non-conforming
    * files are skipped (they were never written by this protocol). */
  private val AppendixName = """^fb-(\d{12})-\d{5}\.parquet$""".r

  /** The appendix batch id, or None for files this protocol never wrote. */
  private[graft] def appendixBatchId(name: String): Option[Long] =
    name match {
      case AppendixName(id) => Some(id.toLong)
      case _ => None
    }

  /** Index files visible to batch `batchId`: only appendices of EARLIER
    * batches — a replayed batch must see exactly the index state its
    * original attempt saw, never its own half-written appendix. */
  private[graft] def indexFilesBefore(fs: FileSystem, indexDir: Path,
      batchId: Long): Seq[String] = {
    val st = fs.globStatus(new Path(indexDir, "fb-*.parquet"))
    if (st == null) Seq.empty
    else st.map(_.getPath).filter(p =>
      appendixBatchId(p.getName).exists(_ < batchId)
    ).map(_.toString).toSeq
  }

  /** EXACT-dup bucket keys — the same (id, band, k1, k2) shape as
    * [[minhashBands]] but with the md5 digest itself as the key (two
    * 64-bit halves), band 0: two docs share a bucket iff their text is
    * byte-identical. Lets the same index/filter machinery run exact
    * corpus dedup at ingest (the streaming twin of q_pipeline_curate's
    * digest window). One row per doc — cheaper than near-dup's 4. */
  private[graft] def exactBands(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), lit(0).as("band"),
      conv(substring(md5(col(textCol)), 1, 15), 16, 10).cast("long").as("k1"),
      conv(substring(md5(col(textCol)), 16, 15), 16, 10).cast("long").as("k2"))

  /** The `floorBatchId` to adopt an existing index directory under a new
    * checkpoint: one past the highest batch id present (0 if empty).
    * Compute ONCE at adoption; see [[nearDupFilter]]'s stability note. */
  def nextFloor(spark: SparkSession, indexDir: String): Long = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.globStatus(new Path(p, "fb-*.parquet"))
    val ids =
      if (st == null) Array.empty[Long]
      else st.flatMap(s => appendixBatchId(s.getPath.getName))
    if (ids.isEmpty) 0L else ids.max + 1L
  }

  /** Start the filter: `docs` is a streaming DataFrame with `idCol`
    * (long, unique per document) and `textCol` (string); accepted
    * documents flow to `out` per micro-batch; `indexDir` accumulates
    * the accepted bucket table (created if absent, query-private).
    *
    * `floorBatchId` adopts a PRE-EXISTING index under a NEW checkpoint:
    * a fresh query restarts batch ids at 0, so without an offset the
    * batch-scoped view would hide the whole inherited index (batch B
    * sees only ids < B) and batch 0's appendix name would collide with —
    * and replace — the oldest inherited file. With a floor F, batch B
    * reads ids < F+B and writes at id F+B: inherited files (< F) are
    * always visible, and replay scoping within this incarnation is
    * unchanged. Pass [[nextFloor]] of the index at ADOPTION time, then
    * keep the value STABLE for this checkpoint's lifetime (persist it
    * with the checkpoint) — recomputing it on a same-checkpoint restart
    * would shift replayed batches onto new ids and let a replay see its
    * own earlier appendix. */
  def nearDupFilter(spark: SparkSession, docs: DataFrame, indexDir: String,
      out: (DataFrame, Long) => Unit,
      idCol: String = "doc_id", textCol: String = "text",
      triggerMs: Long = 500L,
      checkpointDir: Option[String] = None,
      floorBatchId: Long = 0L): StreamingQuery =
    dupFilter(spark, docs, indexDir, out, idCol, textCol, triggerMs,
      checkpointDir, floorBatchId, minhashBands(_, idCol, textCol))

  /** EXACT-dup streaming filter: same index machinery, contract and
    * replay semantics as [[nearDupFilter]], but docs collide only on
    * byte-identical text ([[exactBands]]) — the ingest-time twin of the
    * batch funnel's digest dedup. First-seen doc wins across batches;
    * min id wins within a batch (id-ordered feeds thus match the batch
    * window's min-doc_id-per-digest exactly). */
  def exactDupFilter(spark: SparkSession, docs: DataFrame, indexDir: String,
      out: (DataFrame, Long) => Unit,
      idCol: String = "doc_id", textCol: String = "text",
      triggerMs: Long = 500L,
      checkpointDir: Option[String] = None,
      floorBatchId: Long = 0L): StreamingQuery =
    dupFilter(spark, docs, indexDir, out, idCol, textCol, triggerMs,
      checkpointDir, floorBatchId, exactBands(_, idCol, textCol))

  private def dupFilter(spark: SparkSession, docs: DataFrame,
      indexDir: String, out: (DataFrame, Long) => Unit,
      idCol: String, textCol: String, triggerMs: Long,
      checkpointDir: Option[String], floorBatchId: Long,
      bander: DataFrame => DataFrame): StreamingQuery = {
    require(floorBatchId >= 0L, s"floorBatchId < 0: $floorBatchId")
    val hconf = spark.sparkContext.hadoopConfiguration
    val idxPath = new Path(indexDir)
    val fs = idxPath.getFileSystem(hconf)
    fs.mkdirs(idxPath)
    val stagingRoot = new Path(indexDir + ".staging")
    val bandSchema = "id LONG, band INT, k1 BIGINT, k2 BIGINT"

    val writer = docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, rawBatchId: Long) =>
        val batchId = floorBatchId + rawBatchId
        val b = batch.persist()
        try {
          val s = b.sparkSession
          val bands = bander(b).persist()
          try {
            val idxFiles = indexFilesBefore(fs, idxPath, batchId)
            val index =
              if (idxFiles.isEmpty)
                s.createDataFrame(s.sparkContext
                    .emptyRDD[org.apache.spark.sql.Row],
                  org.apache.spark.sql.types.StructType.fromDDL(bandSchema))
              else s.read.schema(bandSchema).parquet(idxFiles: _*)
            // cross-batch dups: any bucket already accepted
            val crossDup = bands
              .join(index, Seq("band", "k1", "k2"), "left_semi")
              .select(col("id")).distinct()
            // intra-batch: per bucket the min id survives; a doc drops
            // if ANY of its buckets holds a smaller id
            val intraDup = bands
              .withColumn("m",
                min(col("id")).over(org.apache.spark.sql.expressions.Window
                  .partitionBy("band", "k1", "k2")))
              .where(col("id") > col("m"))
              .select(col("id")).distinct()
            val dupIds = crossDup.unionByName(intraDup).distinct()
            val novel = b.join(dupIds,
              b(idCol) === dupIds("id"), "left_anti")
            out(novel, batchId)
            // append the accepted docs' buckets; (batchId, part)-named
            // renames make the replay REPLACE, and the batch-scoped
            // index read above keeps the replay blind to them
            IterativeStream.writeFeedback(fs, idxPath, stagingRoot, batchId,
              bands.join(dupIds, bands("id") === dupIds("id"), "left_anti"))
          } finally bands.unpersist()
        } finally b.unpersist()
      }
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Offline compaction of the accepted-bucket index: merge every
    * appendix of batches < `upToBatchId` into `numFiles` files, named at
    * batch `upToBatchId - 1` so visibility semantics are unchanged (a
    * batch B > upToBatchId-1 saw the originals; it sees the compacted
    * rows; batches ≤ upToBatchId-1 must be committed — see below).
    *
    * Crash safety has NO loss window, by ordering: (1) the compacted
    * rows are fully written to a staging dir, (2) staged parts rename in
    * at FRESH part indices — base 50000 (above any streaming-writer part
    * count) plus one past the highest compacted index already present,
    * so a destination name NEVER collides with a live input, even when a
    * re-compaction at the same upToBatchId re-reads a previous
    * compaction's output — (3) only then are the originals deleted. A
    * crash between (2) and (3) leaves originals AND compacted rows
    * visible — duplicate bucket rows are semantically inert (the
    * filter's LEFT SEMI join is idempotent in the right side) and the
    * next compaction's `dropDuplicates` restores minimality. A crash
    * mid-(3) is the same state with fewer survivors.
    *
    * Contract: `upToBatchId` must be ≤ the last COMMITTED batch of the
    * live query (a committed micro-batch never replays, so no replay can
    * glob-delete the compacted fb-(upToBatchId-1)-* files or re-read a
    * pre-append index view). Run in a maintenance window or between
    * triggers: a batch that listed the originals before (3) and read
    * them after would fail its read (and retry against the compacted
    * view — at-least-once emission absorbs the retry).
    */
  def compactIndex(spark: SparkSession, indexDir: String, upToBatchId: Long,
      numFiles: Int = 1): Unit = {
    require(upToBatchId >= 1, s"compactIndex: upToBatchId=$upToBatchId")
    require(numFiles >= 1 && numFiles <= 49999,
      s"compactIndex: numFiles=$numFiles outside [1, 49999]")
    val idxPath = new Path(indexDir)
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inputs = indexFilesBefore(fs, idxPath, upToBatchId)
    if (inputs.size <= 1) return // nothing to merge
    val bandSchema = "id LONG, band INT, k1 BIGINT, k2 BIGINT"
    val staging = new Path(indexDir + ".staging", s"compact-$upToBatchId")
    spark.read.schema(bandSchema).parquet(inputs: _*)
      .dropDuplicates()
      .repartition(numFiles)
      .write.mode("overwrite").parquet(staging.toString)
    val parts = fs.listStatus(staging)
      .map(_.getPath).filter(_.getName.startsWith("part-"))
      .sortBy(_.getName)
    // fresh slots: one past anything already present at this batch id
    val taken = Option(fs.globStatus(
        new Path(idxPath, f"fb-${upToBatchId - 1}%012d-*.parquet")))
      .getOrElse(Array.empty)
      .map(_.getPath.getName)
      .filter(appendixBatchId(_).isDefined) // same strictness as the reads
      .map(_.split("-")(2).takeWhile(_.isDigit).toInt)
    val base = math.max(50000, if (taken.isEmpty) 0 else taken.max + 1)
    require(base + parts.length <= 99999,
      s"compactIndex: part-index space exhausted at $base — " +
        "compact into fewer files or a fresh index directory")
    parts.zipWithIndex.foreach { case (src, i) =>
      val dst = new Path(idxPath,
        f"fb-${upToBatchId - 1}%012d-${base + i}%05d.parquet")
      // rename MUST be verified before anything is deleted: some
      // FileSystems report failure as `false` rather than throwing, and
      // proceeding to the deletes below would destroy both the staged
      // copy and the originals — the exact loss the staged protocol
      // exists to rule out. Aborting here is safe: originals are intact,
      // already-renamed parts are inert duplicates, rerun re-compacts.
      require(fs.rename(src, dst),
        s"compactIndex: rename $src -> $dst failed; originals retained, " +
          "re-run compaction")
    }
    fs.delete(staging, true)
    inputs.foreach(p => fs.delete(new Path(p), false))
  }
}
