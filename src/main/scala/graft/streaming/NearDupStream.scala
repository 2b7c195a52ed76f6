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
  * Mechanism per micro-batch (all distributed, nothing driver-side
  * except file listing decisions, which are the driver's job anyway):
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
  *  5. The novel docs' buckets are appended to the index through a
  *     staged-rename writer: file names are deterministic in
  *     (batchId, part), so a replayed batch REPLACES its own appendix
  *     instead of duplicating it.
  *
  * == Bounded index reads (VERDICT r8 → r9 #2) ==
  *
  * The index directory is BUCKET-PARTITIONED: every bucket row lands in
  * `b=<pmod(xxhash64(band,k1,k2), numBuckets)>/`. A micro-batch's bands
  * touch a bounded set of buckets (≤ 4 rows/doc), so the per-batch index
  * read lists and scans ONLY the touched `b=` directories — the
  * untouched fraction of the corpus index is never opened. Within a
  * touched bucket, COMPACTED files carry their k1 [lo,hi] range in the
  * file name (read once from the parquet footers at compaction time),
  * and the batch's k1 values prune non-intersecting files at listing
  * time. Compaction writes fixed-TARGET-size files
  * (`targetRowsPerFile`), so a growing corpus index means MORE
  * same-sized range files per bucket, of which a batch still
  * intersects only O(its own k1 count) — per-batch bytes read stay
  * roughly FLAT as the index grows (BucketedDupIndexSpec pins this at
  * 1× vs 10× index size). Both prunings are exact, not heuristic: a
  * matching index row shares (band,k1,k2) with a batch row, therefore
  * its bucket hash and its k1 — a pruned file cannot contain a match.
  *
  * Replay correctness (foreachBatch is at-least-once): when batch B
  * replays after a crash, the index may already contain B's own files
  * from the failed attempt — reading them would make every B doc look
  * like a duplicate of itself and the replay would emit nothing while
  * step 5 erased the attempt's files. The index view is therefore
  * BATCH-SCOPED: batch B reads only files with batchId < B, i.e.
  * exactly the state the original attempt saw. Emission via `out`
  * carries the usual at-least-once contract — pair it with an
  * idempotent sink.
  *
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

  /** The storage bucket of a band row: which `b=<n>` directory it lives
    * in. Pure function of the join key, so a probe and every index row
    * it could match always agree on the bucket. */
  private[graft] def bucketCol(numBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("band"), col("k1"), col("k2")), lit(numBuckets))
      .cast("int")

  /** Strict file-name shapes. Appendix (ingest writer):
    * `fb-<batchId %012d>-<part %05d>.parquet`. Compacted range file:
    * `fbr-<batchId %012d>-<slot %05d>-<k1lo>-<k1hi>.parquet` — the k1
    * [lo,hi] of its rows, read from the parquet footers at compaction
    * time, so listing alone can value-prune. Anything else in the index
    * tree was never written by this protocol and is skipped (a foreign
    * file must not fail every subsequent micro-batch). */
  private val AppendixName = """^fb-(\d{12})-\d{5}\.parquet$""".r
  private val CompactName = """^fbr-(\d{12})-(\d{5})-(\d+)-(\d+)\.parquet$""".r

  /** The file's batch id, or None for files this protocol never wrote. */
  private[graft] def fileBatchId(name: String): Option[Long] = name match {
    case AppendixName(id) => Some(id.toLong)
    case CompactName(id, _, _, _) => Some(id.toLong)
    case _ => None
  }

  /** The compacted file's k1 [lo, hi]; None for (unsorted) appendices. */
  private[graft] def fileK1Range(name: String): Option[(Long, Long)] =
    name match {
      case CompactName(_, _, lo, hi) => Some((lo.toLong, hi.toLong))
      case _ => None
    }

  /** Per-batch index-read telemetry (what BucketedDupIndexSpec pins and
    * a production dashboard would chart): how much of the index this
    * batch actually listed and scanned, and where the batch's wall time
    * went (r10: the phase split that located the fixed-cost floor —
    * banding/collect, bucket listing, the index semi-join, emission,
    * the appendix write). */
  final case class IndexReadStats(batchId: Long, bucketsTouched: Int,
      filesRead: Int, bytesRead: Long,
      bandMs: Long = 0L, listMs: Long = 0L, dedupMs: Long = 0L,
      emitMs: Long = 0L, appendMs: Long = 0L)

  /** Index files batch `batchId` must read: only EARLIER batches (a
    * replayed batch must see exactly the index state its original
    * attempt saw, never its own half-written appendix), only the
    * touched buckets, and within a bucket only compacted files whose
    * k1 range intersects the batch's k1 values there. Returns the
    * statuses the per-bucket glob already fetched — callers read sizes
    * off them instead of issuing one getFileStatus RPC per file. */
  private[graft] def indexStatusesFor(fs: FileSystem, indexDir: Path,
      batchId: Long, touched: Map[Int, Array[Long]])
      : Seq[org.apache.hadoop.fs.FileStatus] =
    touched.toSeq.sortBy(_._1).flatMap { case (b, k1s) =>
      val st = fs.globStatus(new Path(indexDir, s"b=$b/*.parquet"))
      if (st == null) Seq.empty
      else st.filter { s =>
        val n = s.getPath.getName
        fileBatchId(n).exists(_ < batchId) &&
          fileK1Range(n).forall { case (lo, hi) =>
            k1s.exists(v => v >= lo && v <= hi)
          }
      }.toSeq
    }

  private[graft] def indexFilesFor(fs: FileSystem, indexDir: Path,
      batchId: Long, touched: Map[Int, Array[Long]]): Seq[Path] =
    indexStatusesFor(fs, indexDir, batchId, touched).map(_.getPath)

  /** The `floorBatchId` to adopt an existing index directory under a new
    * checkpoint: one past the highest batch id present (0 if empty).
    * Compute ONCE at adoption; see [[nearDupFilter]]'s stability note. */
  def nextFloor(spark: SparkSession, indexDir: String): Long = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.globStatus(new Path(p, "b=*/*.parquet"))
    val ids =
      if (st == null) Array.empty[Long]
      else st.flatMap(s => fileBatchId(s.getPath.getName))
    if (ids.isEmpty) 0L else ids.max + 1L
  }

  /** Start the filter: `docs` is a streaming DataFrame with `idCol`
    * (long, unique per document) and `textCol` (string); accepted
    * documents flow to `out` per micro-batch; `indexDir` accumulates
    * the accepted bucket table (created if absent, query-private),
    * bucket-partitioned into `numBuckets` directories. `numBuckets` is
    * a LAYOUT constant for the index's lifetime (pick ~corpus bands /
    * desired directory size at production scale; changing it means a
    * new index directory).
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
      floorBatchId: Long = 0L,
      numBuckets: Int = 64,
      onReadStats: IndexReadStats => Unit = _ => (),
      compactEvery: Int = 0): StreamingQuery =
    dupFilter(spark, docs, indexDir, out, idCol, textCol, triggerMs,
      checkpointDir, floorBatchId, numBuckets, onReadStats,
      minhashBands(_, idCol, textCol), compactEvery)

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
      floorBatchId: Long = 0L,
      numBuckets: Int = 64,
      onReadStats: IndexReadStats => Unit = _ => (),
      compactEvery: Int = 0): StreamingQuery =
    dupFilter(spark, docs, indexDir, out, idCol, textCol, triggerMs,
      checkpointDir, floorBatchId, numBuckets, onReadStats,
      exactBands(_, idCol, textCol), compactEvery)

  private val bandSchema = "id LONG, band INT, k1 BIGINT, k2 BIGINT"

  private def dupFilter(spark: SparkSession, docs: DataFrame,
      indexDir: String, out: (DataFrame, Long) => Unit,
      idCol: String, textCol: String, triggerMs: Long,
      checkpointDir: Option[String], floorBatchId: Long, numBuckets: Int,
      onReadStats: IndexReadStats => Unit,
      bander: DataFrame => DataFrame,
      /** > 0: every `compactEvery` batches, fold all earlier batches'
        * appendix files into per-bucket k1-range files INLINE (before
        * the batch's own read). Safe from inside batch B: batches < B
        * are committed, so no replay can glob-delete the compacted
        * files, and they adopt batch id B−1 — visibility is unchanged.
        * This is what keeps the per-batch file count (and its footer
        * open cost) BOUNDED on a long-running ingest instead of
        * growing ~numBuckets files per batch between maintenance
        * windows; the amortized cost shows up as a periodic slower
        * batch (batchMsMax) while the median stays low. */
      compactEvery: Int = 0): StreamingQuery = {
    require(floorBatchId >= 0L, s"floorBatchId < 0: $floorBatchId")
    require(numBuckets >= 1, s"numBuckets < 1: $numBuckets")
    val hconf = spark.sparkContext.hadoopConfiguration
    val idxPath = new Path(indexDir)
    val fs = idxPath.getFileSystem(hconf)
    fs.mkdirs(idxPath)
    val stagingRoot = new Path(indexDir + ".staging")

    val writer = docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, rawBatchId: Long) =>
        val batchId = floorBatchId + rawBatchId
        if (compactEvery > 0 && rawBatchId > 0 &&
            rawBatchId % compactEvery == 0)
          compactIndex(batch.sparkSession, indexDir, batchId, numBuckets)
        val b = batch.persist()
        try {
          val s = b.sparkSession
          val bands = bander(b)
            .withColumn("b", bucketCol(numBuckets)).persist()
          try {
            val t0 = System.nanoTime()
            // the batch's bucket → k1-values map: bounded by the batch
            // itself (≤ 4 band rows/doc), the driver-side listing input
            val touched = bands.select(col("b"), col("k1")).distinct()
              .collect().map(r => (r.getInt(0), r.getLong(1)))
              .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
            val t1 = System.nanoTime()
            val idxStatuses = indexStatusesFor(fs, idxPath, batchId, touched)
            val idxFiles = idxStatuses.map(_.getPath)
            val t2 = System.nanoTime()
            val index =
              if (idxFiles.isEmpty)
                s.createDataFrame(s.sparkContext
                    .emptyRDD[org.apache.spark.sql.Row],
                  org.apache.spark.sql.types.StructType.fromDDL(bandSchema))
              else s.read.schema(bandSchema)
                .parquet(idxFiles.map(_.toString): _*)
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
            // persisted + forced ONCE: both the emission's anti-join and
            // the appendix's anti-join reuse it — without this the index
            // parquet is read (and the semi-join run) twice per batch,
            // which was half the fixed-cost floor (r10 profile)
            val dupIds = crossDup.unionByName(intraDup).distinct().persist()
            try {
              dupIds.count()
              val t3 = System.nanoTime()
              val novel = b.join(dupIds,
                b(idCol) === dupIds("id"), "left_anti")
              out(novel, batchId)
              val t4 = System.nanoTime()
              // append the accepted docs' buckets; (batchId, part)-named
              // renames make the replay REPLACE, and the batch-scoped
              // index read above keeps the replay blind to them
              writeAppendix(fs, idxPath, stagingRoot, batchId,
                bands.join(dupIds, bands("id") === dupIds("id"),
                  "left_anti"))
              val t5 = System.nanoTime()
              def ms(a: Long, bb: Long) = (bb - a) / 1000000L
              onReadStats(IndexReadStats(batchId, touched.size,
                idxFiles.size, idxStatuses.map(_.getLen).sum,
                bandMs = ms(t0, t1), listMs = ms(t1, t2),
                dedupMs = ms(t2, t3), emitMs = ms(t3, t4),
                appendMs = ms(t4, t5)))
            } finally dupIds.unpersist()
          } finally bands.unpersist()
        } finally b.unpersist()
      }
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Enqueue one micro-batch's accepted bucket rows, partitioned into
    * the `b=` directories: stage (one `partitionBy("b")` write — a
    * single Spark job regardless of bucket count), then rename each
    * staged part to a name deterministic in (batchId, part index within
    * its bucket). A replayed micro-batch REPLACES its previous appendix
    * across ALL buckets: every existing `fb-<batchId>-*` under every
    * `b=` directory is deleted
    * first, because a replay may emit fewer parts or touch fewer
    * buckets than the failed attempt, and stale survivors would be
    * duplicate index rows re-flagging their docs forever. */
  private[graft] def writeAppendix(fs: FileSystem, idxPath: Path,
      stagingRoot: Path, batchId: Long, bandsWithBucket: DataFrame): Unit = {
    val stale = fs.globStatus(new Path(idxPath, f"b=*/fb-$batchId%012d-*"))
    if (stale != null) stale.foreach(s => fs.delete(s.getPath, false))
    // an empty frame enqueues nothing WITHOUT a pre-check job: a
    // partitionBy write of zero rows creates no partition dirs (only
    // _SUCCESS), so the rename loop below is naturally a no-op — unlike
    // a plain parquet write, which would land a footer-only file that
    // every later batch lists and opens
    val staging = new Path(stagingRoot, s"b$batchId")
    // co-locate each bucket's rows into one task BEFORE partitionBy:
    // without this every (shuffle partition × bucket) pair lands its own
    // tiny file — up to partitions×buckets per batch — and every later
    // batch pays the listing + footer reads. One file per touched bucket
    // per batch bounds index growth at numBuckets files/batch. The
    // shuffle is a few MB of (id, band, k1, k2) rows — noise.
    bandsWithBucket.repartition(col("b")).write.mode("overwrite")
      .partitionBy("b").parquet(staging.toString)
    val bucketDirs = fs.listStatus(staging)
      .map(_.getPath).filter(_.getName.startsWith("b="))
    bucketDirs.foreach { bd =>
      val dst = new Path(idxPath, bd.getName)
      fs.mkdirs(dst)
      val parts = fs.listStatus(bd)
        .map(_.getPath).filter(_.getName.startsWith("part-"))
        .sortBy(_.getName)
      parts.zipWithIndex.foreach { case (src, i) =>
        val d = new Path(dst, f"fb-$batchId%012d-$i%05d.parquet")
        // some FileSystems signal failure as `false` instead of
        // throwing; a silently missing part would re-admit duplicates.
        // Failing the batch is safe: the replay's glob-delete replaces
        // the batch's files wholesale.
        require(fs.rename(src, d), s"appendix rename $src -> $d failed")
      }
    }
    fs.delete(staging, true)
  }

  /** Offline compaction of the accepted-bucket index: merge every file
    * of batches < `upToBatchId` into per-bucket RANGE files — ~
    * `targetRowsPerFile` rows each, clustered by (bucket, k1), each
    * named with its k1 [lo,hi] read from its own parquet footers — at
    * batch id `upToBatchId - 1`, so visibility semantics are unchanged.
    * Compaction is what turns a grown index back into bounded per-batch
    * reads: a batch intersects O(its own k1 count) fixed-size range
    * files however large the index is.
    *
    * Crash safety has NO loss window, by ordering: (1) the compacted
    * rows are fully written (staged, partitioned by bucket), footers
    * are read for the range names, (2) staged parts rename in at FRESH
    * slot indices — base 50000 (above any streaming-writer part count)
    * plus one past the highest compacted slot already present in that
    * bucket, so a destination never collides with a live input, even
    * when a re-compaction at the same upToBatchId re-reads a previous
    * compaction's output — (3) only then are the originals deleted. A
    * crash between (2) and (3) leaves originals AND compacted rows
    * visible — duplicate bucket rows are semantically inert (the
    * filter's LEFT SEMI join is idempotent in the right side) and the
    * next compaction's `dropDuplicates` restores minimality. A crash
    * mid-(3) is the same state with fewer survivors.
    *
    * Contract: `upToBatchId` must be ≤ the last COMMITTED batch of the
    * live query (a committed micro-batch never replays, so no replay
    * can glob-delete the compacted files or re-read a pre-append index
    * view), and `numBuckets` must equal the live filter's. Run in a
    * maintenance window or between triggers: a batch that listed the
    * originals before (3) and read them after would fail its read (and
    * retry against the compacted view — at-least-once emission absorbs
    * the retry). */
  def compactIndex(spark: SparkSession, indexDir: String, upToBatchId: Long,
      numBuckets: Int = 64, targetRowsPerFile: Long = 1L << 19): Unit = {
    require(upToBatchId >= 1, s"compactIndex: upToBatchId=$upToBatchId")
    require(targetRowsPerFile >= 1,
      s"compactIndex: targetRowsPerFile=$targetRowsPerFile")
    val idxPath = new Path(indexDir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = idxPath.getFileSystem(hconf)
    val all = Option(fs.globStatus(new Path(idxPath, "b=*/*.parquet")))
      .getOrElse(Array.empty)
      .map(_.getPath)
      .filter(p => fileBatchId(p.getName).exists(_ < upToBatchId))
    if (all.length <= 1) return // nothing to merge
    val df = spark.read.schema(bandSchema)
      .parquet(all.map(_.toString).toIndexedSeq: _*)
      .dropDuplicates()
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) /
      targetRowsPerFile).toInt
    val staging = new Path(indexDir + ".staging", s"compact-$upToBatchId")
    // range-partition on (bucket, k1): each output file covers a
    // contiguous k1 slice of (at most a handful of) buckets; partitionBy
    // then splits any bucket-straddling file per directory, so every
    // written piece is one bucket × one contiguous k1 range
    df.withColumn("b", bucketCol(numBuckets))
      .repartitionByRange(nFiles, col("b"), col("k1"), col("k2"))
      .sortWithinPartitions(col("b"), col("k1"), col("k2"))
      .write.mode("overwrite").partitionBy("b").parquet(staging.toString)
    val bucketDirs = fs.listStatus(staging)
      .map(_.getPath).filter(_.getName.startsWith("b="))
    val renames = bucketDirs.flatMap { bd =>
      val dstDir = new Path(idxPath, bd.getName)
      fs.mkdirs(dstDir)
      // fresh slots: one past anything already compacted at this batch id
      val taken = Option(fs.globStatus(
          new Path(dstDir, f"fbr-${upToBatchId - 1}%012d-*.parquet")))
        .getOrElse(Array.empty)
        .map(_.getPath.getName).flatMap {
          case CompactName(_, slot, _, _) => Some(slot.toInt)
          case _ => None
        }
      var slot = math.max(50000, if (taken.isEmpty) 0 else taken.max + 1)
      fs.listStatus(bd).map(_.getPath)
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        .map { src =>
          val (lo, hi) = parquetLongRange(hconf, src, "k1")
          val d = new Path(dstDir,
            f"fbr-${upToBatchId - 1}%012d-$slot%05d-$lo-$hi.parquet")
          slot += 1
          require(slot <= 99999,
            s"compactIndex: slot space exhausted in ${bd.getName} — " +
              "raise targetRowsPerFile or start a fresh index directory")
          (src, d)
        }
    }
    // rename MUST be verified before anything is deleted: some
    // FileSystems report failure as `false` rather than throwing, and
    // proceeding to the deletes below would destroy both the staged
    // copy and the originals. Aborting here is safe: originals are
    // intact, already-renamed parts are inert duplicates, rerun
    // re-compacts.
    renames.foreach { case (src, dst) =>
      require(fs.rename(src, dst),
        s"compactIndex: rename $src -> $dst failed; originals retained, " +
          "re-run compaction")
    }
    fs.delete(staging, true)
    all.foreach(p => fs.delete(p, false))
  }

  /** [lo, hi] of a long column across all row groups of one parquet
    * file, from the footer statistics (no data pages read). */
  private def parquetLongRange(hconf: org.apache.hadoop.conf.Configuration,
      file: Path, column: String): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      file, hconf)
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val stats = rd.getFooter.getBlocks.asScala.flatMap { blk =>
        blk.getColumns.asScala
          .find(_.getPath.toDotString == column).map(_.getStatistics)
      }
      require(stats.nonEmpty, s"no $column statistics in $file")
      (stats.map(_.genericGetMin.asInstanceOf[Number].longValue).min,
        stats.map(_.genericGetMax.asInstanceOf[Number].longValue).max)
    } finally rd.close()
  }
}
