package graft.sources

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{
  FileIndex, FileStatusCache, HadoopFsRelation, InMemoryFileIndex,
  PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.{col, count, lit, max, min,
  regexp_replace, sum, unix_date, unix_micros}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-FILE min/max statistics manifest + a planning-time pruning
  * `FileIndex` — the data-skipping half of `OPTIMIZE ZORDER`.
  *
  * `LayoutSpec` (round 8) proved the gap this fills: after
  * [[graft.operators.Layout.zorder]] tightens every clustered column's
  * per-file extent, vanilla Spark still opens EVERY file — parquet
  * footer stats skip row groups only after a task has launched and read
  * the footer. At 100 TB / ~100k files that is ~100k tasks scheduled to
  * discard most of their input. Lakehouse formats solve it with file
  * stats in the table log (Delta `stats`, Iceberg manifest files); the
  * reference's scan contracts stop at predicate pushdown into the scan
  * (`flink-table-common/…/source/abilities/SupportsFilterPushDown.java`)
  * — this module takes the same contract to the FILE level for plain
  * parquet directories:
  *
  *  - [[write]] — one column-pruned, distributed pass over the written
  *    files (`groupBy(_metadata.file_name)`) collects per-file
  *    min/max/non-null-count per stats column into
  *    `<dir>/_graft_manifest` (underscore prefix: invisible to any
  *    normal reader, exactly like `_SUCCESS`). Manifest size is
  *    O(files × columns) — a few MB at 100k files, a driver-trivial
  *    read forever after.
  *  - [[scan]] — a DataFrame over the directory whose [[FileIndex]]
  *    evaluates the query's pushed data filters against the manifest
  *    and lists ONLY the files a predicate could match, before any task
  *    launches. Catalyst still prunes row groups inside the survivors
  *    via parquet footers — the two layers compose.
  *
  * Pruning is REFUTATION-only and conservative: a file is dropped only
  * when its stats prove no row can match (`mayMatch` returns false);
  * any expression shape the evaluator doesn't understand keeps the
  * file. Min/max are kept in three order-exact domains — LONG
  * (integrals, boolean, date days, timestamp micros), DOUBLE (float,
  * double), STRING (UTF8 binary order) — so no cross-domain rounding
  * can ever skip a matching file; types outside those domains simply
  * carry no stats (never pruned).
  */
object StatsManifest {

  private val ManifestDir = "_graft_manifest"
  private val RemovedFile = "_removed.txt"
  private val SchemaFile = "_schema.json"
  /** The committing OPERATION's kind, one word (`append`, `delete`,
    * `update`, `merge`, `upsert`, `replace` (overwrite-where),
    * `overwrite` (full rebuild), `optimize`, `schema`,
    * `checkpoint`, `create`) — what DESCRIBE HISTORY shows and what
    * lets a CDC stream tell a net-zero maintenance commit (optimize /
    * checkpoint: skip) from a data change. Absent on pre-r11 versions
    * (readers treat unknown as unknown, never as safe-to-skip). */
  private val OpFile = "_op.txt"
  /** Marks a DELTA version (content = newly-deleted entry keys, one per
    * line, possibly empty): the version carries only its own added
    * entries (`part-*`), inheriting everything else from its
    * predecessor chain down to the nearest checkpoint. Absent = the
    * version is a full CHECKPOINT (every pre-delta version reads as
    * one — seamless back-compat). */
  private val DeltaFile = "_delta.txt"
  /** Marks a delta version that [[expire]] retro-materialized into a
    * checkpoint: the folded full entry set lives in `cp-*` files inside
    * the version dir, written BEFORE the marker — a racing reader
    * either sees the complete checkpoint or keeps folding the (still
    * intact) delta chain. */
  private val CpMarker = "_checkpointed"
  private val CpPrefix = "cp-"
  /** Best-effort pointer to the newest committed version — the O(1)
    * seed for [[latestVersion]]'s galloping probe, so resolving
    * "latest" stops being an O(versions) directory listing on every
    * read and commit (the last driver-side growth curve of a long-
    * lived table: a streaming sink commits per micro-batch, 10⁵+
    * versions are routine). Torn/stale/missing hints are all safe:
    * retained versions are a dense integer suffix (commits claim
    * consecutive slots, expire deletes a prefix), so any hint at or
    * below the true latest gallops up to it, and anything unparseable
    * falls back to the full listing. */
  private val HintFile = "_latest_hint"
  /** The commit's wall-clock time in epoch millis, staged WITH the
    * version content (rides the atomic rename). The authoritative
    * source for [[commitTimes]]: the version dir's FS mtime — the old
    * source — is perturbed by [[expire]]'s retro-materialization
    * (writing `cp-*` files into an old version dir bumps its mtime to
    * vacuum time), which made post-VACUUM timestamps non-monotonic and
    * broke `startingTimestamp` / time-window retention for any instant
    * older than the vacuum. Versions committed before this sidecar
    * existed fall back to the mtime (best-effort, documented). */
  private val CommitTsFile = "_commit_ts"

  private def vDirPath(mDir: Path, v: Long): Path =
    new Path(mDir, f"v$v%06d")

  /** Auto-checkpoint cadence: every version whose number is a multiple
    * of this commits as a full checkpoint; the rest are deltas. Bounds
    * the fold chain a reader walks AND amortizes the O(files) fold
    * cost across `interval` O(delta) commits. Per-table first
    * (`manifest.checkpointInterval` table property), session conf
    * fallback — a hot streaming table and a slow batch table want
    * different cadences in one session. */
  private def checkpointInterval(spark: SparkSession, dir: String): Int = {
    val n = tablePolicy(spark, dir,
      "manifest.checkpointInterval", "16").toInt
    require(n >= 1,
      s"manifest.checkpointInterval must be >= 1, got $n")
    n
  }

  /** Per-file, per-column stats: [lo, hi] over non-null values in one of
    * the three order-exact domains, plus the non-null count. `lo`/`hi`
    * are None for an all-null column. Dom 'B' = bloom-only (no range
    * kept — the column's type has no order-exact stats domain). `bloom`,
    * when non-null, is a per-file Bloom filter over `xxhash64(value)`
    * ([[Bloom]]) — the equality-pruning complement to min/max for
    * high-cardinality columns whose per-file range spans the whole
    * domain (digests, hash-scattered ids). */
  final case class ColStats(dom: Char, lLo: Long = 0L, lHi: Long = 0L,
      dLo: Double = 0.0, dHi: Double = 0.0, sLo: String = null,
      sHi: String = null, nonNull: Long = 0L, hasRange: Boolean = false,
      bloom: Array[Byte] = null,
      /** exact long sum over non-null values — kept for INTEGRAL
        * columns only (order-free, so a metadata-only SUM is
        * bit-identical to the scan; double sums are order-sensitive at
        * ulp level and are deliberately NOT kept). */
      lSum: Long = 0L, hasSum: Boolean = false)

  final case class FileStats(rows: Long, cols: Map[String, ColStats],
      /** file length in bytes, carried so per-batch split planning
        * (e.g. the streaming source) never issues a per-file
        * getFileStatus RPC; −1 for manifests written before the column
        * existed (callers fall back to a live stat). */
      len: Long = -1L)

  /** The order-exact stats domain of `dt`, or None (no stats kept). */
  private def domOf(dt: DataType): Option[Char] = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
        DateType | TimestampType => Some('L')
    case FloatType | DoubleType => Some('D')
    case StringType => Some('S')
    case _ => None
  }

  /** Column projected into its stats domain — MUST mirror the literal
    * domains Catalyst uses in pushed filters (date = epoch days int,
    * timestamp = epoch micros long) so manifest bounds and filter
    * literals compare on the same scale. */
  private def toDom(dt: DataType, c: Column): Column = dt match {
    case DateType => unix_date(c).cast("long")
    case TimestampType => unix_micros(c)
    case ByteType | ShortType | IntegerType | LongType | BooleanType =>
      c.cast("long")
    case FloatType | DoubleType => c.cast("double")
    case StringType => c
    case other => throw new IllegalArgumentException(s"no stats dom: $other")
  }
  private type Column = org.apache.spark.sql.Column

  /** Compute and (over)write the manifest for the parquet files under
    * `dir`, keeping stats for `statsCols` (columns with non-orderable
    * types are skipped). One distributed scan, pruned to the stats
    * columns; the manifest lands in `<dir>/_graft_manifest`. */
  /** Manifest key for a file: the scheme-and-authority-free absolute
    * path. A bare file NAME would collide under Hive-partitioned
    * layouts — a dynamic-partition write emits the same
    * `part-<task>-<jobUuid>` name into every partition directory it
    * touches. The SQL side strips `scheme://authority` from
    * `_metadata.file_path`; the lookup side uses `Path.toUri.getPath` —
    * both normalize to the same string. */
  private[sources] def fileKeyCol: Column =
    regexp_replace(col("_metadata.file_path"),
      "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", "").as("file")
  private[graft] def fileKey(p: Path): String = p.toUri.getPath

  // ---------------------------------------------------------------- //
  //  Per-file Bloom filters (equality pruning)                        //
  // ---------------------------------------------------------------- //

  /** Bit math shared by the write-side aggregator and the read-side
    * membership check. One 64-bit `xxhash64(value)` (seed 42 — Spark's
    * default, so the pruner can recompute a literal's hash with the
    * same built-in) splits Kirsch-Mitzenmacher-style into K=5 probe
    * positions. Sizing: fpp ≈ (1 − e^(−K·n/m))^K for n distinct values
    * per file and m bits — m ≈ 10·n gives ~1%; the default 2^16 bits
    * (8 KB/file) covers ~6.5k distinct/file at 1%. A false positive
    * only costs an unpruned file — never a wrong answer. */
  private[graft] object Bloom {
    val K = 5
    def positions(h: Long, mBits: Int): Array[Int] = {
      val h1 = (h & 0xffffffffL).toInt
      val h2 = (((h >>> 32) | 1L) & 0xffffffffL).toInt // odd probe step
      val out = new Array[Int](K)
      var i = 0
      while (i < K) {
        val p = (h1.toLong + i.toLong * h2.toLong) % mBits
        out(i) = ((p + mBits) % mBits).toInt
        i += 1
      }
      out
    }
    def mayContain(bloom: Array[Byte], h: Long): Boolean =
      positions(h, bloom.length * 8).forall(p =>
        (bloom(p >> 3) & (1 << (p & 7))) != 0)
  }

  /** Spark `Aggregator` building one bloom per group (= per file) from
    * `xxhash64` inputs: set-bits in a long-word buffer, merge = OR.
    * Partition-parallel with map-side partials like any agg. */
  final case class BloomAgg(mBits: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Long, Array[Long], Array[Byte]] {
    require(mBits >= 64 && mBits % 64 == 0, s"BloomAgg: mBits=$mBits")
    override def zero: Array[Long] = new Array[Long](mBits / 64)
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      Bloom.positions(h, mBits).foreach(p => b(p >> 6) |= 1L << (p & 63))
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Byte] = {
      // byte i = bits [8i, 8i+8) — little-endian within each word, so
      // position p lives at byte p>>3, bit p&7 (Bloom.mayContain's view)
      val out = new Array[Byte](b.length * 8)
      var p = 0
      while (p < out.length) {
        out(p) = ((b(p >> 3) >>> ((p & 7) * 8)) & 0xff).toByte
        p += 1
      }
      out
    }
    override def bufferEncoder
        : org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder
        : org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** `xxhash64` of a pushed-filter literal, computed with the SAME
    * Catalyst expression the write side aggregates over — internal
    * value + attribute type in, identical 64-bit hash out. */
  private def hashLit(dt: DataType, v: Any): Long =
    XxHash64(Seq(Literal(v, dt)), 42L).eval(null).asInstanceOf[Long]

  /** The per-file agg columns for one manifest build: `rows`, range
    * min/max per orderable stats column, non-null count per stats OR
    * bloom column, one bloom per bloom column. Shared by [[write]] and
    * the incremental [[update]] so both produce the same schema. */
  /** Integral types whose exact long sum the manifest keeps (order-free
    * accumulation, wrap-consistent with Spark's own non-ANSI long sum). */
  private def sumable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def statsAggs(schema: StructType, statsCols: Seq[String],
      bloomCols: Seq[String], bloomBits: Int): Seq[Column] = {
    // stats columns are keyed by LOGICAL name; the scanned frame (raw
    // parquet) carries PHYSICAL names — map on input, key on logical
    val nm = nameMapOf(schema)
    def in(c: String): Column = col(nm.getOrElse(c, c))
    val kept = statsCols.filter(c => domOf(schema(c).dataType).isDefined)
    val cntCols = (kept ++ bloomCols).distinct
    val ranges = kept.flatMap { c =>
      val dt = schema(c).dataType
      val d = toDom(dt, in(c))
      val tag = domOf(dt).get.toLower
      Seq(min(d).as(s"${tag}min__$c"), max(d).as(s"${tag}max__$c"))
    }
    val sums = kept.filter(c => sumable(schema(c).dataType))
      .map(c => sum(in(c).cast("long")).as(s"sum__$c"))
    val cnts = cntCols.map(c => count(in(c)).as(s"cnt__$c"))
    val blooms = bloomCols.map { c =>
      val agg = org.apache.spark.sql.functions.udaf(
        BloomAgg(bloomBits), org.apache.spark.sql.Encoders.scalaLong)
      agg(org.apache.spark.sql.functions.xxhash64(in(c)))
        .as(s"bloom__$c")
    }
    // file length (constant within the group = one file) rides along so
    // downstream split planning is a pure metadata read
    count(lit(1)).as("rows") +:
      min(col("_metadata.file_size")).as("flen") +:
      (ranges ++ sums ++ cnts ++ blooms)
  }

  /** Manifest column names [[statsAggs]] produces (order-free set), for
    * [[update]]'s reuse-compatibility check. */
  private def expectedCols(schema: StructType, statsCols: Seq[String],
      bloomCols: Seq[String]): Set[String] = {
    val kept = statsCols.filter(c => domOf(schema(c).dataType).isDefined)
    val cntCols = (kept ++ bloomCols).distinct
    kept.flatMap { c =>
      val tag = domOf(schema(c).dataType).get.toLower
      Seq(s"${tag}min__$c", s"${tag}max__$c")
    }.toSet ++
      kept.filter(c => sumable(schema(c).dataType)).map(c => s"sum__$c") ++
      cntCols.map(c => s"cnt__$c") ++
      bloomCols.map(c => s"bloom__$c") + "file" + "rows" + "flen"
  }

  // ---------------------------------------------------------------- //
  //  Versioned commits: snapshot isolation + time travel              //
  // ---------------------------------------------------------------- //

  /** Manifest versions are immutable directories
    * `_graft_manifest/v%06d/part-*.parquet`, committed by ATOMIC rename
    * from a hidden staging dir — a reader listing versions sees each
    * one fully formed or not at all, so the old "overwrite briefly
    * unlists the manifest" maintenance window is gone: readers resolve
    * max(version) and never observe a half-written state. Concurrent
    * writers race the rename; the loser's rename fails (the target
    * exists) and it retries with the next number — optimistic
    * single-winner commits on a plain FileSystem, the same shape as a
    * lakehouse log's conditional put. Old versions are retained for
    * snapshot reads ([[scanAtVersion]]) until [[expire]]d; note that
    * `Layout.optimize` DELETES replaced data files, which invalidates
    * snapshots that reference them (exactly like VACUUM vs time
    * travel). Pre-versioning manifests (`part-*` directly under
    * `_graft_manifest`) still resolve as a legacy fallback. */
  private val VersionRe = """^v(\d{6})$""".r

  /** Committed manifest versions under `dir`, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsys.exists(mDir)) Seq.empty
    else fsys.listStatus(mDir).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case VersionRe(n) => Some(n.toLong)
          case _ => None
        }
    }.flatten.sorted
  }

  private def writeHint(fsys: org.apache.hadoop.fs.FileSystem,
      mDir: Path, v: Long): Unit =
    try {
      val out = fsys.create(new Path(mDir, HintFile), true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    } catch { case _: Exception => () } // best-effort; probe falls back

  /** The newest committed version — O(log gap) `exists()` probes from
    * the hint instead of an O(versions) listing. Sound because retained
    * versions form a dense integer suffix: gallop up from any existing
    * hinted version, then bisect the first gap. Any hint problem
    * (missing, torn, expired, foreign) falls back to the listing. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val probed =
      try {
        val f = new Path(mDir, HintFile)
        if (!fsys.exists(f)) None
        else {
          val in = fsys.open(f)
          val h = (try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString.trim finally in.close()).toLong
          if (!fsys.exists(vDirPath(mDir, h))) None
          else {
            var lo = h // exists
            var step = 1L
            while (fsys.exists(vDirPath(mDir, lo + step))) {
              lo += step
              step *= 2
            }
            var hi = lo + step // does not exist
            while (hi - lo > 1) {
              val mid = lo + (hi - lo) / 2
              if (fsys.exists(vDirPath(mDir, mid))) lo = mid else hi = mid
            }
            Some(lo)
          }
        }
      } catch { case _: Exception => None }
    probed.orElse(versions(spark, dir).lastOption)
  }

  // ---------------------------------------------------------------- //
  //  Tombstones: files REMOVED by row-level ops (graft.sources.RowOps) //
  // ---------------------------------------------------------------- //

  /** Row-level operations (DELETE/UPDATE/MERGE — [[RowOps]]) replace
    * data files WITHOUT physically deleting the old ones, so snapshot
    * reads at earlier versions keep working and [[RowOps.changes]] can
    * read the removed rows for CDC. The replaced files are TOMBSTONED
    * instead: each manifest version carries the cumulative set of
    * removed-but-still-present file keys in a `_removed.txt` sidecar
    * (committed atomically with the version — it rides the same staged
    * rename). Latest-scans deny tombstoned files; [[update]]/[[write]]
    * reconciliation treats them as nonexistent (never "rediscovered" as
    * new files); [[expire]] physically reclaims a tombstoned file once
    * no retained version references it — the VACUUM half. The set is
    * self-trimming: reconciliation drops keys whose file is physically
    * gone. */
  private def readRemoved(fsys: org.apache.hadoop.fs.FileSystem,
      vDir: Path): Set[String] = {
    val f = new Path(vDir, RemovedFile)
    if (!fsys.exists(f)) Set.empty
    else {
      val in = fsys.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** The operation KIND version `version` committed (`delete`,
    * `append`, `optimize`, …) — None for pre-op-sidecar versions. */
  def opAt(spark: SparkSession, dir: String,
      version: Long): Option[String] = {
    val vDir = new Path(new Path(dir, ManifestDir), f"v$version%06d")
    val fsys = vDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val f = new Path(vDir, OpFile)
    if (!fsys.exists(f)) None
    else {
      val in = fsys.open(f)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim)
      finally in.close()
    }
  }

  /** The cumulative tombstone set as of manifest version `version`. */
  def removedAt(spark: SparkSession, dir: String,
      version: Long): Set[String] = {
    val vDir = new Path(new Path(dir, ManifestDir), f"v$version%06d")
    val fsys = vDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readRemoved(fsys, vDir)
  }

  /** Latest version's tombstone set; empty for unversioned/absent
    * manifests (legacy layouts predate row-level ops). */
  def removedLatest(spark: SparkSession, dir: String): Set[String] =
    latestVersion(spark, dir)
      .map(removedAt(spark, dir, _)).getOrElse(Set.empty)

  // ---------------------------------------------------------------- //
  //  Versioned table schema: metadata-only evolution                  //
  // ---------------------------------------------------------------- //

  /** Each manifest version may carry the table's AUTHORITATIVE schema
    * in a `_schema.json` sidecar (committed in the same atomic rename).
    * Absent (every pre-evolution table), the schema is whatever parquet
    * footer inference says — unchanged behavior. Present, every read
    * and stats scan uses it EXPLICITLY: files missing a column serve
    * nulls (how a metadata-only ADD COLUMN works — zero rewrite), files
    * carrying extra columns have them projected away (DROP COLUMN).
    * Snapshot reads use the schema AS OF their version, so time travel
    * crosses schema changes faithfully. */
  private def readSchemaSidecar(fsys: org.apache.hadoop.fs.FileSystem,
      vDir: Path): Option[StructType] = {
    val f = new Path(vDir, SchemaFile)
    if (!fsys.exists(f)) None
    else {
      val in = fsys.open(f)
      try Some(DataType.fromJson(scala.io.Source
        .fromInputStream(in, "UTF-8").mkString).asInstanceOf[StructType])
      finally in.close()
    }
  }

  /** The schema AS OF version `version` (sidecar), if one was committed. */
  def schemaAt(spark: SparkSession, dir: String,
      version: Long): Option[StructType] = {
    val vDir = new Path(new Path(dir, ManifestDir), f"v$version%06d")
    readSchemaSidecar(vDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration), vDir)
  }

  private def schemaLatest(spark: SparkSession,
      dir: String): Option[StructType] =
    latestVersion(spark, dir).flatMap(schemaAt(spark, dir, _))

  /** The table's authoritative CURRENT schema: the latest version's
    * sidecar, else parquet inference over the directory. */
  def tableSchema(spark: SparkSession, dir: String): StructType =
    schemaLatest(spark, dir)
      .getOrElse(spark.read.parquet(dir).schema)

  /** Commit a SCHEMA-ONLY version: same file entries and tombstones as
    * the latest version, new authoritative schema — the metadata-only
    * half of ADD/DROP COLUMN ([[RowOps.addColumn]]/[[RowOps.dropColumn]]).
    * Returns the committed version. */
  def commitSchema(spark: SparkSession, dir: String,
      newSchema: StructType): Long = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    latestVersion(spark, dir) match {
      case Some(l) =>
        // a pure-metadata DELTA: no entries change hands, so the commit
        // is O(1) — but it inherits from l, so the only sound slot is
        // l+1 (a racer in between means lost updates)
        commitDelta(spark, dir, Nil, new StructType(), Set.empty,
          removedLatest(spark, dir), Some(newSchema), Some(l),
          op = Some("schema"))
      case None =>
        // legacy unversioned manifest: first versioned commit is full
        val parts = legacyParts(fsys, mDir).getOrElse(throw
          new IllegalStateException(
            s"commitSchema: $dir is not a manifested table"))
        val existing =
          spark.read.parquet(parts.map(_.toString).toIndexedSeq: _*)
        commitVersion(spark, dir, existing, removedLatest(spark, dir),
          Some(newSchema), None, op = Some("schema"))
    }
  }

  /** RENAME COLUMN's manifest half: commit a checkpoint whose entry
    * columns are re-keyed from logical `from` to `to` (values, file
    * keys, rows untouched) together with the new schema sidecar —
    * ONE commit, O(manifest), never a data rewrite. The stat-column
    * prefixes are closed ([[statsAggs]]), so the rename is exact. */
  private[graft] def renameStatsColumns(spark: SparkSession,
      dir: String, from: String, to: String,
      newSchema: StructType): Long = {
    val l = latestVersion(spark, dir).getOrElse(throw
      new IllegalStateException(
        s"renameStatsColumns: $dir is not a manifested table"))
    val prefixes = Seq("lmin__", "lmax__", "dmin__", "dmax__",
      "smin__", "smax__", "sum__", "cnt__", "bloom__")
    val entries = entriesAt(spark, dir, l)
    val renamed = entries.schema.fieldNames.foldLeft(entries) {
      (df, n) =>
        prefixes.find(p => n == p + from) match {
          case Some(p) => df.withColumnRenamed(n, p + to)
          case None => df
        }
    }
    commitVersion(spark, dir, renamed, removedLatest(spark, dir),
      Some(newSchema), Some(l), op = Some("schema"))
  }

  /** Stage `manifest` under a hidden dir, then commit it as the next
    * version via atomic rename. Returns the committed version.
    *
    * When `expected` is set the manifest was BUILT from that version's
    * state, so the ONLY sound slot is expected+1: the rename itself is
    * the atomic check-and-act, and losing it means a racer committed in
    * between — abort with ConcurrentModificationException (the staged
    * dir is cleaned up). The bump-to-next-free-slot retry is reserved
    * for expectation-free commits (e.g. streaming reconciliation),
    * where the manifest content doesn't depend on the predecessor. */
  private[graft] def commitVersion(spark: SparkSession, dir: String,
      manifest: DataFrame, removed: Set[String] = Set.empty,
      schema: Option[StructType] = None,
      expected: Option[Long] = None,
      op: Option[String] = None): Long = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(mDir, s".stage-${java.util.UUID.randomUUID()}")
    manifest.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    if (removed.nonEmpty) {
      val out = fsys.create(new Path(stage, RemovedFile), true)
      try out.write(removed.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
    schema.foreach { s =>
      val out = fsys.create(new Path(stage, SchemaFile), true)
      try out.write(s.json.getBytes("UTF-8"))
      finally out.close()
    }
    op.foreach { o =>
      val out = fsys.create(new Path(stage, OpFile), true)
      try out.write(o.getBytes("UTF-8")) finally out.close()
    }
    locally {
      val out = fsys.create(new Path(stage, CommitTsFile), true)
      try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
      finally out.close()
    }
    // verified-atomic slot claim: a marker file with this commit's UUID
    // distinguishes "our stage now lives AT dst" from every way a rename
    // can mislead — see claimSlot
    val marker = s"_claim-${stage.getName.stripPrefix(".stage-")}"
    fsys.create(new Path(stage, marker), true).close()
    expected match {
      case Some(e) =>
        val v = e + 1
        if (!claimSlot(fsys, stage, new Path(mDir, f"v$v%06d"), marker)) {
          fsys.delete(stage, true)
          throw new java.util.ConcurrentModificationException(
            s"StatsManifest: version $v already committed under $mDir — " +
              s"this op analyzed version $e and a racer won the slot; " +
              "re-run the operation against the new latest")
        }
        writeHint(fsys, mDir, v)
        v
      case None =>
        var v = latestVersion(spark, dir).getOrElse(0L) + 1
        var attempts = 0
        while (!claimSlot(fsys, stage, new Path(mDir, f"v$v%06d"), marker)) {
          attempts += 1
          require(attempts < 1000 && fsys.exists(stage),
            s"StatsManifest: could not commit a manifest version under $mDir")
          v += 1 // lost the race for v — try the next slot
        }
        writeHint(fsys, mDir, v)
        v
    }
  }

  /** Commit a DELTA version: `addRows` (manifest entries in the stats
    * schema `entrySchema`) enter, `deleteKeys` leave, everything else
    * is inherited — the commit writes O(delta), never re-materializing
    * the carried entry set. Every [[checkpointInterval]]-th slot (and
    * the first versioned commit over a legacy layout) materializes a
    * full checkpoint instead, via the distributed fold — that is what
    * amortizes reads to a bounded chain and lets [[expire]] drop
    * history. Same slot-claim protocol and `expected` semantics as
    * [[commitVersion]]; `removed` is the CUMULATIVE tombstone set to
    * record (it rides every version, delta or not — O(tombstones) text,
    * self-trimming via reconciliation). */
  private[graft] def commitDelta(spark: SparkSession, dir: String,
      addRows: Seq[org.apache.spark.sql.Row], entrySchema: StructType,
      deleteKeys: Set[String], removed: Set[String],
      schema: Option[StructType], expected: Option[Long],
      forceCheckpoint: Boolean = false,
      op: Option[String] = None): Long = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val interval = checkpointInterval(spark, dir)

    def writeText(stage: Path, name: String, content: String): Unit = {
      val out = fsys.create(new Path(stage, name), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }

    /** Stage this commit's content for slot `slot` (predecessor
      * `prev`; 0 = none/legacy) and try to claim it. */
    def stageAndClaim(slot: Long, prev: Long): Option[Long] = {
      val stage = new Path(mDir, s".stage-${java.util.UUID.randomUUID()}")
      val marker = s"_claim-${stage.getName.stripPrefix(".stage-")}"
      val addsDf =
        if (addRows.isEmpty) None
        else Some(spark.createDataFrame(
          spark.sparkContext.parallelize(addRows.toIndexedSeq, 1),
          entrySchema))
      val isCp = forceCheckpoint || slot % interval == 0 || prev == 0L
      if (isCp) {
        // fold predecessor + this delta into a full checkpoint. The
        // fold is the distributed entriesAt read; the delta applies as
        // (drop deleted-or-replaced keys) ∪ adds.
        val prevDf =
          if (prev > 0L) entriesAt(spark, dir, prev)
          else legacyParts(fsys, mDir) match {
            case Some(parts) => spark.read
              .parquet(parts.map(_.toString).toIndexedSeq: _*)
            case None => addsDf.getOrElse(throw new IllegalStateException(
              s"commitDelta: $dir has no manifest to fold")).limit(0)
          }
        val fileIdx = entrySchema.fieldNames.indexOf("file")
        val dropKeys = deleteKeys ++
          addRows.map(_.getString(if (fileIdx < 0) 0 else fileIdx))
        val kept =
          if (dropKeys.isEmpty) prevDf
          else prevDf.where(!col("file")
            .isin(dropKeys.toSeq.sorted: _*))
        val full = addsDf.fold(kept)(a => kept.unionByName(a))
        full.coalesce(1).write.mode("overwrite").parquet(stage.toString)
        // no DeltaFile → reads treat this version as a checkpoint
      } else {
        addsDf match {
          case Some(a) =>
            a.coalesce(1).write.mode("overwrite").parquet(stage.toString)
          case None => fsys.mkdirs(stage)
        }
        writeText(stage, DeltaFile,
          deleteKeys.toSeq.sorted.mkString("\n"))
      }
      if (removed.nonEmpty)
        writeText(stage, RemovedFile,
          removed.toSeq.sorted.mkString("\n"))
      schema.foreach(s => writeText(stage, SchemaFile, s.json))
      op.foreach(writeText(stage, OpFile, _))
      writeText(stage, CommitTsFile, System.currentTimeMillis().toString)
      fsys.create(new Path(stage, marker), true).close()
      if (claimSlot(fsys, stage, vDirPath(mDir, slot), marker)) {
        writeHint(fsys, mDir, slot)
        // the committer KNOWS the new state: predecessor's cached
        // snapshot ± this delta — populate the cache so the next
        // reader (a per-batch writer re-opening its own table) pays a
        // map lookup, not a fold job
        for {
          prevT <- vDirMtime(fsys, vDirPath(mDir, prev))
          prevM <- cacheGet(dir, prev, prevT)
          slotT <- vDirMtime(fsys, vDirPath(mDir, slot))
        } {
          val added =
            if (addRows.isEmpty) Map.empty[String, FileStats]
            else decodeRows(entrySchema, addRows.toArray)
          cachePut(dir, slot, slotT, prevM -- deleteKeys ++ added)
        }
        Some(slot)
      } else {
        fsys.delete(stage, true)
        None
      }
    }

    expected match {
      case Some(e) =>
        stageAndClaim(e + 1, e).getOrElse(
          throw new java.util.ConcurrentModificationException(
            s"StatsManifest: version ${e + 1} already committed under " +
              s"$mDir — this op analyzed version $e and a racer won the " +
              "slot; re-run the operation against the new latest"))
      case None =>
        var attempts = 0
        while (true) {
          val prev = latestVersion(spark, dir).getOrElse(0L)
          stageAndClaim(prev + 1, prev) match {
            case Some(v) => return v
            case None =>
              attempts += 1
              require(attempts < 1000,
                "StatsManifest: could not commit a manifest version " +
                  s"under $mDir")
          }
        }
        throw new IllegalStateException("unreachable")
    }
  }

  /** Claim version slot `dst` by renaming the staged dir onto it;
    * true iff the stage now lives AT dst. A bare rename is NOT a sound
    * claim test: the FileSystem contract renames a source INTO an
    * existing destination directory (LocalFileSystem/ChecksumFileSystem
    * do exactly that), so losing the race can return `true` with the
    * stage nested INSIDE the winner's committed version — silently
    * merging two commits. The pre-created `marker` file must appear
    * directly under dst for the claim to count; a detected mis-move is
    * undone (the nested stage moves back out) so the winner's version
    * dir is left byte-identical and the caller retries or aborts. */
  private[graft] def claimSlot(fsys: org.apache.hadoop.fs.FileSystem,
      stage: Path, dst: Path, marker: String): Boolean = {
    if (fsys.exists(dst)) return false
    if (!fsys.rename(stage, dst)) return false
    if (fsys.exists(new Path(dst, marker))) return true
    val nested = new Path(dst, stage.getName)
    if (fsys.exists(nested)) fsys.rename(nested, stage)
    false
  }

  /** Part files of a LEGACY unversioned manifest (`part-*` directly
    * under `_graft_manifest` — layouts that predate versioned commits),
    * or None. */
  private def legacyParts(fsys: org.apache.hadoop.fs.FileSystem,
      mDir: Path): Option[Seq[Path]] = {
    if (!fsys.exists(mDir)) return None
    val parts = fsys.listStatus(mDir).map(_.getPath)
      .filter(p => !p.getName.startsWith(".") &&
        p.getName.startsWith("part-")).toSeq
    if (parts.nonEmpty) Some(parts) else None
  }

  // ---------------------------------------------------------------- //
  //  Delta versions + checkpoints: the manifest log                    //
  // ---------------------------------------------------------------- //

  /** True when version dir `vDir` must be folded onto its predecessor
    * (a delta that [[expire]] has not retro-materialized). */
  private def isDeltaVersion(fsys: org.apache.hadoop.fs.FileSystem,
      vDir: Path): Boolean =
    fsys.exists(new Path(vDir, DeltaFile)) &&
      !fsys.exists(new Path(vDir, CpMarker))

  /** The full-entry part files of a checkpoint version dir: the
    * retro-materialized `cp-*` set when present, else the committed
    * `part-*` set. */
  private def basePartsOf(fsys: org.apache.hadoop.fs.FileSystem,
      vDir: Path): Seq[Path] = {
    val prefix =
      if (fsys.exists(new Path(vDir, CpMarker))) CpPrefix else "part-"
    fsys.listStatus(vDir).map(_.getPath)
      .filter(_.getName.startsWith(prefix)).toSeq
  }

  /** Retro-materialize delta version `v` into a checkpoint: fold its
    * state, land it as `cp-*` files inside the version dir, then drop
    * the marker. Append-only and crash-safe — until the marker exists
    * readers keep folding the untouched delta chain; stray `cp-*`
    * files from a crash are ignored. Single-maintenance-writer, like
    * every expire-side mutation. */
  private def materializeCheckpoint(spark: SparkSession, dir: String,
      v: Long): Unit = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vDir = vDirPath(mDir, v)
    if (!isDeltaVersion(fsys, vDir)) return
    val tmp = new Path(mDir, s".cpstage-${java.util.UUID.randomUUID()}")
    entriesAt(spark, dir, v).coalesce(1).write
      .mode("overwrite").parquet(tmp.toString)
    fsys.listStatus(tmp).map(_.getPath)
      .filter(_.getName.startsWith("part-")).foreach { p =>
        require(fsys.rename(p, new Path(vDir, CpPrefix + p.getName)),
          s"StatsManifest: checkpoint rename $p failed")
      }
    fsys.create(new Path(vDir, CpMarker), true).close()
    fsys.delete(tmp, true)
  }

  /** Force a full-checkpoint commit at latest+1 (entries unchanged) —
    * run before an aggressive [[expire]] when the retained window must
    * shrink below the distance to the last auto-checkpoint. */
  def checkpoint(spark: SparkSession, dir: String): Long = {
    val l = latestVersion(spark, dir).getOrElse(throw
      new IllegalStateException(
        s"StatsManifest.checkpoint: $dir is not a manifested table"))
    commitDelta(spark, dir, Nil, new StructType(), Set.empty,
      removedLatest(spark, dir), schemaLatest(spark, dir), Some(l),
      forceCheckpoint = true, op = Some("checkpoint"))
  }

  private def readDeltaDeletes(fsys: org.apache.hadoop.fs.FileSystem,
      vDir: Path): Set[String] = {
    val f = new Path(vDir, DeltaFile)
    val in = fsys.open(f)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toSet
    finally in.close()
  }

  /** The DELTA content of version `v`, when `v` committed as a delta:
    * (entries ADDED by v, entry keys DELETED by v). None for
    * checkpoint slots (callers fall back to a snapshot diff). Reading
    * it costs one parquet read of v's OWN part files — never a fold —
    * which is what lets a version-offset stream catch up over a long
    * backlog at O(delta) planning per version. Note the
    * invalidate-replace shape: an entry re-statted in place appears in
    * BOTH halves (its key in the deletes, its fresh entry in the
    * adds), so `adds -- deletes` equals the snapshot diff
    * `keysAt(v) -- keysAt(v-1)` for every committer in this file.
    * Valid for retro-materialized deltas too (the `cp-*` fold lands
    * BESIDE the delta content, which stays the truth of what v
    * changed). Loud when the version is gone (expired). */
  private[graft] def deltaOf(spark: SparkSession, dir: String,
      v: Long): Option[(Map[String, FileStats], Set[String])] = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vDir = vDirPath(mDir, v)
    if (!fsys.exists(vDir))
      throw new IllegalArgumentException(
        s"StatsManifest.deltaOf: version $v does not exist (expired?)")
    if (!fsys.exists(new Path(vDir, DeltaFile))) return None
    val parts = fsys.listStatus(vDir).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq
    val adds =
      if (parts.isEmpty) Map.empty[String, FileStats]
      else {
        val df = spark.read.parquet(parts.map(_.toString): _*)
        decodeRows(df.schema, df.collect())
      }
    Some((adds, readDeltaDeletes(fsys, vDir)))
  }

  /** Resolve the fold chain for version `v`: the nearest checkpoint at
    * or below it plus the delta versions above, ascending. Walk length
    * is bounded by the checkpoint interval (every interval-th version
    * commits full). Loud when the base checkpoint has been expired out
    * from under a retained delta (never happens through [[expire]],
    * which refuses to orphan a delta). */
  private def foldChain(spark: SparkSession, dir: String, v: Long)
      : (Seq[Path], Seq[(Long, Seq[Path], Set[String])]) = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var b = v
    while ({
      val d = vDirPath(mDir, b)
      if (b <= 0 || !fsys.exists(d))
        throw new IllegalStateException(
          s"StatsManifest: no base checkpoint at or below version $v " +
            s"under $mDir (expired or corrupt)")
      isDeltaVersion(fsys, d)
    }) b -= 1
    val baseParts = basePartsOf(fsys, vDirPath(mDir, b))
    val deltas = ((b + 1) to v).map { dv =>
      val dDir = vDirPath(mDir, dv)
      (dv,
        fsys.listStatus(dDir).map(_.getPath)
          .filter(_.getName.startsWith("part-")).toSeq,
        readDeltaDeletes(fsys, dDir))
    }
    (baseParts, deltas)
  }

  /** The folded manifest entries AT version `v`, as a DataFrame in the
    * stats schema. One distributed fold: base + delta part files read
    * in a single scan (version recovered from `_metadata.file_path`),
    * delete events unioned in, last event per file key wins (an add
    * beats a delete within one version — the invalidate-replace shape).
    * No O(files) driver collect anywhere on this path. */
  private[sources] def entriesAt(spark: SparkSession, dir: String,
      v: Long): DataFrame = {
    val (baseParts, deltas) = foldChain(spark, dir, v)
    if (deltas.isEmpty)
      return spark.read.parquet(baseParts.map(_.toString).toIndexedSeq: _*)
    foldEntries(spark,
      spark.read.parquet((baseParts ++ deltas.flatMap(_._2))
        .map(_.toString).toIndexedSeq: _*),
      deltas)
  }

  private def foldEntries(spark: SparkSession, parts: DataFrame,
      deltas: Seq[(Long, Seq[Path], Set[String])],
      keepVersion: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val entryCols = parts.schema.fieldNames
    val adds = parts
      .withColumn("__v", regexp_replace(col("_metadata.file_path"),
        "^.*/v(\\d{6})/[^/]*$", "$1").cast("long"))
      .withColumn("__isAdd", lit(true))
    val delRows = deltas.flatMap { case (dv, _, dels) =>
      dels.toSeq.map(k => org.apache.spark.sql.Row(k, dv, false))
    }
    val events =
      if (delRows.isEmpty) adds
      else adds.unionByName(
        spark.createDataFrame(
          spark.sparkContext.parallelize(delRows, 1),
          StructType(Seq(StructField("file", StringType),
            StructField("__v", LongType),
            StructField("__isAdd", BooleanType)))),
        allowMissingColumns = true)
    val w = Window.partitionBy(col("file"))
      .orderBy(col("__v").desc, col("__isAdd").desc)
    val folded = events
      .withColumn("__rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .where(col("__rn") === 1 && col("__isAdd"))
    val out =
      if (keepVersion)
        entryCols.map(col) :+ col("__v").as("version_entry")
      else entryCols.map(col)
    folded.select(out.toIndexedSeq: _*)
  }

  /** The folded entries at the LATEST version plus, per entry, the
    * manifest version whose dir holds it — a delta-chain entry reads
    * its actual commit slot; entries folded into a checkpoint read as
    * the checkpoint's slot (finer history expired with the deltas, so
    * the column is "added at or before"). The observability feed
    * behind the `graft_files` TVF; one distributed fold, no driver
    * row loop. */
  def entriesWithVersion(spark: SparkSession, dir: String): DataFrame = {
    val l = latestVersion(spark, dir).getOrElse(throw
      new IllegalStateException(
        s"entriesWithVersion: $dir is not a manifested table"))
    val (baseParts, deltas) = foldChain(spark, dir, l)
    val parts = spark.read.parquet(
      (baseParts ++ deltas.flatMap(_._2)).map(_.toString).toIndexedSeq: _*)
    if (deltas.isEmpty)
      parts.withColumn("version_entry",
        regexp_replace(col("_metadata.file_path"),
          "^.*/v(\\d{6})/[^/]*$", "$1").cast("long"))
    else foldEntries(spark, parts, deltas, keepVersion = true)
  }

  /** Just the folded entry KEYS at version `v` — a column-pruned fold
    * (only `file` reads from parquet), for key-set checks that must not
    * pull blooms and ranges to the driver. */
  private[graft] def keysAt(spark: SparkSession, dir: String,
      v: Long): Set[String] = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    vDirMtime(fsys, vDirPath(mDir, v))
      .flatMap(cacheGet(dir, v, _)) match {
      case Some(m) => return m.keySet
      case None => ()
    }
    val (baseParts, deltas) = foldChain(spark, dir, v)
    if (deltas.isEmpty)
      return spark.read
        .parquet(baseParts.map(_.toString).toIndexedSeq: _*)
        .select("file").collect().map(_.getString(0)).toSet
    // driver fold over keys only: base keys + per-delta add keys read
    // column-pruned; events replayed ascending
    val addKeys = spark.read
      .parquet((baseParts ++ deltas.flatMap(_._2))
        .map(_.toString).toIndexedSeq: _*)
      .select(col("file"),
        regexp_replace(col("_metadata.file_path"),
          "^.*/v(\\d{6})/[^/]*$", "$1").cast("long").as("__v"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val baseV = deltas.head._1 - 1
    val keys = scala.collection.mutable.Set.empty[String]
    keys ++= addKeys.filter(_._2 <= baseV).map(_._1)
    val addsByV = addKeys.filter(_._2 > baseV).groupBy(_._2)
    deltas.foreach { case (dv, _, dels) =>
      keys --= dels
      keys ++= addsByV.getOrElse(dv, Array.empty).map(_._1)
    }
    keys.toSet
  }

  /** The stats schema of the manifest at version `v` — a parquet footer
    * read of the base checkpoint (deltas share its schema by
    * construction; a stats-column change forces a full rebuild). No
    * Spark job, no row reads. */
  private def entrySchemaAt(spark: SparkSession, dir: String,
      v: Long): StructType = {
    val (baseParts, _) = foldChain(spark, dir, v)
    spark.read.parquet(baseParts.map(_.toString).toIndexedSeq: _*).schema
  }

  /** One manifest version's summary line for [[history]]. */
  final case class VersionInfo(version: Long, files: Long, rows: Long,
      committedAtMs: Long,
      /** operation kind from the `_op.txt` sidecar; "" on versions
        * committed before the sidecar existed. */
      op: String = "")

  /** The wall time version dir `vDir` COMMITTED at: the `_commit_ts`
    * sidecar (staged with the version — immutable, monotone by
    * construction), falling back to the dir's FS mtime for versions
    * committed before the sidecar existed. The fallback is the mtime's
    * one weakness: retro-materialization bumps an old dir's mtime to
    * vacuum time (see [[CommitTsFile]]). */
  private def commitTimeOf(fsys: org.apache.hadoop.fs.FileSystem,
      vDir: Path): Long = {
    val f = new Path(vDir, CommitTsFile)
    val sidecar =
      try {
        if (!fsys.exists(f)) None
        else {
          val in = fsys.open(f)
          Some((try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString.trim finally in.close()).toLong)
        }
      } catch { case _: Exception => None }
    sidecar.getOrElse(fsys.getFileStatus(vDir).getModificationTime)
  }

  /** (version, commit wall-time ms) per retained version, ascending —
    * the persisted `_commit_ts` sidecar (mtime fallback for pre-sidecar
    * versions). Metadata-only: no manifest parquet is read, so
    * timestamp resolution stays O(versions), never O(files). */
  def commitTimes(spark: SparkSession, dir: String): Seq[(Long, Long)] = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versions(spark, dir).map { v =>
      v -> commitTimeOf(fsys, new Path(mDir, f"v$v%06d"))
    }
  }

  /** The newest version committed at or before wall time `ms` — the
    * shared resolution behind SQL `TIMESTAMP AS OF` and the
    * `timestampAsOf` reader option, so both surfaces agree. */
  def versionAtMillis(spark: SparkSession, dir: String, ms: Long,
      tsText: String): Long = {
    val ts = commitTimes(spark, dir)
    ts.filter(_._2 <= ms).lastOption.map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"graft time travel: no retained version committed at or " +
          s"before $tsText (oldest retained: " +
          s"${ts.headOption.map(_._1).getOrElse(-1L)})"))
  }

  /** Parse a timestamp string in the SESSION time zone via Catalyst's
    * own Cast — the exact semantics SQL `TIMESTAMP AS OF '<ts>'` gets,
    * including offset forms (`…Z`, `…+02:00`, `…-05:00`) and bare
    * local timestamps. Loud on unparseable input. */
  def parseTsMillis(spark: SparkSession, ts: String): Long = {
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    Cast(Literal(UTF8String.fromString(ts), StringType), TimestampType,
      Some(zone)).eval() match {
      case l: java.lang.Long => Math.floorDiv(l.longValue(), 1000L)
      case _ => throw new IllegalArgumentException(
        s"graft time travel: cannot read '$ts' as a timestamp")
    }
  }

  /** DESCRIBE-HISTORY-style view of the committed versions, ascending:
    * per version the file count, total rows, and the commit's wall
    * time (persisted `_commit_ts`; mtime fallback for pre-sidecar
    * versions). Driver-side O(versions) manifest reads. */
  def history(spark: SparkSession, dir: String): Seq[VersionInfo] = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versions(spark, dir).map { v =>
      val stats = readAt(spark, dir, v)
      VersionInfo(v, stats.size.toLong, stats.valuesIterator.map(_.rows).sum,
        commitTimeOf(fsys, new Path(mDir, f"v$v%06d")),
        opAt(spark, dir, v).getOrElse(""))
    }
  }

  /** Drop all but the newest `keep` versions; returns how many were
    * deleted. Snapshots at expired versions become unreadable — run on
    * the retention cadence the deployment's time-travel window needs.
    *
    * Also the VACUUM half of row-level ops: a file TOMBSTONED as of the
    * oldest RETAINED version is referenced by no retained manifest
    * (removal is monotone — a removed key is never re-added), so its
    * bytes are physically reclaimed here. Until then the bytes stay for
    * snapshot and CDC reads. */
  def expire(spark: SparkSession, dir: String, keep: Int,
      /** retention for the precomputed CDC change files, in versions;
        * negative = follow `keep`. A [[RowOps.changesStream]] consumer
        * discovers change files at its OWN cadence — deleting them on
        * the manifest's (often tight) snapshot-retention schedule
        * silently drops changes a lagging subscriber has not seen yet,
        * so a streaming-fed table should keep the CDC window several
        * multiples of the consumer's worst-case lag. The files are
        * O(changes), not O(table): a longer window is cheap. */
      cdcVersionsToKeep: Int = -1,
      /** a DELTA version folds onto its base checkpoint, so dropping
        * must not orphan a retained delta. `exact = true` (default —
        * the vacuum-now semantics) retro-materializes the boundary
        * delta into a checkpoint (one fold) and then drops precisely
        * `versions − keep`; `exact = false` drops lazily — only below
        * the newest checkpoint at or below the boundary, retaining
        * `keep` to `keep + interval − 1` versions at zero fold cost
        * (the right mode for a per-micro-batch streaming sink, where
        * the auto-checkpoint cadence alone bounds the window). */
      exact: Boolean = true): Int = {
    require(keep >= 1, s"expire: keep=$keep")
    val cdcKeep =
      if (cdcVersionsToKeep < 0) keep else math.max(keep, cdcVersionsToKeep)
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versions(spark, dir)
    val dropReq = vs.dropRight(keep)
    val drop =
      if (dropReq.isEmpty) dropReq
      else {
        val boundary = vs(dropReq.length) // oldest version to keep
        if (exact) {
          materializeCheckpoint(spark, dir, boundary)
          dropReq
        } else
          vs.filter(_ <= boundary).reverse
            .find(v => !isDeltaVersion(fsys, vDirPath(mDir, v))) match {
            case Some(cp) => vs.filter(_ < cp)
            case None => Seq.empty // no checkpoint at/below: keep all
          }
      }
    drop.foreach { v =>
      fsys.delete(new Path(mDir, f"v$v%06d"), true)
    }
    // change files live on their own retention window (decoupled from
    // snapshot retention — they may outlive their manifest version)
    vs.dropRight(cdcKeep).foreach { v =>
      RowOps.cdcFiles(fsys, dir, v).foreach(fsys.delete(_, false))
    }
    vs.drop(drop.length).headOption.foreach { oldest =>
      removedAt(spark, dir, oldest).foreach { k =>
        val p = new Path(k)
        if (fsys.exists(p)) fsys.delete(p, false)
      }
    }
    drop.length
  }

  /** Reclaim crashed-compaction orphans: `ac-*` data files that NO
    * retained manifest version names and no tombstone retains.
    * [[graft.operators.Layout.autoCompact]] renames its packed files
    * into place BEFORE committing (so a crash never leaves the live
    * manifest naming absent files); the flip side is that a hard crash
    * between the renames and the commit leaves unmanifested `ac-*`
    * files in the table dir. They are invisible to manifest-routed
    * readers and refused by [[update]]/[[write]] reconciliation, so the
    * only cost is bytes — reclaimed here on the VACUUM cadence. Files
    * younger than `minAgeMs` are spared: a LIVE concurrent compactor
    * sits in exactly this state between its renames and its commit.
    * Returns the number of files deleted. */
  def vacuumOrphans(spark: SparkSession, dir: String,
      minAgeMs: Long = 600000L): Int = {
    val dirPath = new Path(dir)
    val fsys = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versions(spark, dir)
    if (vs.isEmpty) return 0
    val candidates = listDataFiles(fsys, dirPath)
      .filter(_.getName.startsWith("ac-"))
    if (candidates.isEmpty) return 0
    val named = vs.iterator.flatMap { v =>
      try keysAt(spark, dir, v).iterator
      catch { case _: Exception => Iterator.empty } // expired mid-walk
    }.toSet ++ removedLatest(spark, dir)
    val cutoff = System.currentTimeMillis() - minAgeMs
    candidates.iterator
      .filter(p => !named.contains(fileKey(p)))
      .filter(p =>
        try fsys.getFileStatus(p).getModificationTime <= cutoff
        catch { case _: Exception => false })
      .count(p => fsys.delete(p, false))
  }

  /** Every data file under `dir`, recursively (Hive-partitioned layouts
    * keep data under `p=…` dirs); anything under a hidden (`_`/`.`)
    * component is metadata, not data — and those subtrees are PRUNED
    * from the walk, not just filtered (a long version log must not be
    * traversed by every reconciliation).
    *
    * listStatus walk, NOT `fs.listFiles(dir, recursive)`: the recursive
    * iterator materializes a LocatedFileStatus per file, which on the
    * local FileSystem forces a permission load that SHELLS OUT once per
    * file — an O(files) fork-exec per commit (measured: ~25 ms × files,
    * the dominant cost of a streaming sink's reconciliation on a local
    * table). listStatus never touches permissions; on HDFS/S3A the RPC
    * count is the same one-listing-per-directory either way. */
  private[sources] def listDataFiles(
      fsys: org.apache.hadoop.fs.FileSystem,
      dirPath: Path): Array[Path] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    def hidden(name: String): Boolean =
      name.startsWith("_") || name.startsWith(".")
    def walk(d: Path): Unit =
      fsys.listStatus(d).foreach { st =>
        if (!hidden(st.getPath.getName)) {
          if (st.isDirectory) walk(st.getPath)
          else out += st.getPath
        }
      }
    if (fsys.exists(dirPath)) walk(dirPath)
    out.toArray
  }

  // ---------------------------------------------------------------- //
  //  Column mapping: logical → physical names (RENAME COLUMN)          //
  // ---------------------------------------------------------------- //

  /** RENAME COLUMN is metadata-only: the parquet bytes keep the
    * column's BIRTH name forever (the "physical" name, recorded in the
    * field's metadata under this key), the schema sidecar carries the
    * current LOGICAL name, and every reader/writer maps at the
    * parquet boundary — the Delta/Iceberg column-mapping idea on plain
    * parquet. Manifest stats stay keyed by LOGICAL name (the rename
    * commit rewrites the entry column names once, O(manifest)), so
    * pruning, metadata-only aggregates and the streaming pushdown are
    * rename-oblivious. */
  private[graft] val PhysicalKey = "graft.physical"

  /** logical → physical map of `schema` (only diverging fields). */
  def nameMapOf(schema: StructType): Map[String, String] =
    schema.fields.iterator.flatMap { f =>
      if (f.metadata.contains(PhysicalKey)) {
        val p = f.metadata.getString(PhysicalKey)
        if (p != f.name) Some(f.name -> p) else None
      } else None
    }.toMap

  /** The physical (on-disk) name of logical column `name`. */
  def physicalName(schema: StructType, name: String): String =
    nameMapOf(schema).getOrElse(name, name)

  /** `schema` with every field renamed to its physical name — what the
    * parquet bytes actually carry. */
  def toPhysical(schema: StructType): StructType = {
    val m = nameMapOf(schema)
    if (m.isEmpty) schema
    else StructType(schema.map(f =>
      f.copy(name = m.getOrElse(f.name, f.name))))
  }

  /** Read parquet `paths` (physical names on disk) and expose LOGICAL
    * names — the helper every internal raw read of a mapped table's
    * data files goes through. Loses `_metadata` (the rename projection
    * drops it); stats scans, which need the file key, use
    * [[statsAggs]]' own name mapping instead. */
  private[graft] def readLogical(spark: SparkSession, dir: String,
      schema: StructType, paths: Seq[String]): DataFrame = {
    val m = nameMapOf(schema)
    val raw = spark.read.option("basePath", dir)
      .schema(toPhysical(schema)).parquet(paths: _*)
    if (m.isEmpty) raw
    else raw.select(schema.map(f =>
      col(m.getOrElse(f.name, f.name)).as(f.name)).toIndexedSeq: _*)
  }

  /** `df` (logical names) renamed to physical for a data-file write. */
  private[graft] def writePhysical(df: DataFrame,
      schema: StructType): DataFrame =
    writePhysicalMap(df, nameMapOf(schema))

  private[graft] def writePhysicalMap(df: DataFrame,
      m: Map[String, String]): DataFrame =
    if (m.isEmpty) df
    else df.select(df.columns.toSeq.map(c =>
      col(c).as(m.getOrElse(c, c))): _*)

  /** The logical→physical map of the table's CURRENT sidecar schema —
    * empty for never-renamed tables (and for sidecar-less layouts, at
    * zero inference cost). */
  def tableNameMap(spark: SparkSession, dir: String): Map[String, String] =
    schemaLatest(spark, dir).map(nameMapOf).getOrElse(Map.empty)

  /** Columns of `schema` with an order-exact stats domain — the default
    * stats configuration for a table created without one. */
  def statsEligible(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if domOf(f.dataType).isDefined => f.name
    }

  /** Table-level properties sidecar (`_graft_manifest/_table.props`):
    * partition columns (which an EMPTY table cannot infer from its
    * layout) and anything else create-time config wants to survive.
    * Plain `k=v` lines; absent file = empty map. */
  private val TablePropsFile = "_table.props"

  def writeTableProps(spark: SparkSession, dir: String,
      props: Map[String, String]): Unit = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.mkdirs(mDir)
    val out = fsys.create(new Path(mDir, TablePropsFile), true)
    try out.write(props.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Per-TABLE policy lookup (r13): a 100 TB deployment tunes
    * compaction/retention/cadence per table, not per session — so a
    * policy key resolves table property (`_table.props`, set at CREATE
    * TABLE TBLPROPERTIES or ALTER TABLE SET TBLPROPERTIES) first,
    * session conf `spark.graft.<key>` second, the engine default last.
    * Keys: `autoCompact.minFiles`, `autoCompact.targetBytes`,
    * `manifest.checkpointInterval`, `retention.versions`,
    * `retention.cdcVersions` (the last two override the sink
    * parameters when present). One tiny sidecar read per lookup —
    * callers on a per-commit path batch their lookups through
    * [[tableProps]] once. */
  def tablePolicy(spark: SparkSession, dir: String, key: String,
      default: String): String =
    tableProps(spark, dir).getOrElse(key,
      spark.conf.get("spark.graft." + key, default))

  def tableProps(spark: SparkSession, dir: String): Map[String, String] = {
    val f = new Path(new Path(dir, ManifestDir), TablePropsFile)
    val fsys = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsys.exists(f)) Map.empty
    else {
      val in = fsys.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) if k.nonEmpty => Some(k -> v)
            case _ => None
          }
        }.toMap
      finally in.close()
    }
  }

  /** The table's partition columns: the create-time sidecar when
    * present (an empty table has no layout to infer from), else
    * directory-layout inference. */
  def tablePartitionCols(spark: SparkSession, dir: String): Seq[String] =
    tableProps(spark, dir).get("partitionCols") match {
      case Some(cs) => cs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => scanWithIndex(spark, dir)._2
        .partitionSchema.fieldNames.toSeq
    }

  /** The manifest entry schema [[statsAggs]] would produce for this
    * configuration — built WITHOUT data, for committing an EMPTY table
    * (CREATE TABLE before any INSERT): one 0-row checkpoint in exactly
    * the schema later incremental updates expect. */
  private def emptyEntrySchema(schema: StructType, statsCols: Seq[String],
      bloomCols: Seq[String]): StructType = {
    val kept = statsCols.filter(c => domOf(schema(c).dataType).isDefined)
    val cntCols = (kept ++ bloomCols).distinct
    val ranges = kept.flatMap { c =>
      val (tag, dt) = domOf(schema(c).dataType).get match {
        case 'L' => ("l", LongType: DataType)
        case 'D' => ("d", DoubleType: DataType)
        case 'S' => ("s", StringType: DataType)
      }
      Seq(StructField(s"${tag}min__$c", dt), StructField(s"${tag}max__$c", dt))
    }
    val sums = kept.filter(c => sumable(schema(c).dataType))
      .map(c => StructField(s"sum__$c", LongType))
    val cnts = cntCols.map(c => StructField(s"cnt__$c", LongType))
    val blooms = bloomCols.map(c => StructField(s"bloom__$c", BinaryType))
    StructType(
      StructField("file", StringType) +: StructField("rows", LongType) +:
        StructField("flen", LongType) +: (ranges ++ sums ++ cnts ++ blooms))
  }

  /** CREATE a manifested table with no data yet: a 0-entry checkpoint
    * version carrying the authoritative schema sidecar and create-time
    * table props. The first INSERT reconciles incrementally like any
    * append — the entry schema here matches [[statsAggs]]' exactly. */
  def createEmpty(spark: SparkSession, dir: String, schema: StructType,
      statsCols: Seq[String], bloomCols: Seq[String] = Nil,
      partitionCols: Seq[String] = Nil,
      /** arbitrary create-time table properties (policy keys like
        * `autoCompact.minFiles` — [[tablePolicy]]); the reserved
        * layout keys below always win. */
      extraProps: Map[String, String] = Map.empty): Long = {
    val missing = (statsCols ++ bloomCols ++ partitionCols)
      .filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"createEmpty: columns not in the schema: ${missing.mkString(", ")}")
    require(statsCols.nonEmpty || bloomCols.nonEmpty,
      "createEmpty: a manifested table needs at least one stats or " +
        "bloom column")
    val dirPath = new Path(dir)
    val fsys = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.mkdirs(dirPath)
    writeTableProps(spark, dir, extraProps ++ Map(
      "partitionCols" -> partitionCols.mkString(","),
      "statsCols" -> statsCols.mkString(","),
      "bloomCols" -> bloomCols.mkString(",")))
    // repartition(1), not coalesce: an emptyRDD has ZERO partitions and
    // coalesce keeps it that way — zero tasks would write zero part
    // files, and a checkpoint version must hold its (empty) entry file
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      emptyEntrySchema(schema, statsCols, bloomCols)).repartition(1)
    commitVersion(spark, dir, empty, Set.empty, Some(schema), None,
      op = Some("create"))
  }

  def write(spark: SparkSession, dir: String, statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 16): Unit = {
    val dirPath = new Path(dir)
    val fsys = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an evolved schema (sidecar) is authoritative over footer
    // inference; the scan itself reads the PHYSICAL names the bytes
    // carry (statsAggs keys the output by logical name)
    val sidecar = schemaLatest(spark, dir)
    val logical = sidecar.getOrElse(spark.read.parquet(dir).schema)
    val full = spark.read.schema(toPhysical(logical)).parquet(dir)
    // tombstoned files are dead rows: a full rebuild must not resurrect
    // them. Trim the carried set to files still physically present.
    val removed = removedLatest(spark, dir)
    lazy val listed = listDataFiles(fsys, dirPath)
    // an `ac-*` file absent from the current manifest is a crashed
    // auto-compaction's orphan (rename-first protocol) — its rows still
    // live in the originals; a rebuild must not adopt it either
    val orphans: Set[String] = {
      val live =
        try latestVersion(spark, dir)
          .map(l => keysAt(spark, dir, l)).getOrElse(Set.empty[String])
        catch { case _: Exception => Set.empty[String] }
      if (live.isEmpty) Set.empty
      else listed.iterator.map(fileKey).filter(k =>
        new Path(k).getName.startsWith("ac-") && !live.contains(k) &&
          !removed.contains(k)).toSet
    }
    val df =
      if (removed.isEmpty && orphans.isEmpty) full
      else {
        val dead = removed ++ orphans
        val live = listed.filterNot(p => dead.contains(fileKey(p)))
        spark.read.option("basePath", dir).schema(full.schema)
          .parquet(live.map(_.toString).toIndexedSeq: _*)
      }
    val removedTrim =
      if (removed.isEmpty) removed
      else removed intersect listed.map(fileKey).toSet
    val aggs = statsAggs(logical, statsCols, bloomCols, bloomBits)
    commitVersion(spark, dir,
      df.groupBy(fileKeyCol).agg(aggs.head, aggs.tail: _*), removedTrim,
      sidecar, op = Some("overwrite"))
    ()
  }

  /** Result of an incremental [[update]]: how many file entries were
    * reused from the existing manifest, freshly scanned, and dropped
    * (their files vanished — compaction or overwrite). */
  final case class UpdateResult(reused: Long, scanned: Long, dropped: Long)

  /** Incrementally reconcile the manifest with the CURRENT contents of
    * `dir`: stats are computed ONLY for data files the manifest doesn't
    * cover (one column-pruned scan restricted to those paths), entries
    * whose file vanished are dropped, everything else is carried over
    * without touching its file. At 100 TB this is the difference between
    * "appending a partition costs a scan of the appended files" and
    * "every append rescans the corpus" — the same incremental-commit
    * shape a lakehouse transaction log gives. Falls back to a full
    * [[write]] when `statsCols` doesn't match the existing manifest's
    * column set (stats for a new column can't be synthesized). Run in
    * the same maintenance window as any manifest write: the overwrite
    * briefly unlists the old manifest.
    *
    * `invalidate`: path keys ([[fileKey]]) whose manifest entries must
    * NOT be reused even though their file still exists — the ingest
    * sink passes the files a replayed micro-batch just REWROTE, whose
    * content (hence stats) may differ from the failed attempt's under
    * the same deterministic name. Stale stats are the one way a
    * conservative pruner goes wrong, so replacement is forced here. */
  def update(spark: SparkSession, dir: String, statsCols: Seq[String],
      invalidate: Set[String] = Set.empty, bloomCols: Seq[String] = Nil,
      bloomBits: Int = 1 << 16,
      /** operation kind for the version sidecar — reconciliation
        * commits are appends unless the caller says otherwise (e.g.
        * a physical compaction's final reconcile). */
      op: String = "append"): UpdateResult = {
    val dirPath = new Path(dir)
    val fsys = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // tombstoned files are dead rows physically retained for snapshots:
    // reconciliation must treat them as nonexistent, or a row-level
    // delete would be silently undone by the next append's update
    val listed = listDataFiles(fsys, dirPath)
    val removed = removedLatest(spark, dir)
    val removedTrim = removed intersect listed.map(fileKey).toSet
    val dataFiles = listed.filterNot(p => removedTrim.contains(fileKey(p)))
    val mDir = new Path(dir, ManifestDir)
    val latest = latestVersion(spark, dir)
    // existing entry keys + stats schema — key-only fold (never the
    // bloom-heavy full rows) or the legacy unversioned parts. An
    // UNREADABLE latest (a foreign/garbage version dir squatting on a
    // slot) degrades to a full rebuild, which self-heals by committing
    // past it — reconciliation must never be wedged by junk.
    val existing: Option[(Set[String], StructType)] =
      try latest match {
        case Some(l) => Some((keysAt(spark, dir, l),
          entrySchemaAt(spark, dir, l)))
        case None => legacyParts(fsys, mDir).map { parts =>
          val lp = spark.read
            .parquet(parts.map(_.toString).toIndexedSeq: _*)
          (lp.select("file").collect().map(_.getString(0)).toSet, lp.schema)
        }
      } catch { case _: Exception => None }
    if (existing.isEmpty) {
      write(spark, dir, statsCols, bloomCols, bloomBits)
      return UpdateResult(0L, dataFiles.length.toLong, 0L)
    }
    val (coveredAll, entrySchema) = existing.get
    val sidecar = schemaLatest(spark, dir)
    val logical = sidecar.getOrElse(spark.read.parquet(dir).schema)
    if (entrySchema.fieldNames.toSet !=
        expectedCols(logical, statsCols, bloomCols)) {
      // column set changed → the old entries can't be reused
      write(spark, dir, statsCols, bloomCols, bloomBits)
      return UpdateResult(0L, dataFiles.length.toLong, 0L)
    }
    val liveKeys = dataFiles.map(fileKey).toSet
    // invalidated entries are treated as never-covered: the delta
    // deletes them, the scan below recomputes them from the rewritten
    // bytes (an add with the same key replaces within one version)
    val coveredKeys = coveredAll -- invalidate
    // an UNMANIFESTED `ac-*` file is a crashed auto-compaction's orphan
    // (or a concurrent compactor mid-swap: it renames in BEFORE its
    // commit — Layout.autoCompact). Its rows still live in the original
    // small files, so adopting it would duplicate them; skip — VACUUM
    // reclaims true orphans (vacuumOrphans)
    val newPaths = dataFiles.filter(p =>
      !coveredKeys.contains(fileKey(p)) &&
        !(p.getName.startsWith("ac-") && !coveredAll.contains(fileKey(p))))
    // the DELTA: entries whose file vanished (or was invalidated)
    // leave; fresh stats for uncovered files enter — O(delta), never a
    // rewrite of the carried set (the checkpoint cadence amortizes the
    // fold; a per-micro-batch streaming sink commits flat forever)
    val deletes = (coveredAll -- liveKeys) ++ (invalidate intersect coveredAll)
    val fresh =
      if (newPaths.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else {
        // basePath keeps Hive-partition columns derivable from the paths
        // even though only the NEW files are listed explicitly; the
        // read uses the bytes' PHYSICAL names, the aggs key logical
        val nd = spark.read.option("basePath", dir)
          .schema(toPhysical(logical))
          .parquet(newPaths.map(_.toString).toIndexedSeq: _*)
        val aggs = statsAggs(logical, statsCols, bloomCols, bloomBits)
        // align fresh columns to the stored order (a caller may pass
        // statsCols in a different order than the original write)
        nd.groupBy(fileKeyCol).agg(aggs.head, aggs.tail: _*)
          .select(entrySchema.fieldNames.map(col).toIndexedSeq: _*)
          .collect()
      }
    commitDelta(spark, dir, fresh.toIndexedSeq, entrySchema, deletes,
      removedTrim, sidecar, expected = None, op = Some(op))
    UpdateResult(
      reused = (coveredKeys intersect liveKeys).size.toLong,
      scanned = newPaths.length.toLong,
      dropped = (coveredKeys -- liveKeys).size.toLong)
  }

  /** Result of [[commitFileOps]]: the committed version, total rows
    * across the committed added files, and the final keys the commit
    * actually RECORDED. An EMPTY staged file (a rewrite whose
    * replacement had no rows for that output slot) produces no stats
    * row and is NOT committed — callers must rename in exactly
    * `addKeys`' files and discard the rest with the staging dir, or
    * the table accumulates orphan unmanifested empty files. */
  final case class FileOpsCommit(version: Long, addedRows: Long,
      addKeys: Set[String])

  /** Commit a ROW-LEVEL file operation ([[RowOps]]): tombstone
    * `removeKeys` and add `adds` — each a (staged file, final file key)
    * pair, where the staged file holds the bytes that will live at the
    * final key after the caller renames it in. Stats for the added
    * files are computed from the staged bytes in one pruned scan and
    * recorded under the FINAL keys, so the committed version is
    * consistent the instant the renames land; everything else carries
    * over driver-side, O(files) like [[update]].
    *
    * Called BEFORE the renames: a latest-reader between commit and
    * rename resolves the new version, whose added files aren't listed
    * yet — transiently short rows, never duplicates (the tombstoned
    * files are denied from the same instant). Crash recovery is
    * loss-free and mechanical: staged bytes exist in full, and the
    * committed manifest names exactly the final keys still missing —
    * finish the renames (re-run the op's rename loop) or expire the
    * version. Same maintenance-window contract as `Layout.optimize`. */
  def commitFileOps(spark: SparkSession, dir: String,
      adds: Seq[(Path, String)], removeKeys: Set[String],
      statsCols: Seq[String], bloomCols: Seq[String] = Nil,
      bloomBits: Int = 1 << 16,
      /** optimistic concurrency: the version the caller ANALYZED. When
        * a racer commits in between, the op REBASES (up to `maxRebase`
        * times) if the interim commits are provably disjoint — none of
        * them removed or rewrote a file this op touches, the schema is
        * unchanged, and (when `conflictIfInterimAdds`) none added files
        * — rebuilding the carried manifest on the new latest and
        * retrying; a true conflict aborts with
        * ConcurrentModificationException. None skips the check AND the
        * rebase machinery (reconciliation commits). */
      expectedVersion: Option[Long] = None,
      /** basePath for reading the staged files when they live under
        * Hive-partition subdirs of a staging root — partition columns
        * derive from the staged paths exactly as they will from the
        * final ones. */
      addsBasePath: Option[String] = None,
      /** treat ANY interim-added file as a conflict. Ops whose write
        * set depends on which KEYS exist (upsert/merge insert
        * determination) must set this: a racer's append may introduce
        * the very keys this op decided to insert, and file-level
        * disjointness cannot see that. Predicate ops (delete/update)
        * tolerate blind appends — the op serializes BEFORE the append
        * (write-serializable semantics, the lakehouse convention). */
      conflictIfInterimAdds: Boolean = false,
      maxRebase: Int = 3,
      /** operation kind recorded in the version's `_op.txt` sidecar
        * (DESCRIBE HISTORY; CDC-stream maintenance detection). */
      op: Option[String] = None): FileOpsCommit = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def conflict(why: String): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"commitFileOps: $why — re-run the operation against the " +
          "new latest version")

    /** Interim commits (analyzed, latest] are disjoint from this op —
      * or abort. Returns unit; every non-disjoint shape throws. */
    def checkDisjoint(analyzedV: Long, latestV: Long): Unit = {
      val filesAtAnalyzed =
        try keysAt(spark, dir, analyzedV)
        catch { case _: Exception => conflict(
          s"analyzed version $analyzedV is no longer retained " +
            "(vacuumed during the op)") }
      val filesAtLatest = keysAt(spark, dir, latestV)
      val removedInterim =
        removedAt(spark, dir, latestV) -- removedAt(spark, dir, analyzedV)
      val hit = removeKeys intersect removedInterim
      if (hit.nonEmpty) conflict(
        s"a concurrent commit removed ${hit.size} file(s) this op " +
          s"rewrites (e.g. ${hit.head})")
      val gone = removeKeys -- filesAtLatest
      if (gone.nonEmpty) conflict(
        s"${gone.size} file(s) this op rewrites are no longer in the " +
          s"latest manifest (e.g. ${gone.head})")
      if (conflictIfInterimAdds) {
        val added = filesAtLatest -- filesAtAnalyzed
        if (added.nonEmpty) conflict(
          s"a concurrent commit added ${added.size} file(s) and this " +
            "op's write set depends on which keys exist " +
            s"(e.g. ${added.head})")
      }
      if (schemaAt(spark, dir, analyzedV) != schemaAt(spark, dir, latestV))
        conflict("a concurrent commit changed the table schema")
    }

    val latest0 = latestVersion(spark, dir).getOrElse(throw
      new IllegalStateException(
        s"commitFileOps: $dir is not a manifested table"))
    val entrySchema = entrySchemaAt(spark, dir, latest0)
    val sidecar = schemaLatest(spark, dir)
    val schema = sidecar.getOrElse(spark.read.parquet(dir).schema)
    require(entrySchema.fieldNames.toSet ==
      expectedCols(schema, statsCols, bloomCols),
      "commitFileOps: statsCols/bloomCols don't match the existing " +
        "manifest's column set — rebuild with write() first")
    val fileIdx = entrySchema.fieldIndex("file")
    val (freshRows, addedRows) =
      if (adds.isEmpty) (Array.empty[org.apache.spark.sql.Row], 0L)
      else {
        // an EMPTY staged file yields no group below → no stats row →
        // not committed; FileOpsCommit.addKeys tells the caller to
        // leave it in staging (renaming it in would orphan it)
        // staged bytes carry PHYSICAL names (writers map before the
        // stage write); the aggs key the stats by logical name
        val reader0 = spark.read.schema(toPhysical(schema))
        val staged = addsBasePath.fold(reader0)(
          b => reader0.option("basePath", b))
          .parquet(adds.map(_._1.toString).toIndexedSeq: _*)
        val aggs = statsAggs(schema, statsCols, bloomCols, bloomBits)
        val fresh = staged.groupBy(fileKeyCol).agg(aggs.head, aggs.tail: _*)
          .select(entrySchema.fieldNames.map(col).toIndexedSeq: _*)
          .collect()
        // re-key staged paths to the final keys the caller will rename to
        val finalKey = adds.map { case (p, k) => fileKey(p) -> k }.toMap
        val rowsIdx = entrySchema.fieldIndex("rows")
        val rekeyed = fresh.map { r =>
          val vals = r.toSeq.toArray
          vals(fileIdx) = finalKey.getOrElse(r.getString(fileIdx),
            throw new IllegalStateException(
              s"commitFileOps: staged file ${r.getString(fileIdx)} has no " +
                "final-key mapping"))
          org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq)
        }
        (rekeyed, fresh.map(_.getLong(rowsIdx)).sum)
      }
    // rebase loop: the commit is a pure DELTA (fresh adds + tombstoned
    // keys), so a disjoint racer's adds and tombstones carry through BY
    // CONSTRUCTION — nothing is re-materialized per attempt; the fresh
    // stats derive from the staged bytes only and never change
    var attempts = 0
    while (true) {
      val latestV = latestVersion(spark, dir)
      (expectedVersion, latestV) match {
        case (Some(a), Some(l)) if a != l => checkDisjoint(a, l)
        case _ => ()
      }
      val removed = removedLatest(spark, dir) ++ removeKeys
      try {
        return FileOpsCommit(commitDelta(spark, dir, freshRows.toIndexedSeq,
          entrySchema, removeKeys, removed, sidecar,
          if (expectedVersion.isDefined) latestV else None,
          op = op), addedRows,
          freshRows.map(_.getString(fileIdx)).toSet)
      } catch {
        case cme: java.util.ConcurrentModificationException =>
          attempts += 1
          if (attempts > maxRebase) throw cme
        // loop: the next pass re-reads the latest and re-checks
        // disjointness against the ORIGINAL analyzed version
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Reconstruct the (statsCols, bloomCols) a manifest was built with —
    * lets SQL DML commands run against any manifested table without the
    * caller restating the stats configuration. Schema-only (parquet
    * footer of the base checkpoint): the column NAMES encode the
    * configuration — `?min__c` ⟹ stats column, `bloom__c` ⟹ bloom
    * column — so no manifest row ever reads. */
  def manifestColumns(spark: SparkSession,
      dir: String): (Seq[String], Seq[String]) = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = latestVersion(spark, dir) match {
      case Some(l) => entrySchemaAt(spark, dir, l)
      case None => legacyParts(fsys, mDir) match {
        case Some(parts) => spark.read
          .parquet(parts.map(_.toString).toIndexedSeq: _*).schema
        case None => throw new IllegalStateException(
          s"StatsManifest.manifestColumns: no manifest under $mDir")
      }
    }
    val names = schema.fieldNames
    val stats = names.collect {
      case n if n.startsWith("lmin__") => n.stripPrefix("lmin__")
      case n if n.startsWith("dmin__") => n.stripPrefix("dmin__")
      case n if n.startsWith("smin__") => n.stripPrefix("smin__")
    }
    val blooms = names.collect {
      case n if n.startsWith("bloom__") => n.stripPrefix("bloom__")
    }
    (stats.toSeq.sorted, blooms.toSeq.sorted)
  }

  /** Driver-side manifest read: file name → stats, at the LATEST
    * version (fold of its base checkpoint + delta chain) or the legacy
    * unversioned layout. */
  def read(spark: SparkSession, dir: String): Map[String, FileStats] = {
    val mDir = new Path(dir, ManifestDir)
    val fsys = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    latestVersion(spark, dir) match {
      case Some(l) => readAt(spark, dir, l)
      case None =>
        val parts = legacyParts(fsys, mDir).getOrElse(
          throw new IllegalStateException(
            s"StatsManifest.read: no manifest under $mDir"))
        val m = spark.read.parquet(parts.map(_.toString).toIndexedSeq: _*)
        decodeRows(m.schema, m.collect())
    }
  }

  // ---------------------------------------------------------------- //
  //  Snapshot cache: (dir, version) → decoded stats                    //
  // ---------------------------------------------------------------- //

  /** Version dirs are IMMUTABLE once claimed, so caching a decoded
    * snapshot is always sound; a committer even knows the NEXT state
    * without reading (previous cached state ± its own delta — see
    * [[commitDelta]]), which makes a per-micro-batch writer's re-open
    * a pure memory hit instead of a fold job per batch. Existence is
    * still checked per read (one RPC), so an EXPIRED version errors
    * exactly as before instead of serving stale cache. Bounded LRU —
    * a handful of recent snapshots per driver. */
  private val snapshotCache =
    new java.util.LinkedHashMap[(String, Long),
      (Long, Map[String, FileStats])](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long),
            (Long, Map[String, FileStats])]): Boolean = size() > 8
    }

  /** The version dir's mtime IS its incarnation id: the atomic rename
    * sets it once and the dir never mutates — but a table DESTROYED and
    * recreated at the same path (df.write.overwrite wipes the manifest
    * too) mints a brand-new v000001 whose cached ancestor would be a
    * different table. Every cache read validates against the live
    * mtime; the same getFileStatus doubles as the expired-version
    * check, so this costs no extra RPC. */
  private def vDirMtime(fsys: org.apache.hadoop.fs.FileSystem,
      vDir: Path): Option[Long] =
    try Some(fsys.getFileStatus(vDir).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  private def cacheGet(dir: String, v: Long,
      mtime: Long): Option[Map[String, FileStats]] =
    snapshotCache.synchronized(
      Option(snapshotCache.get((dir, v))).collect {
        case (t, m) if t == mtime => m
      })
  private[sources] def cachePut(dir: String, v: Long, mtime: Long,
      m: Map[String, FileStats]): Unit =
    snapshotCache.synchronized {
      snapshotCache.put((dir, v), (mtime, m))
      ()
    }

  /** The manifest exactly as version `v` committed it — the stats (and
    * file set) of a historical snapshot. */
  def readAt(spark: SparkSession, dir: String,
      version: Long): Map[String, FileStats] = {
    val vDir = new Path(new Path(dir, ManifestDir), f"v$version%06d")
    val fsys = vDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mtime = vDirMtime(fsys, vDir).getOrElse(throw
      new IllegalArgumentException(
        s"StatsManifest.readAt: version $version does not exist " +
          "(expired?)"))
    cacheGet(dir, version, mtime).getOrElse {
      val df = entriesAt(spark, dir, version)
      val m = decodeRows(df.schema, df.collect())
      cachePut(dir, version, mtime, m)
      m
    }
  }

  /** Manifest rows → stats map. Field access is by SCHEMA index, not
    * row-attached schema — callers also decode bare `Row.fromSeq` rows
    * (the committer's derived-state path). */
  private def decodeRows(schema: StructType,
      rows: Array[org.apache.spark.sql.Row]): Map[String, FileStats] = {
    val fields = schema.fieldNames.toSet
    def ix(n: String): Int = schema.fieldIndex(n)
    // every stats/bloom column carries a cnt__; the domain is whichever
    // range pair exists for it ('B' = bloom-only, no range kept)
    val statCols = schema.fieldNames.collect {
      case f if f.startsWith("cnt__") =>
        val c = f.stripPrefix("cnt__")
        val dom =
          if (fields(s"lmin__$c")) 'L'
          else if (fields(s"dmin__$c")) 'D'
          else if (fields(s"smin__$c")) 'S'
          else 'B'
        (c, dom)
    }
    rows.map { r =>
      val file = r.getString(ix("file"))
      val nRows = r.getLong(ix("rows"))
      val flen =
        if (fields("flen") && !r.isNullAt(ix("flen")))
          r.getLong(ix("flen"))
        else -1L
      val cols = statCols.map { case (c, dom) =>
        val nn = r.getLong(ix(s"cnt__$c"))
        val bloom =
          if (fields(s"bloom__$c") && !r.isNullAt(ix(s"bloom__$c")))
            r.getAs[Array[Byte]](ix(s"bloom__$c"))
          else null
        val hasSum = fields(s"sum__$c") &&
          !r.isNullAt(ix(s"sum__$c"))
        val lSum = if (hasSum) r.getLong(ix(s"sum__$c")) else 0L
        val st =
          if (dom == 'B') ColStats('B', nonNull = nn, bloom = bloom)
          else {
            val (loI, hiI) = (ix(s"${dom.toLower}min__$c"),
              ix(s"${dom.toLower}max__$c"))
            val has = !r.isNullAt(loI)
            dom match {
              case 'L' => ColStats('L',
                lLo = if (has) r.getLong(loI) else 0L,
                lHi = if (has) r.getLong(hiI) else 0L,
                nonNull = nn, hasRange = has, bloom = bloom,
                lSum = lSum, hasSum = hasSum)
              case 'D' => ColStats('D',
                dLo = if (has) r.getDouble(loI) else 0.0,
                dHi = if (has) r.getDouble(hiI) else 0.0,
                nonNull = nn, hasRange = has, bloom = bloom)
              case 'S' => ColStats('S',
                sLo = if (has) r.getString(loI) else null,
                sHi = if (has) r.getString(hiI) else null,
                nonNull = nn, hasRange = has, bloom = bloom)
            }
          }
        c -> st
      }.toMap
      file -> FileStats(nRows, cols, flen)
    }.toMap
  }

  // ---------------------------------------------------------------- //
  //  Predicate refutation against one file's stats                    //
  // ---------------------------------------------------------------- //

  /** The filter literal projected into `dom`, or None when the literal's
    * runtime type doesn't belong to that domain (no pruning — a domain
    * mismatch means Catalyst inserted a cast we didn't see through). */
  private def litIn(dom: Char, v: Any): Option[Any] = (dom, v) match {
    case ('L', x: Byte) => Some(x.toLong)
    case ('L', x: Short) => Some(x.toLong)
    case ('L', x: Int) => Some(x.toLong)
    case ('L', x: Long) => Some(x)
    case ('L', x: Boolean) => Some(if (x) 1L else 0L)
    case ('D', x: Float) => Some(x.toDouble)
    case ('D', x: Double) => Some(x)
    case ('S', x: UTF8String) => Some(x.toString)
    case ('S', x: String) => Some(x)
    case _ => None
  }

  /** UTF8 binary order — matches Spark's min/max aggregate on strings
    * (java String.compareTo orders by UTF-16 unit and disagrees beyond
    * the BMP). */
  private def scmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  private def cmpLo(st: ColStats, v: Any): Option[Int] =
    if (!st.hasRange) None
    else litIn(st.dom, v).map {
      case x: Long => java.lang.Long.compare(st.lLo, x)
      case x: Double => java.lang.Double.compare(st.dLo, x)
      case x: String => scmp(st.sLo, x)
    }
  private def cmpHi(st: ColStats, v: Any): Option[Int] =
    if (!st.hasRange) None
    else litIn(st.dom, v).map {
      case x: Long => java.lang.Long.compare(st.lHi, x)
      case x: Double => java.lang.Double.compare(st.dHi, x)
      case x: String => scmp(st.sHi, x)
    }

  /** Can a row of a file with stats `fs` satisfy `e`? False ONLY when the
    * stats refute it; unknown shapes / missing stats → true. NaN note:
    * Spark's min/max aggregates order NaN greatest, matching Catalyst
    * comparison semantics, so double ranges stay conservative. */
  private[graft] def mayMatch(e: Expression, fs: FileStats): Boolean = {
    def st(a: Attribute): Option[ColStats] = fs.cols.get(a.name)
    // bloom refutation: definitely-absent hash → no row equals v. A
    // literal whose runtime type mismatches the attribute (a Catalyst
    // cast we didn't see through) fails the hash eval → keep.
    def bloomOk(a: Attribute, s: ColStats, v: Any): Boolean =
      s.bloom == null ||
        (try Bloom.mayContain(s.bloom, hashLit(a.dataType, v))
        catch { case _: Exception => true })
    // in-range AND in-bloom: some non-null value could equal v. A
    // bloom-only column ('B') has no range — nonNull==0 is the all-null
    // signal there (range-domain columns keep hasRange ⟺ nonNull>0).
    def eqRange(a: Attribute, v: Any): Boolean = st(a) match {
      case Some(s) =>
        if (s.nonNull == 0) false // all nulls: = never matches
        else {
          val inRange =
            if (!s.hasRange) s.dom == 'B' // range-less non-'B' = all null
            else (cmpLo(s, v), cmpHi(s, v)) match {
              case (Some(lo), Some(hi)) => lo <= 0 && hi >= 0
              case _ => true
            }
          inRange && bloomOk(a, s, v)
        }
      case None => true
    }
    e match {
      case And(l, r) => mayMatch(l, fs) && mayMatch(r, fs)
      case Or(l, r) => mayMatch(l, fs) || mayMatch(r, fs)

      case EqualTo(a: Attribute, Literal(v, _)) if v != null => eqRange(a, v)
      case EqualTo(Literal(v, _), a: Attribute) if v != null => eqRange(a, v)
      case EqualNullSafe(a: Attribute, Literal(v, _)) =>
        if (v == null) st(a).forall(s => s.nonNull < fs.rows)
        else eqRange(a, v)
      case EqualNullSafe(Literal(v, _), a: Attribute) =>
        if (v == null) st(a).forall(s => s.nonNull < fs.rows)
        else eqRange(a, v)

      // a > v: possible iff max > v (and some non-null value exists)
      case GreaterThan(a: Attribute, Literal(v, _)) if v != null =>
        st(a).forall(s => cmpHi(s, v).forall(_ > 0) && s.nonNull > 0)
      case GreaterThan(Literal(v, _), a: Attribute) if v != null =>
        st(a).forall(s => cmpLo(s, v).forall(_ < 0) && s.nonNull > 0)
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) if v != null =>
        st(a).forall(s => cmpHi(s, v).forall(_ >= 0) && s.nonNull > 0)
      case GreaterThanOrEqual(Literal(v, _), a: Attribute) if v != null =>
        st(a).forall(s => cmpLo(s, v).forall(_ <= 0) && s.nonNull > 0)
      case LessThan(a: Attribute, Literal(v, _)) if v != null =>
        st(a).forall(s => cmpLo(s, v).forall(_ < 0) && s.nonNull > 0)
      case LessThan(Literal(v, _), a: Attribute) if v != null =>
        st(a).forall(s => cmpHi(s, v).forall(_ > 0) && s.nonNull > 0)
      case LessThanOrEqual(a: Attribute, Literal(v, _)) if v != null =>
        st(a).forall(s => cmpLo(s, v).forall(_ <= 0) && s.nonNull > 0)
      case LessThanOrEqual(Literal(v, _), a: Attribute) if v != null =>
        st(a).forall(s => cmpHi(s, v).forall(_ >= 0) && s.nonNull > 0)

      case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists { case Literal(v, _) => v != null && eqRange(a, v) }
      case InSet(a: Attribute, vs) =>
        vs.exists(v => v != null && eqRange(a, v))

      case IsNull(a: Attribute) => st(a).forall(s => s.nonNull < fs.rows)
      case IsNotNull(a: Attribute) => st(a).forall(_.nonNull > 0)

      // NOT(a = v): refutable only when the file is constant at v
      case Not(EqualTo(a: Attribute, Literal(v, _))) if v != null =>
        st(a).forall { s =>
          val const = s.hasRange && s.nonNull == fs.rows &&
            (cmpLo(s, v), cmpHi(s, v)) == ((Some(0), Some(0)))
          !const
        }

      // ASCII-only prefix check (truncation at char boundaries is only
      // order-exact for single-byte code points; anything else → keep)
      case StartsWith(a: Attribute, Literal(p: UTF8String, _)) =>
        val pre = p.toString
        st(a) match {
          case Some(s) if s.hasRange && isAscii(pre) &&
              isAscii(s.sLo) && isAscii(s.sHi) =>
            val n = pre.length
            s.sLo.take(n) <= pre && pre <= s.sHi.take(n)
          case _ => true
        }

      case _ => true
    }
  }

  private def isAscii(s: String): Boolean =
    s != null && s.forall(_ < 0x80)

  /** A Catalyst comparison as the v1 `sources.Filter` a parquet reader
    * takes for row-group skipping — the inverse of [[filterToCatalyst]],
    * restricted to the same shape set (None = not translatable = no
    * row-group skip; the caller's residual evaluation stays exact).
    * Literals convert back to EXTERNAL values (UTF8String → String,
    * epoch days → java.sql.Date …), the v1 contract. */
  private[graft] def catalystToFilter(
      e: Expression): Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.{sources => s}
    import org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToScala
    def ext(l: Literal): Any = convertToScala(l.value, l.dataType)
    e match {
      case EqualTo(a: Attribute, l: Literal) =>
        Some(s.EqualTo(a.name, ext(l)))
      case EqualTo(l: Literal, a: Attribute) =>
        Some(s.EqualTo(a.name, ext(l)))
      case GreaterThan(a: Attribute, l: Literal) =>
        Some(s.GreaterThan(a.name, ext(l)))
      case GreaterThan(l: Literal, a: Attribute) =>
        Some(s.LessThan(a.name, ext(l)))
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        Some(s.GreaterThanOrEqual(a.name, ext(l)))
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        Some(s.LessThanOrEqual(a.name, ext(l)))
      case LessThan(a: Attribute, l: Literal) =>
        Some(s.LessThan(a.name, ext(l)))
      case LessThan(l: Literal, a: Attribute) =>
        Some(s.GreaterThan(a.name, ext(l)))
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        Some(s.LessThanOrEqual(a.name, ext(l)))
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        Some(s.GreaterThanOrEqual(a.name, ext(l)))
      case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Some(s.In(a.name,
          vs.map(v => ext(v.asInstanceOf[Literal])).toArray))
      case IsNull(a: Attribute) => Some(s.IsNull(a.name))
      case IsNotNull(a: Attribute) => Some(s.IsNotNull(a.name))
      case StartsWith(a: Attribute, l: Literal) =>
        Some(s.StringStartsWith(a.name, ext(l).asInstanceOf[String]))
      case And(l, r) => for {
        a <- catalystToFilter(l)
        b <- catalystToFilter(r)
      } yield s.And(a, b)
      case Or(l, r) => for {
        a <- catalystToFilter(l)
        b <- catalystToFilter(r)
      } yield s.Or(a, b)
      case Not(inner) => catalystToFilter(inner).map(s.Not)
      case _ => None
    }
  }

  /** A DSv2 `sources.Filter` as the Catalyst expression [[mayMatch]]
    * evaluates — attribute types from `schema`, literals through
    * `Literal.create` (the same external→internal conversion Catalyst
    * applies, so dates become epoch days, timestamps micros, strings
    * UTF8 — exactly the domains the manifest stores). None = shape or
    * type we can't see through → no pruning, never a wrong skip. */
  private[graft] def filterToCatalyst(f: org.apache.spark.sql.sources.Filter,
      schema: StructType): Option[Expression] = {
    import org.apache.spark.sql.{sources => s}
    def attr(n: String): Option[AttributeReference] =
      schema.find(_.name == n).map(sf =>
        AttributeReference(sf.name, sf.dataType, sf.nullable)())
    def pair(n: String, v: Any): Option[(AttributeReference, Literal)] =
      if (v == null) None
      else attr(n).flatMap(a =>
        try Some((a, Literal.create(v, a.dataType)))
        catch { case _: Exception => None })
    f match {
      case s.EqualTo(n, v) => pair(n, v).map { case (a, l) => EqualTo(a, l) }
      case s.EqualNullSafe(n, v) if v != null =>
        pair(n, v).map { case (a, l) => EqualNullSafe(a, l) }
      case s.GreaterThan(n, v) =>
        pair(n, v).map { case (a, l) => GreaterThan(a, l) }
      case s.GreaterThanOrEqual(n, v) =>
        pair(n, v).map { case (a, l) => GreaterThanOrEqual(a, l) }
      case s.LessThan(n, v) =>
        pair(n, v).map { case (a, l) => LessThan(a, l) }
      case s.LessThanOrEqual(n, v) =>
        pair(n, v).map { case (a, l) => LessThanOrEqual(a, l) }
      case s.In(n, vs) if vs.forall(_ != null) =>
        attr(n).flatMap { a =>
          try Some(In(a, vs.toIndexedSeq
            .map(v => Literal.create(v, a.dataType))))
          catch { case _: Exception => None }
        }
      case s.IsNull(n) => attr(n).map(IsNull)
      case s.IsNotNull(n) => attr(n).map(IsNotNull)
      case s.StringStartsWith(n, p) =>
        attr(n).map(a => StartsWith(a, Literal.create(p, StringType)))
      case s.And(l, r) => for {
        a <- filterToCatalyst(l, schema)
        b <- filterToCatalyst(r, schema)
      } yield And(a, b)
      // Or prunes only when BOTH sides convert (a lost side would
      // narrow an Or, which over-prunes)
      case s.Or(l, r) => for {
        a <- filterToCatalyst(l, schema)
        b <- filterToCatalyst(r, schema)
      } yield Or(a, b)
      case s.Not(s.EqualTo(n, v)) =>
        pair(n, v).map { case (a, l) => Not(EqualTo(a, l)) }
      case _ => None
    }
  }

  // ---------------------------------------------------------------- //
  //  The pruning FileIndex + scan relation                            //
  // ---------------------------------------------------------------- //

  /** A [[FileIndex]] that lists only the files whose manifest stats
    * could satisfy the scan's pushed data filters. Planning-time: the
    * pruned files never become tasks. `selected`/`total` record the
    * last listing for specs and SCALE.md. */
  final class ManifestFileIndex(inner: InMemoryFileIndex,
      val stats: Map[String, FileStats],
      /** snapshot reads: only these file keys exist for this scan —
        * files appended after the snapshot's manifest version are
        * invisible, exactly like reading a lakehouse table AS OF. */
      val allow: Option[Set[String]] = None,
      /** latest-reads: file keys TOMBSTONED by row-level ops — replaced
        * bytes physically retained for snapshot/CDC reads but dead to
        * the current table state. Disjoint from `allow`'s job: a file
        * neither allowed-out nor denied nor manifested (a fresh append)
        * is still conservatively kept — EXCEPT the `ac-*` namespace,
        * which is manifest-authoritative: auto-compaction renames its
        * packed files in BEFORE committing (rename-first crash
        * protocol, Layout.autoCompact), so an unmanifested `ac-*` file
        * is either a compactor mid-swap or a crashed compactor's
        * orphan; its rows still live in the originals and reading it
        * would double-count. */
      val deny: Set[String] = Set.empty) extends FileIndex {
    val selected = new AtomicLong(-1L)
    val total = new AtomicLong(-1L)

    override def rootPaths: Seq[Path] = inner.rootPaths
    override def inputFiles: Array[String] = {
      val base = allow match {
        case Some(keys) =>
          inner.inputFiles.filter(f => keys.contains(fileKey(new Path(f))))
        case None => inner.inputFiles
      }
      val live = if (deny.isEmpty) base
        else base.filterNot(f => deny.contains(fileKey(new Path(f))))
      live.filterNot { f =>
        val p = new Path(f)
        p.getName.startsWith("ac-") && !stats.contains(fileKey(p))
      }
    }
    override def refresh(): Unit = inner.refresh()
    /** The LIVE byte size, from manifest-carried file lengths, when
      * this scan denies tombstoned files or reads a snapshot — the
      * directory total (`inner`) counts replaced-but-retained bytes
      * and post-snapshot appends, so a mostly-deleted table would
      * never qualify for a broadcast join it should get. Falls back
      * to the directory total when any length is unknown (pre-flen
      * manifests), when nothing is filtered (directory == live), or
      * when the listing holds files the manifest doesn't cover (fresh
      * external appends before reconciliation — [[listFiles]]
      * conservatively KEEPS those, so summing only covered entries
      * would under-report what the scan reads and could wrongly
      * qualify a large relation for a broadcast join). */
    override def sizeInBytes: Long = {
      if (allow.isEmpty && deny.isEmpty) return inner.sizeInBytes
      var sum = 0L
      val files = inner.inputFiles
      var i = 0
      while (i < files.length) {
        val k = fileKey(new Path(files(i)))
        if (allow.forall(_.contains(k)) && !deny.contains(k)) {
          stats.get(k) match {
            case Some(st) if st.len >= 0L => sum += st.len
            case _ => return inner.sizeInBytes
          }
        }
        i += 1
      }
      sum
    }
    override def partitionSchema: StructType = inner.partitionSchema

    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val dirs = inner.listFiles(partitionFilters, dataFilters)
      var tot = 0L
      var sel = 0L
      val pruned = dirs.map { pd =>
        val kept = pd.files.filter { f =>
          val k = fileKey(f.getPath)
          if (deny.contains(k) || !allow.forall(_.contains(k))) false
          else if (f.getPath.getName.startsWith("ac-") &&
            !stats.contains(k)) false // mid-swap / crashed-compactor
          else {
            tot += 1
            val keep = stats.get(k)
              .forall(fs => dataFilters.forall(mayMatch(_, fs)))
            if (keep) sel += 1
            keep
          }
        }
        pd.copy(files = kept)
      }
      total.set(tot)
      selected.set(sel)
      pruned
    }
  }

  /** DataFrame over `dir` with manifest file pruning, plus the index for
    * selected/total introspection. Hive-partitioned layouts compose:
    * partition-column predicates prune DIRECTORIES through Spark's own
    * partition pruning (the inner index), manifest stats prune FILES on
    * data columns inside the surviving partitions, and parquet footers
    * still prune row groups inside the surviving files. */
  def scanWithIndex(spark: SparkSession,
      dir: String): (DataFrame, ManifestFileIndex) = {
    // no manifest (not yet written) → empty stats map → every file
    // kept: a scan is never WRONG for lack of a manifest, only
    // unpruned. (Versioned commits mean a reader never observes a
    // half-written manifest — it resolves the latest COMMITTED version.)
    val stats =
      try read(spark, dir)
      catch { case _: Exception => Map.empty[String, FileStats] }
    val deny =
      try removedLatest(spark, dir)
      catch { case _: Exception => Set.empty[String] }
    buildScan(spark, dir, stats, allow = None, deny = deny)
  }

  /** SNAPSHOT read: the table AS OF manifest version `version` — the
    * scan sees exactly the files that version's manifest recorded
    * (later appends are invisible) with that version's stats pruning
    * them. Fails fast when retention has deleted a referenced data
    * file (`Layout.optimize` replaces files; [[expire]] bounds how far
    * back snapshots reach — the VACUUM/time-travel trade). */
  def scanAtVersion(spark: SparkSession, dir: String,
      version: Long): (DataFrame, ManifestFileIndex) =
    scanAtVersionWithStats(spark, dir, version,
      readAt(spark, dir, version))

  /** [[scanAtVersion]] with the version's stats already in hand — a
    * caller that needs BOTH the map and the scan (RowOps opens every
    * op this way) folds the manifest once, not twice. */
  private[graft] def scanAtVersionWithStats(spark: SparkSession,
      dir: String, version: Long, stats: Map[String, FileStats])
      : (DataFrame, ManifestFileIndex) = {
    // the schema AS OF that version: the version's sidecar, or — for
    // versions committed before evolution support — inference over the
    // version's OWN files (basePath keeps Hive-partition columns), so
    // time travel crosses ADD/DROP COLUMN faithfully either way
    val histSchema = schemaAt(spark, dir, version).getOrElse(
      try spark.read.option("basePath", dir)
        .parquet(stats.keySet.toSeq.sorted: _*).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          // fail FAST and loud, same contract as the post-build check
          throw new IllegalArgumentException(
            s"scanAtVersion: data files of version $version no " +
              s"longer exist (compacted or expired): ${e.getMessage}")
      })
    val (df, idx) = buildScan(spark, dir, stats,
      allow = Some(stats.keySet),
      schemaOverride = Some(histSchema))
    val listed = idx.inputFiles
      .map(f => fileKey(new Path(f))).toSet
    val missing = stats.keySet -- listed
    require(missing.isEmpty,
      s"scanAtVersion: ${missing.size} data files of version $version no " +
        s"longer exist (compacted or expired); e.g. ${missing.head}")
    (df, idx)
  }

  private def buildScan(spark: SparkSession, dir: String,
      stats: Map[String, FileStats],
      allow: Option[Set[String]],
      deny: Set[String] = Set.empty,
      schemaOverride: Option[StructType] = None)
      : (DataFrame, ManifestFileIndex) = {
    val fullSchema = schemaOverride.getOrElse(tableSchema(spark, dir))
    val inner = new InMemoryFileIndex(spark, Seq(new Path(dir)),
      Map.empty[String, String], Some(fullSchema),
      FileStatusCache.getOrCreate(spark), None, None)
    val partSchema = inner.partitionSchema
    val dataSchema = StructType(
      fullSchema.filterNot(f => partSchema.fieldNames.contains(f.name)))
    val idx = new ManifestFileIndex(inner, stats, allow, deny)
    // a renamed table reads through the name-mapping format; everything
    // else keeps the stock parquet format (identical plan shape)
    val fmt =
      if (nameMapOf(fullSchema).isEmpty) new ParquetFileFormat()
      else new GraftParquetFileFormat(nameMapOf(fullSchema))
    val rel = HadoopFsRelation(idx, partSchema, dataSchema, None,
      fmt, Map.empty[String, String])(spark)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    (classic.baseRelationToDataFrame(rel), idx)
  }

  /** [[scanWithIndex]] without the introspection handle. */
  def scan(spark: SparkSession, dir: String): DataFrame =
    scanWithIndex(spark, dir)._1
}
