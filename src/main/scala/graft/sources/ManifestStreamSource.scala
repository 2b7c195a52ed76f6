package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit,
  MicroBatchStream, Offset, ReadLimit, ReadMaxBytes, ReadMaxFiles,
  ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STREAMING source over a manifested table, offset = manifest version:
  *
  * {{{
  *   spark.readStream.format("graft-manifest-stream")
  *     .option("startingVersion", "3")   // default 0 = full history
  *     .option("startingTimestamp", "2026-08-01 00:00:00") // or by time
  *     .option("maxFilesPerTrigger", "64")   // rate-limit catch-up
  *     .option("maxBytesPerTrigger", "128m") // (soft; >=1 file/batch)
  *     .option("maxRowsPerTrigger", "1000000")
  *     .load(dir)
  * }}}
  *
  * Each micro-batch reads exactly the files ADDED between the last
  * committed version offset and the current latest — the version log
  * is immutable, so a replayed batch re-reads the identical file set
  * and the checkpointed offsets give exactly-once ingestion from a
  * stored table (retention must outlast downtime: an expired start
  * version fails loudly rather than silently skipping).
  *
  * APPEND-ONLY semantics: if a version range carries tombstones (a
  * row-level DELETE/UPDATE/MERGE or deferDelete OPTIMIZE committed in
  * it), the source fails and points at [[RowOps.changesStream]] — the
  * CDC feed is the correct stream for a mutating table. Opting into
  * `ignoreChanges=true` streams just the added files (copy-on-write
  * REWRITES then re-emit their carried rows — the documented
  * lakehouse caveat for that flag).
  *
  * Reads use Spark's own parquet reader function
  * (`ParquetFileFormat.buildReaderWithPartitionValues`), so types,
  * nested schemas and Hive-partition column synthesis match the batch
  * scan exactly; the row-based reader is selected (a cloned session
  * with vectorization off) because the DSv2 row contract is
  * per-record.
  *
  * Reference analogue: the reference's continuous table sources
  * (`flink-table-common/…/factories/DynamicTableSourceFactory.java` +
  * FLIP-27 split enumeration) — here the "splits" are the version
  * log's added files, which is what makes replay deterministic. */
final class ManifestStreamSource extends TableProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-manifest-stream"

  private def path(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw
      new IllegalArgumentException(
        "graft-manifest-stream: 'path' option required"))

  /** The stream's OUTPUT schema: the table's columns, narrowed to
    * `pushColumns` when set (projection pushdown via reader option —
    * see [[ManifestStreamScanBuilder]] for why an option, not just the
    * DSv2 ability); with `readChangeFeed`, the (possibly projected)
    * table columns + the CDC envelope (`_change_type` +
    * `_commit_version` — always kept: a feed without its envelope is
    * not a feed). */
  private def outSchema(options: CaseInsensitiveStringMap): StructType = {
    val full = StatsManifest.scanWithIndex(SparkSession.active,
      path(options))._1.schema
    def projected: StructType = Option(options.get("pushColumns")) match {
      case Some(cs) =>
        val names = cs.split(",").map(_.trim).filter(_.nonEmpty)
        val missing = names.filterNot(full.fieldNames.contains)
        require(missing.isEmpty, "graft-manifest-stream: pushColumns " +
          s"not in the table schema: ${missing.mkString(", ")}")
        StructType(full.filter(f => names.contains(f.name)))
      case None => full
    }
    if (options.getBoolean("readChangeFeed", false)) {
      require(!options.getBoolean("ignoreChanges", false),
        "graft-manifest-stream: readChangeFeed cannot combine with " +
          "ignoreChanges")
      return RowOps.cdcSchema(projected)
    }
    projected
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    outSchema(options)

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ManifestStreamTable(schema, path(opts),
      ManifestStreamSource.resolveStartVersion(SparkSession.active,
        path(opts), opts),
      opts.getBoolean("ignoreChanges", false),
      Option(opts.get("pushFilter")), TriggerLimits.from(opts),
      opts.getBoolean("readChangeFeed", false),
      Option(opts.get("pushColumns")))
  }
}

/** Per-trigger admission limits (rate limiting for catch-up reads):
  * `maxFilesPerTrigger`, `maxBytesPerTrigger` (accepts byte-suffix
  * forms like `128m`), `maxRowsPerTrigger` (honored exactly at file
  * granularity — the manifest carries per-file row counts). Without
  * them, a stream starting at version 0 of a huge table would plan its
  * entire history as ONE batch; with them, catch-up proceeds in
  * bounded batches whose offsets may land MID-version (the offset's
  * `index` field). Bytes/rows are soft caps: a batch always admits at
  * least one file, so progress is guaranteed. */
private[graft] final case class TriggerLimits(maxFiles: Option[Int],
    maxBytes: Option[Long], maxRows: Option[Long]) {
  def toReadLimit: ReadLimit = {
    val ls: Seq[ReadLimit] = maxFiles.map(ReadLimit.maxFiles(_)).toSeq ++
      maxBytes.map(ReadLimit.maxBytes(_)) ++
      maxRows.map(ReadLimit.maxRows(_))
    ls match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }
}

private[graft] object TriggerLimits {
  def from(options: CaseInsensitiveStringMap): TriggerLimits = {
    def pos(name: String, v: Long): Long = {
      require(v > 0, s"graft-manifest-stream: $name must be > 0, got $v")
      v
    }
    TriggerLimits(
      Option(options.get("maxFilesPerTrigger")).map { s =>
        val v = pos("maxFilesPerTrigger", s.toLong)
        require(v <= Int.MaxValue,
          s"graft-manifest-stream: maxFilesPerTrigger $v out of range")
        v.toInt
      },
      Option(options.get("maxBytesPerTrigger")).map(s =>
        pos("maxBytesPerTrigger", org.apache.spark.network.util.JavaUtils
          .byteStringAsBytes(s))),
      Option(options.get("maxRowsPerTrigger"))
        .map(s => pos("maxRowsPerTrigger", s.toLong)))
  }
}

private final class ManifestStreamTable(outSchema: StructType,
    dir: String, startingVersion: Long, ignoreChanges: Boolean,
    pushFilterSql: Option[String], limits: TriggerLimits,
    readChangeFeed: Boolean, pushColumnsOpt: Option[String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-manifest-stream($dir)"
  override def schema(): StructType = outSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    if (readChangeFeed)
      ManifestCdcStream.scanBuilder(dir, startingVersion, limits,
        pushColumnsOpt, pushFilterSql)
    else
      new ManifestStreamScanBuilder(outSchema, dir, startingVersion,
        ignoreChanges, pushFilterSql, limits)
}

/** Pushdown on the STREAM scan — the batch path prunes by manifest
  * stats and reads only required columns; a streaming reader of the
  * same table deserves the same. Spark 4.1's micro-batch planner calls
  * `newScanBuilder(options).build()` DIRECTLY (no V2ScanRelationPushDown
  * for streaming relations — verified against MicroBatchExecution), so
  * the DSv2 abilities alone never fire on this path. Hence two layers:
  *
  *  - reader OPTIONS, the connector-idiomatic route (how Kafka sources
  *    take their pruning hints): `pushFilter` = a SQL boolean
  *    expression applied EXACTLY at the source — per batch each ADDED
  *    file's manifest stats refute whole files before a task launches
  *    ([[StatsManifest.mayMatch]]), surviving files push the filter
  *    into parquet for row-group skipping, and a residual per-row
  *    evaluation guarantees exact semantics; `pushColumns` = the
  *    source's output projection, so a stream wanting 2 of 40 columns
  *    reads 2 columns.
  *  - the DSv2 abilities (`SupportsPushDownFilters` /
  *    `SupportsPushDownRequiredColumns`) stay wired: zero cost today,
  *    automatic the day Spark pushes through streaming scans.
  *
  * Reference analogue: the scan-ability contracts
  * (`flink-table-common/…/source/abilities/SupportsFilterPushDown.java`,
  * `SupportsProjectionPushDown.java`) applied to the version-offset
  * stream. */
private final class ManifestStreamScanBuilder(outSchema: StructType,
    dir: String, startingVersion: Long, ignoreChanges: Boolean,
    pushFilterSql: Option[String], limits: TriggerLimits)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read
      .SupportsPushDownRequiredColumns {
  private var required: StructType = outSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty

  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters
    filters // ALL residual: skipping is best-effort refutation
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val spark = SparkSession.active
    val (fullDf, idx) = StatsManifest.scanWithIndex(spark, dir)
    val fullSchema = fullDf.schema
    val partSchema = idx.partitionSchema
    // ONE attribute set for the whole scan: the filter resolves against
    // it, the reader's row layout indexes into it — exprIds line up by
    // construction
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(fullSchema)
    def attrsOf(st: StructType) = st.fieldNames.toSeq
      .map(n => attrs(fullSchema.fieldIndex(n)))
    val filterExpr: Option[Expression] = pushFilterSql.map(
      ManifestStreamSource.resolvePushFilter(spark, _, attrs))
    // output = engine-pruned required (defaults to the option-projected
    // table schema), split data/partition; read = output data columns
    // plus whatever data columns the filter needs (projected away after
    // the residual evaluation)
    val outputData = StructType(required.filterNot(f =>
      partSchema.fieldNames.contains(f.name)))
    val filterRefs = filterExpr.toSeq
      .flatMap(_.references.toSeq.map(_.name)).toSet
    val readData = StructType(fullSchema
      .filterNot(f => partSchema.fieldNames.contains(f.name))
      .filter(f => outputData.fieldNames.contains(f.name) ||
        filterRefs.contains(f.name)))
    val out = StructType(outputData ++ partSchema)
    new Scan {
      override def readSchema(): StructType = out
      override def toMicroBatchStream(
          checkpointLocation: String): MicroBatchStream =
        new ManifestMicroBatchStream(fullSchema, readData, outputData,
          partSchema, attrsOf(readData) ++ attrsOf(partSchema),
          attrsOf(outputData) ++ attrsOf(partSchema),
          filterExpr, pushed, dir, startingVersion, ignoreChanges,
          limits)
    }
  }
}

private[graft] object ManifestStreamSource {
  /** Last planInputPartitions pruning evidence (files kept / files
    * added in the range) — a test hook, same spirit as
    * `ManifestFileIndex.selected/total`. */
  val lastPlanSelected = new java.util.concurrent.atomic.AtomicLong(-1L)
  val lastPlanTotal = new java.util.concurrent.atomic.AtomicLong(-1L)

  /** The stream ScanBuilder for OTHER front doors (the graft
    * TableCatalog's `readStream.table("graft.db.t")`) — same options
    * (`startingVersion`, `ignoreChanges`, `pushFilter`, `pushColumns`,
    * the trigger limits, `readChangeFeed`), same streams. */
  def streamScanBuilder(schema: StructType, dir: String,
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val start = resolveStartVersion(
      org.apache.spark.sql.SparkSession.active, dir, options)
    if (options.getBoolean("readChangeFeed", false))
      ManifestCdcStream.scanBuilder(dir, start,
        TriggerLimits.from(options),
        Option(options.get("pushColumns")),
        Option(options.get("pushFilter")))
    else
      new ManifestStreamScanBuilder(schema, dir, start,
        options.getBoolean("ignoreChanges", false),
        Option(options.get("pushFilter")), TriggerLimits.from(options))
  }

  /** Resolve a `pushFilter` SQL boolean against `attrs` through the
    * session's own parser + analyzer, then constant-fold (the analyzer
    * leaves type-coercion casts like `cast(5050 as bigint)` unfolded —
    * only the optimizer folds them, and we run just the analyzer; the
    * manifest pruner and the parquet translator both match bare
    * Literals). */
  private[sources] def resolvePushFilter(
      spark: org.apache.spark.sql.SparkSession, sql: String,
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
      : Expression = {
    val parsed = spark.sessionState.sqlParser.parseExpression(sql)
    val plan = org.apache.spark.sql.catalyst.plans.logical.Filter(
      parsed,
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(attrs))
    val resolved = spark.sessionState.analyzer
      .executeAndCheck(plan,
        new org.apache.spark.sql.catalyst.QueryPlanningTracker)
      .collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }
      .getOrElse(throw new IllegalArgumentException(
        s"graft-manifest-stream: cannot resolve pushFilter '$sql'"))
    resolved.transformUp {
      case e if e.foldable &&
          !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions
            .Literal] =>
        org.apache.spark.sql.catalyst.expressions
          .Literal.create(e.eval(), e.dataType)
    }
  }

  /** `startingVersion` / `startingTimestamp` → the first version the
    * stream emits. The timestamp form resolves to the FIRST version
    * committed at or after it (session-zone parse, the exact
    * semantics `TIMESTAMP AS OF` uses), so "start from last Tuesday"
    * needs no version arithmetic; a future timestamp starts an empty
    * stream that waits for commits past it. One O(versions)
    * commit-time listing at stream construction, never per trigger. */
  private[graft] def resolveStartVersion(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      options: CaseInsensitiveStringMap): Long = {
    val sv = Option(options.get("startingVersion")).map(_.toLong)
    val st = Option(options.get("startingTimestamp"))
    require(sv.isEmpty || st.isEmpty, "graft-manifest-stream: set " +
      "startingVersion OR startingTimestamp, not both")
    st match {
      case Some(ts) =>
        val ms = StatsManifest.parseTsMillis(spark, ts)
        val times = StatsManifest.commitTimes(spark, dir)
        times.find(_._2 >= ms).map(_._1)
          .getOrElse(times.lastOption.map(_._1 + 1L).getOrElse(0L))
      case None => sv.getOrElse(0L)
    }
  }

  /** Hive-partition values synthesized from a file key's `p=…` path
    * segments — exactly like the batch scan (typed via a session-zone
    * Cast). */
  private[sources] def partitionValues(
      spark: org.apache.spark.sql.SparkSession, rootKey: String,
      key: String, partSchema: StructType): InternalRow = {
    if (partSchema.isEmpty) return InternalRow.empty
    val rel = key.stripPrefix(rootKey).stripPrefix("/")
    val kv = rel.split("/").dropRight(1).flatMap { seg =>
      seg.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap
    InternalRow.fromSeq(partSchema.map { f =>
      val raw = kv.getOrElse(f.name,
        throw new IllegalStateException(
          s"graft-manifest-stream: no ${f.name}= segment in $key"))
      val unescaped = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.unescapePathName(raw)
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String
            .fromString(unescaped),
          org.apache.spark.sql.types.StringType),
        f.dataType,
        Some(spark.sessionState.conf.sessionLocalTimeZone)).eval()
    })
  }
}

/** A version's units are not READABLE yet — a live stream raced a
  * committing op's CDC write (the change files land moments after the
  * manifest rename). Thrown by [[ManifestCdcStream.computeUnits]]
  * within the wait window; offset resolution treats it as "no new
  * data at this version yet" and truncates the batch BEFORE the racy
  * version (the next trigger retries), so the driver's trigger thread
  * never sleeps through the race. Past the window, [[ManifestCdcStream]]
  * escalates to the loud lost-files error instead. */
private final class CdcPendingException(msg: String)
    extends RuntimeException(msg)

/** Offset = (last fully-ingested manifest version, number of added
  * files of version+1 already ingested). `index = 0` is exactly the
  * pre-admission-control semantics, and old checkpoints (`{"version":
  * N}`) deserialize to it — a stream written before rate limiting
  * existed resumes unchanged. `index > 0` means a trigger limit cut a
  * batch MID-version: the version's added files, in their stable
  * sorted order, are split across batches (the sort makes replay
  * deterministic — a recomputed batch re-reads the identical slice). */
private final case class VersionOffset(version: Long, index: Long = 0L)
    extends Offset {
  override def json(): String =
    if (index == 0L) s"""{"version":$version}"""
    else s"""{"version":$version,"index":$index}"""
  /** Strictly-after in stream order. */
  def >(o: VersionOffset): Boolean =
    version > o.version || (version == o.version && index > o.index)
}

/** Shared machinery for micro-batch streams whose offsets are manifest
  * versions (with sub-version file indexes): offset arithmetic and
  * (de)serialization, the hint-probed latest resolution, and the
  * rate-limited admission walk. Subclasses define what one version's
  * emittable UNITS are — added data files for the table stream, change
  * files for the CDC stream. */
private abstract class VersionOffsetStream[U: scala.reflect.ClassTag](
    dir: String,
    startingVersion: Long, limits: TriggerLimits)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow
    with org.apache.spark.internal.Logging {
  protected val spark = SparkSession.active

  /** Trigger.AvailableNow pins the stream's end at prepare time: the
    * run drains up to exactly this version in rate-limited batches,
    * then stops — later commits wait for the next run. */
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(
      StatsManifest.latestVersion(spark, dir).getOrElse(0L))
  private def latestCapped: Long = {
    val l = StatsManifest.latestVersion(spark, dir).getOrElse(0L)
    availableNowCap.fold(l)(math.min(l, _))
  }

  /** The units version `v` emits, in the STABLE order sub-version
    * offsets index into (replay determinism). */
  protected def computeUnits(v: Long): Array[U]
  /** (bytes, rows) of a unit for the byte/row budgets; 0 when
    * unknown. */
  protected def unitSize(u: U): (Long, Long)

  /** Memoized [[computeUnits]] — the admission walk and the subsequent
    * planInputPartitions for the same trigger hit the memo; entries at
    * or below the committed offset are dropped in [[commit]]. */
  private val unitsMemo =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[U]]()
  protected final def unitsOfVersion(v: Long): Array[U] =
    unitsMemo.computeIfAbsent(v, computeUnits(_))

  protected final def filesAt(
      v: Long): Map[String, StatsManifest.FileStats] =
    if (v <= 0L) Map.empty
    else
      try StatsManifest.readAt(spark, dir, v)
      catch {
        case e: Exception => throw new IllegalStateException(
          s"graft-manifest-stream: version $v is no longer retained — " +
            "the stream was down longer than the table's retention " +
            "window; re-seed from a fresh startingVersion", e)
      }

  /** Schema-drift guard: a stream PINS its schema when it starts, so
    * an ALTER COLUMN committed while it runs would silently mis-read
    * every later file (an added column invisibly dropped, a removed
    * one null-filled). [[guardSchemaDrift]] fails LOUDLY when a range
    * reaches PAST the pin version into a different sidecar schema.
    * Ranges at or before the pin version are exempt: after a restart
    * the new pin reads historical files under the CURRENT schema
    * (added columns null-fill, dropped ones project away — the batch
    * time-travel convention, adopted explicitly at restart, never
    * silently mid-stream). */
  private val pinnedAtVersion: Long =
    StatsManifest.latestVersion(spark, dir).getOrElse(0L)
  private val pinnedSchemaSidecar: Option[StructType] =
    if (pinnedAtVersion <= 0L) None
    else StatsManifest.schemaAt(spark, dir, pinnedAtVersion)
  protected final def guardSchemaDrift(maxV: Long): Unit = {
    if (maxV <= pinnedAtVersion) return
    val now = StatsManifest.schemaAt(spark, dir, maxV)
    if (now != pinnedSchemaSidecar) {
      // name the drift: a rename shows up as old-name-gone/new-name-in
      val was = pinnedSchemaSidecar.map(_.fieldNames.toSet)
        .getOrElse(Set.empty)
      val is = now.map(_.fieldNames.toSet).getOrElse(Set.empty)
      val gone = (was -- is).toSeq.sorted.mkString(", ")
      val added = (is -- was).toSeq.sorted.mkString(", ")
      throw new IllegalStateException(
        s"graft-manifest-stream: the table schema changed between " +
          s"version $pinnedAtVersion and version $maxV (ALTER ADD/" +
          "DROP/RENAME COLUMN or a type change" +
          (if (gone.nonEmpty || added.nonEmpty)
            s"; columns gone: [$gone], new: [$added]" else "") +
          ") while this stream was running — restart the stream to " +
          "adopt the new schema (a pinned schema would silently " +
          "mis-read the new files)")
    }
  }

  override def initialOffset(): Offset =
    VersionOffset(math.max(0L, startingVersion - 1L))

  override def latestOffset(): Offset =
    // hint-probed O(log) resolution — this runs per trigger, and a
    // full directory listing per trigger is the O(versions) curve the
    // manifest log checkpointing removed
    VersionOffset(latestCapped)

  override def getDefaultReadLimit: ReadLimit = limits.toReadLimit

  override def reportLatestOffset(): Offset = latestOffset()

  /** Subclasses whose [[computeUnits]] can transiently fail with
    * [[CdcPendingException]] (the CDC stream racing a commit's sidecar
    * write) return true: offset resolution then walks units even with
    * no admission limits, so a racy version truncates the batch
    * instead of blocking or failing it. The table stream keeps the
    * O(1) unbounded shortcut. */
  protected def probeUnitsAtLatest: Boolean = false

  /** Rate-limited offset resolution: walk versions forward from
    * `start`, admitting units (in each version's stable order) until
    * the limit is hit — possibly MID-version, which is what the
    * offset's `index` field encodes. Cost is O(versions actually
    * admitted), not O(backlog): a stream catching up on a year-old
    * table pays only for the batch it is about to run. Limits count
    * units BEFORE any pushFilter pruning — the cap bounds planning
    * work too, and stats-refuted files still never become read
    * tasks. A version whose units are PENDING ([[CdcPendingException]])
    * ends the batch just before it — "no new data there yet", retried
    * next trigger, never a sleep on the trigger thread. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset]
    val latest = latestCapped
    if (latest <= s.version) return s
    def bounds(l: ReadLimit): (Long, Long, Long) = l match {
      case f: ReadMaxFiles => (f.maxFiles().toLong, Long.MaxValue,
        Long.MaxValue)
      case b: ReadMaxBytes => (Long.MaxValue, b.maxBytes(),
        Long.MaxValue)
      case r: ReadMaxRows => (Long.MaxValue, Long.MaxValue, r.maxRows())
      case c: CompositeReadLimit => c.getReadLimits.map(bounds)
        .reduce((a, b) => (math.min(a._1, b._1), math.min(a._2, b._2),
          math.min(a._3, b._3)))
      case _ => (Long.MaxValue, Long.MaxValue, Long.MaxValue)
    }
    val (maxF, maxB, maxR) = bounds(limit)
    if (maxF == Long.MaxValue && maxB == Long.MaxValue &&
        maxR == Long.MaxValue && !probeUnitsAtLatest)
      return VersionOffset(latest)
    var files = 0L
    var bytes = 0L
    var rows = 0L
    var v = s.version
    var idx = s.index
    while (v < latest) {
      val adds =
        try unitsOfVersion(v + 1)
        catch {
          case _: CdcPendingException =>
            // at loop top (v, idx) is the last fully-resolved
            // position: idx can exceed 0 only on the first iteration
            // (the start offset's own mid-version cut)
            return if (v == s.version) s else VersionOffset(v)
        }
      var i = idx
      while (i < adds.length) {
        val (len0, rows0) = unitSize(adds(i.toInt))
        val len = math.max(0L, len0)
        // hard cap on files; soft caps on bytes/rows (always admit at
        // least one file so the stream can make progress)
        if (files + 1 > maxF ||
            (files > 0 && (bytes + len > maxB || rows + rows0 > maxR)))
          return VersionOffset(v, i)
        files += 1; bytes += len; rows += rows0; i += 1
      }
      v += 1
      idx = 0L
    }
    VersionOffset(latest)
  }

  override def deserializeOffset(json: String): Offset = {
    val vm = """"version"\s*:\s*(\d+)""".r
    val im = """"index"\s*:\s*(\d+)""".r
    VersionOffset(
      vm.findFirstMatchIn(json).map(_.group(1).toLong)
        .getOrElse(throw new IllegalArgumentException(
          s"graft-manifest-stream: bad offset $json")),
      im.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L))
  }

  /** Units of the range (start, end], honoring sub-version indexes on
    * both bounds; also returns the highest version the range touches
    * (for the tombstone guard). */
  protected final def unitsInRange(s: VersionOffset,
      e: VersionOffset): (Long, Array[U]) = {
    // e.index > 0 means the range extends e.index units INTO version
    // e.version + 1
    val maxV = if (e.index > 0L) e.version + 1L else e.version
    val buf = scala.collection.mutable.ArrayBuffer.empty[U]
    var v = s.version + 1L
    while (v <= maxV) {
      var adds: Array[U] = unitsOfVersion(v)
      if (v == s.version + 1L && s.index > 0L)
        adds = adds.drop(s.index.toInt)
      if (v == e.version + 1L) {
        val already = if (v == s.version + 1L) s.index else 0L
        adds = adds.take((e.index - already).toInt)
      }
      buf ++= adds
      v += 1L
    }
    (maxV, buf.toArray)
  }

  override def commit(end: Offset): Unit = {
    // the memo only serves the catch-up window — drop everything the
    // committed offset has fully passed
    val v = end.asInstanceOf[VersionOffset].version
    unitsMemo.keySet.removeIf(k => k <= v)
  }
  override def stop(): Unit = ()
}

private final class ManifestMicroBatchStream(tableSchema: StructType,
    readData: StructType, outputData: StructType, partSchema: StructType,
    readAttrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
    outAttrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
    filterExpr: Option[
      org.apache.spark.sql.catalyst.expressions.Expression],
    pushed: Array[org.apache.spark.sql.sources.Filter],
    dir: String, startingVersion: Long, ignoreChanges: Boolean,
    limits: TriggerLimits)
    extends VersionOffsetStream[(String, StatsManifest.FileStats)](
      dir, startingVersion, limits) {

  // file-refutation shapes for the manifest pruner: the resolved
  // pushFilter expression plus any engine-pushed v1 filters;
  // unconvertible shapes drop out (keep-the-file default)
  private val pushedExprs = filterExpr.toSeq ++ pushed.flatMap(
    StatsManifest.filterToCatalyst(_, tableSchema)).toSeq

  // the pushFilter's conjuncts as v1 filters for parquet row-group
  // skipping inside surviving files (non-translatable conjuncts just
  // don't skip; the residual evaluation stays exact)
  private val parquetFilters: Seq[org.apache.spark.sql.sources.Filter] = {
    def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
      e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          conjuncts(l) ++ conjuncts(r)
        case x => Seq(x)
      }
    pushed.toSeq ++ filterExpr.toSeq.flatMap(conjuncts)
      .flatMap(StatsManifest.catalystToFilter)
  }

  /** The files ADDED by version `v` with their manifest stats, sorted
    * by key. A DELTA version answers from its OWN delta content — one
    * small parquet read, no fold — so a catch-up over a long backlog
    * plans at O(delta) per version; checkpoint slots (every Nth) fall
    * back to a snapshot diff served by [[StatsManifest.readAt]]'s
    * cache. A net-zero MAINTENANCE commit (`optimize` — a compaction
    * or z-order rewrite, including the append sink's auto-compaction)
    * emits NOTHING: its added files carry only rows the stream already
    * delivered from the originals, so re-emitting them would break
    * exactly-once; the tombstone guard in [[planInputPartitions]]
    * exempts those versions the same way. */
  override protected def computeUnits(
      v: Long): Array[(String, StatsManifest.FileStats)] = {
    if (StatsManifest.opAt(spark, dir, v).contains("optimize"))
      return Array.empty
    val delta =
      try StatsManifest.deltaOf(spark, dir, v)
      catch {
        case e: Exception => throw new IllegalStateException(
          s"graft-manifest-stream: version $v is no longer retained — " +
            "the stream was down longer than the table's retention " +
            "window; re-seed from a fresh startingVersion", e)
      }
    delta match {
      case Some((adds, dels)) =>
        // adds -- deletes == the snapshot diff (invalidate-replace
        // entries appear in both halves — see deltaOf)
        adds.iterator.filterNot(kv => dels.contains(kv._1))
          .toArray.sortBy(_._1)
      case None =>
        val prev = filesAt(v - 1).keySet
        filesAt(v).iterator.filterNot(kv => prev.contains(kv._1))
          .toArray.sortBy(_._1)
    }
  }
  override protected def unitSize(
      u: (String, StatsManifest.FileStats)): (Long, Long) =
    (u._2.len, u._2.rows)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset]
    val e = end.asInstanceOf[VersionOffset]
    if (!(e > s)) return Array.empty
    val (maxV, added) = unitsInRange(s, e)
    guardSchemaDrift(maxV)
    if (!ignoreChanges) {
      // per-version tombstone attribution: a net-zero 'optimize'
      // commit (compaction / z-order, incl. auto-compaction) moves
      // rows between files without changing them — its tombstones are
      // exempt (and its adds are skipped in computeUnits); any OTHER
      // version that tombstoned files makes the range non-append-only
      var v = math.max(1L, s.version + 1L)
      while (v <= maxV) {
        val newlyRemoved =
          StatsManifest.removedAt(spark, dir, v) --
            (if (v <= 1L) Set.empty[String]
             else StatsManifest.removedAt(spark, dir, v - 1L))
        require(newlyRemoved.isEmpty ||
          StatsManifest.opAt(spark, dir, v).contains("optimize"),
          s"graft-manifest-stream: version $v tombstoned " +
            s"${newlyRemoved.size} file(s) — the table is " +
            "not append-only over this range. Use RowOps.changesStream " +
            "for CDC semantics, or ignoreChanges=true to stream just " +
            "the added files (rewritten rows will re-emit).")
        v += 1L
      }
    }
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val rootKey = StatsManifest.fileKey(fs.makeQualified(new Path(dir)))
    // file-level pruning, the streaming twin of the batch
    // ManifestFileIndex: an added file whose stats refute every pushed
    // filter never becomes a partition (refutation-only — missing
    // stats or unknown shapes keep the file)
    val kept =
      if (pushedExprs.isEmpty) added
      else added.filter { case (_, st) =>
        pushedExprs.forall(StatsManifest.mayMatch(_, st))
      }
    ManifestStreamSource.lastPlanTotal.set(added.length.toLong)
    ManifestStreamSource.lastPlanSelected.set(kept.length.toLong)
    kept.map { case (key, st) =>
      // file length comes from the manifest entry itself (carried at
      // write time) — offset→partitions is then a pure metadata read,
      // no per-added-file getFileStatus RPC per batch; pre-`flen`
      // manifests fall back to a live stat, which doubles as the
      // fail-loudly retention check (a vanished added file means
      // vacuum / physical rewrite outran the stream — emitting zero
      // rows would silently break exactly-once)
      val len = st.len match {
        case l if l >= 0L => l
        case _ =>
          val p = new Path(key)
          if (fs.exists(p)) fs.getFileStatus(p).getLen
          else throw new IllegalStateException(
            s"graft-manifest-stream: added file $key of versions " +
              s"(${s.version}, $maxV] no longer exists — the table " +
              "was vacuumed or " +
              "physically rewritten past the stream's position; re-seed " +
              "from a fresh startingVersion")
      }
      // Hive-partition values synthesize from the file's path, exactly
      // like the batch scan
      val partVals = ManifestStreamSource.partitionValues(spark,
        rootKey, key, partSchema)
      ManifestFilePartition(PartitionedFile(partVals,
        org.apache.spark.paths.SparkPath.fromPathString(key), 0L, len,
        Array.empty, 0L, len, Map.empty)): InputPartition
    }
  }

  // built ONCE per stream (the schema is pinned at start): a fresh
  // SessionState per micro-batch would be needless driver work
  private lazy val readerFactory: PartitionReaderFactory = {
    val dataSchema = StructType(tableSchema.filterNot(f =>
      partSchema.fieldNames.contains(f.name)))
    // row-based reader: the DSv2 row contract is per-record, and the
    // vectorized path's batches-as-rows cast is FileSourceScanExec-only
    val rowSession = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .newSession()
    rowSession.conf.set("spark.sql.parquet.enableVectorizedReader",
      "false")
    // readData (not dataSchema): projection pushdown — the parquet
    // reader materializes only the needed columns; translated filters
    // ride in for row-group skipping inside surviving files. A renamed
    // table reads through the name-mapping format (logical → physical
    // at the parquet boundary, positional rows unchanged).
    val nameMap = StatsManifest.nameMapOf(tableSchema)
    val fmt =
      if (nameMap.isEmpty) new ParquetFileFormat()
      else new GraftParquetFileFormat(nameMap)
    val readFunc = fmt.buildReaderWithPartitionValues(
      rowSession, dataSchema, partSchema, readData,
      parquetFilters, Map.empty, rowSession.sessionState
        .newHadoopConfWithOptions(Map.empty))
    // residual filter + final projection run per row on the executor;
    // skip the wrapper entirely when neither applies
    val identity = filterExpr.isEmpty &&
      readAttrs.map(_.exprId) == outAttrs.map(_.exprId)
    new ManifestStreamReaderFactory(readFunc,
      if (identity) None else Some((filterExpr, readAttrs, outAttrs)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    readerFactory

}

private final case class ManifestFilePartition(file: PartitionedFile)
    extends InputPartition

private final class ManifestStreamReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    /** (residual filter, reader row attrs, output attrs) — evaluated
      * per row ON THE EXECUTOR; the codegen'd predicate/projection are
      * built per partition from the serializable expressions. */
    residual: Option[(
      Option[org.apache.spark.sql.catalyst.expressions.Expression],
      Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      Seq[org.apache.spark.sql.catalyst.expressions.Attribute])])
    extends PartitionReaderFactory {
  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val raw = readFunc(p.asInstanceOf[ManifestFilePartition].file)
    val it = residual match {
      case None => raw
      case Some((fe, readAttrs, outAttrs)) =>
        val filtered = fe match {
          case Some(e) =>
            val pred = org.apache.spark.sql.catalyst.expressions
              .Predicate.create(e, readAttrs)
            raw.filter(pred.eval)
          case None => raw
        }
        val proj = org.apache.spark.sql.catalyst.expressions
          .UnsafeProjection.create(outAttrs, readAttrs)
        filtered.map(proj)
    }
    new PartitionReader[InternalRow] {
      override def next(): Boolean = it.hasNext
      override def get(): InternalRow = it.next()
      override def close(): Unit = raw match {
        case c: AutoCloseable => c.close()
        case _ => ()
      }
    }
  }
}

/** One emittable unit of the CDC stream: a file to read, tagged.
  * `kind` 0 = a precomputed change file (already in the CDC envelope
  * schema); 1 = a data file an append-only version added, emitted as
  * `insert` rows with the envelope synthesized. */
private final case class CdcUnit(path: String, len: Long, rows: Long,
    kind: Byte, version: Long)

private final case class CdcFilePartition(file: PartitionedFile,
    kind: Byte, version: Long) extends InputPartition

/** STREAMING changefeed with VERSION offsets (`readChangeFeed=true`):
  * the DSv2 twin of [[RowOps.changesStream]]. Each micro-batch emits
  * exactly the row-level changes of a version range — precomputed
  * change files where a row op landed them, added files as `insert`
  * rows for append-only versions (including version 1, so a fresh
  * stream starts with the table's initial snapshot as inserts), and
  * NOTHING for net-zero maintenance commits (`optimize`/`checkpoint`/
  * `schema`, told apart by the commit's `_op.txt` sidecar). A version
  * that dropped rows without leaving change files (a `cdf = false` op,
  * an `INSERT OVERWRITE`) fails LOUDLY — emitting a wrong or partial
  * feed silently is the one unacceptable outcome. Offsets, restart
  * semantics and the trigger limits are shared with the table stream
  * ([[VersionOffsetStream]]); `maxRowsPerTrigger` budgets BOTH unit
  * kinds — append versions from the manifest's per-file row counts,
  * change files from the count recorded in their NAME at CDC write
  * time (`…-r<rows>.parquet`; pre-r12 names read as unknown and are
  * bounded only by the files/bytes caps, warned once).
  *
  * Reference analogue: the changelog-emitting table sources
  * (`flink-table-common/…/connector/ChangelogMode.java`) — here the
  * changelog IS the version log's recorded deltas. */
private final class ManifestCdcStream(tableSchema: StructType,
    partSchema: StructType, dir: String, startingVersion: Long,
    limits: TriggerLimits,
    /** pushdown (r12): output table columns (projection — the envelope
      * always rides), the resolved residual filter over the full CDC
      * row, the shared attribute set it resolved against, and the
      * projected output schema. */
    selected: Seq[String],
    filterExpr: Option[Expression],
    cdcAttrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
    outSchema: StructType)
    extends VersionOffsetStream[CdcUnit](dir, startingVersion, limits) {

  private val fs = new Path(dir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)
  private val rootKey =
    StatsManifest.fileKey(fs.makeQualified(new Path(dir)))

  private val fullCdc = RowOps.cdcSchema(tableSchema)
  private def attrOf(n: String) = cdcAttrs(fullCdc.fieldIndex(n))
  private val envelope = Seq("_change_type", "_commit_version")

  private def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjunctsOf(l) ++ conjunctsOf(r)
    case x => Seq(x)
  }
  /** filter conjuncts over TABLE columns only — the shapes the
    * manifest can refute per added file of an append version (kind-1
    * units; change files carry no manifest stats). Envelope-referencing
    * conjuncts stay residual-only. */
  private val tableExprs: Seq[Expression] = filterExpr.toSeq
    .flatMap(conjunctsOf)
    .filter(_.references.forall(a =>
      tableSchema.fieldNames.contains(a.name)))

  /** Row-op kinds whose `cdf = true` commits are FOLLOWED by change
    * files (the CDC write lands moments after the manifest rename): a
    * live stream racing that window treats the version as pending
    * ([[CdcPendingException]] → retried next trigger) instead of
    * blocking the trigger thread or mis-reading the version. */
  private val CdfOps = Set("delete", "update", "merge", "upsert",
    "replace", "restore")

  /** probe units even for unbounded triggers: a racy version must
    * truncate the batch at offset time, not stall planInputPartitions. */
  override protected def probeUnitsAtLatest: Boolean = true

  /** version → first time its declared change files were found absent
    * (nanos) — the escalation clock from pending to lost. */
  private val pendingSince =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Long]()

  private def sidecarWaitMs: Long = {
    val raw = spark.conf.get("spark.graft.cdc.sidecarWaitMs", "30000")
    try {
      val v = raw.toLong
      require(v >= 0L)
      v
    } catch {
      case _: Exception => throw new IllegalArgumentException(
        "spark.graft.cdc.sidecarWaitMs must be a non-negative " +
          s"integer (millis), got '$raw'")
    }
  }

  /** warn once when maxRowsPerTrigger meets a change file whose name
    * predates the recorded row count (the budget under-enforces for
    * that unit — files/bytes caps still bound it). */
  @volatile private var warnedUnknownRows = false

  override protected def computeUnits(v: Long): Array[CdcUnit] = {
    def cdcUnits(): Array[CdcUnit] =
      RowOps.cdcFiles(fs, dir, v).map { p =>
        val q = fs.makeQualified(p)
        // row count from the file NAME (recorded at CDC write time) —
        // unitSize stays a pure metadata read; pre-r12 names read as
        // unknown (0: the rows budget can't see them)
        val rows = RowOps.cdcFileNameRows(q.getName).getOrElse {
          if (limits.maxRows.isDefined && !warnedUnknownRows) {
            warnedUnknownRows = true
            logWarning(s"graft-manifest-stream(readChangeFeed): $dir " +
              "has change files without a recorded row count " +
              "(written before r12) — maxRowsPerTrigger cannot bound " +
              "them; maxFiles/maxBytesPerTrigger still apply")
          }
          0L
        }
        CdcUnit(q.toString, fs.getFileStatus(q).getLen, rows, 0, v)
      }.sortBy(_.path).toArray
    val cdc = cdcUnits()
    if (cdc.nonEmpty) { pendingSince.remove(v); return cdc }
    val op = StatsManifest.opAt(spark, dir, v)
    if (op.exists(CdfOps.contains)) {
      // the commit DECLARED change files (no -nocdf marker) but they
      // have not landed yet — this trigger raced the op's CDC write.
      // Pending (not a sleep): offset resolution ends the batch before
      // this version and the next trigger retries; a persistent
      // absence past the wait window means a crash lost the files —
      // fail toward the backfill.
      val first = pendingSince.computeIfAbsent(v,
        _ => java.lang.Long.valueOf(System.nanoTime()))
      if (System.nanoTime() - first < sidecarWaitMs * 1000000L)
        throw new CdcPendingException(
          s"change files of version $v not landed yet")
      throw new IllegalStateException(
        "graft-manifest-stream(readChangeFeed): version " +
          s"$v (operation '${op.get}') declared change files that " +
          "never landed (a crash between the commit and the CDC " +
          "write?) — backfill this range with RowOps.changes and " +
          "restart from a later startingVersion")
    }
    // adds/dropped from the version's OWN delta content when it has
    // one (O(delta), no fold — see deltaOf); checkpoint slots diff
    // cached snapshots
    val (adds, dropped) =
      (try StatsManifest.deltaOf(spark, dir, v)
       catch {
         case e: Exception => throw new IllegalStateException(
           s"graft-manifest-stream: version $v is no longer retained " +
             "— the stream was down longer than the table's retention " +
             "window; re-seed from a fresh startingVersion", e)
       }) match {
        case Some((da, dels)) =>
          (da.iterator.filterNot(kv => dels.contains(kv._1))
            .toArray.sortBy(_._1),
            dels.exists(k => !da.contains(k)))
        case None =>
          val prev = filesAt(v - 1)
          val cur = filesAt(v)
          (cur.iterator.filterNot(kv => prev.contains(kv._1))
            .toArray.sortBy(_._1),
            prev.keySet.exists(k => !cur.contains(k)))
      }
    if (!dropped && adds.isEmpty) Array.empty[CdcUnit]
    else op match {
      // net-zero maintenance: files moved, rows didn't change
      case Some("optimize") | Some("checkpoint") =>
        Array.empty[CdcUnit]
      case _ if !dropped =>
        // append-only version (including a cdf=false op that only
        // added files): the added rows ARE the change set. Pushed
        // table-column filters refute whole added files by manifest
        // stats BEFORE they become units (refutation-only — a dropped
        // file provably holds no row the residual would keep).
        val kept =
          if (tableExprs.isEmpty) adds
          else adds.filter { case (_, st) =>
            tableExprs.forall(StatsManifest.mayMatch(_, st))
          }
        if (tableExprs.nonEmpty) {
          ManifestStreamSource.lastPlanTotal.set(adds.length.toLong)
          ManifestStreamSource.lastPlanSelected.set(kept.length.toLong)
        }
        kept.map { case (k, st) =>
          val len =
            if (st.len >= 0L) st.len
            else {
              val p = new Path(k)
              if (fs.exists(p)) fs.getFileStatus(p).getLen
              else throw new IllegalStateException(
                s"graft-manifest-stream(readChangeFeed): added file " +
                  s"$k of version $v no longer exists — vacuumed " +
                  "past the stream's position; re-seed from a fresh " +
                  "startingVersion")
            }
          CdcUnit(k, len, st.rows, 1, v)
        }
      case other => throw new IllegalStateException(
        "graft-manifest-stream(readChangeFeed): version " +
          s"$v (operation '${other.getOrElse("unknown")}') dropped " +
          "rows without precomputed change files — run row ops with " +
          "cdf = true, or backfill this range with RowOps.changes " +
          "and restart from a later startingVersion")
    }
  }

  override protected def unitSize(u: CdcUnit): (Long, Long) =
    (u.len, u.rows)

  override def commit(end: Offset): Unit = {
    super.commit(end)
    val v = end.asInstanceOf[VersionOffset].version
    pendingSince.keySet.removeIf(k => k <= v)
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset]
    val e = end.asInstanceOf[VersionOffset]
    if (!(e > s)) return Array.empty
    // the offset range is already fixed (WAL) — a batch being REPLANNED
    // (recovery replay) may transiently race a CDC write it originally
    // saw complete; retry briefly here, where waiting is semantically
    // required. computeUnits escalates to the loud lost-files error
    // past the wait window, so the loop terminates.
    val (maxV, units) = {
      var out: (Long, Array[CdcUnit]) = null
      while (out == null) {
        try out = unitsInRange(s, e)
        catch { case _: CdcPendingException => Thread.sleep(100L) }
      }
      out
    }
    guardSchemaDrift(maxV)
    units.map { u =>
      val partVals =
        if (u.kind == 0) InternalRow.empty
        else ManifestStreamSource.partitionValues(spark, rootKey,
          u.path, partSchema)
      CdcFilePartition(PartitionedFile(partVals,
        org.apache.spark.paths.SparkPath.fromPathString(u.path), 0L,
        u.len, Array.empty, 0L, u.len, Map.empty),
        u.kind, u.version): InputPartition
    }
  }

  // built ONCE per stream: two row-based parquet read functions — the
  // CDC envelope files (flat, partition columns materialized as data)
  // and the table's data files (envelope synthesized per row). Both
  // read ONLY the needed columns (output projection + residual refs)
  // and take the translatable filter conjuncts for parquet row-group
  // skipping; the residual evaluates exactly per row on the executor.
  private lazy val readerFactory: PartitionReaderFactory = {
    val rowSession = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .newSession()
    rowSession.conf.set("spark.sql.parquet.enableVectorizedReader",
      "false")
    val refs = filterExpr.toSeq
      .flatMap(_.references.toSeq.map(_.name)).toSet
    val needed = (selected ++ refs ++ envelope).toSet
    // change files: flat CDC rows (partition cols materialized) — read
    // the needed subset in fullCdc order
    val cdcReadSchema = StructType(fullCdc.filter(f =>
      needed.contains(f.name)))
    val cdcParquetFilters = filterExpr.toSeq.flatMap(conjunctsOf)
      .flatMap(StatsManifest.catalystToFilter)
    // one hadoopConf PER reader: buildReaderWithPartitionValues writes
    // its requested schema into the conf it is given, so sharing one
    // conf would make the second build's schema clobber the first's.
    // Renamed tables read through the name-mapping format (change
    // files carry physical data-column names like the data files).
    val nameMap = StatsManifest.nameMapOf(tableSchema)
    def fmt() =
      if (nameMap.isEmpty) new ParquetFileFormat()
      else new GraftParquetFileFormat(nameMap)
    val cdcRead = fmt().buildReaderWithPartitionValues(
      rowSession, fullCdc, new StructType(), cdcReadSchema,
      cdcParquetFilters, Map.empty,
      rowSession.sessionState.newHadoopConfWithOptions(Map.empty))
    val dataSchema = StructType(tableSchema.filterNot(f =>
      partSchema.fieldNames.contains(f.name)))
    val insReadSchema = StructType(dataSchema.filter(f =>
      needed.contains(f.name)))
    val insParquetFilters = tableExprs
      .filter(_.references.forall(a =>
        dataSchema.fieldNames.contains(a.name)))
      .flatMap(StatsManifest.catalystToFilter)
    val insRead = fmt().buildReaderWithPartitionValues(
      rowSession, dataSchema, partSchema, insReadSchema,
      insParquetFilters, Map.empty,
      rowSession.sessionState.newHadoopConfWithOptions(Map.empty))
    // per-kind row layouts (attribute instances shared with filterExpr
    // by construction — same cdcAttrs), and the common output
    val in0 = cdcReadSchema.fieldNames.toSeq.map(attrOf)
    val in1 = insReadSchema.fieldNames.toSeq.map(attrOf) ++
      partSchema.fieldNames.toSeq.map(attrOf) ++ envelope.map(attrOf)
    val outAttrs = outSchema.fieldNames.toSeq.map(attrOf)
    val identity = filterExpr.isEmpty &&
      in0.map(_.exprId) == outAttrs.map(_.exprId)
    new CdcReaderFactory(cdcRead, insRead, filterExpr, in0, in1,
      outAttrs, identity)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    readerFactory
}

private final class CdcReaderFactory(
    cdcRead: PartitionedFile => Iterator[InternalRow],
    insRead: PartitionedFile => Iterator[InternalRow],
    /** residual filter over the full CDC row — exact semantics after
      * file refutation and row-group skipping (both best-effort). */
    filterExpr: Option[
      org.apache.spark.sql.catalyst.expressions.Expression],
    /** row layout of a change-file read (needed columns, fullCdc
      * order). */
    in0: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
    /** row layout of an insert read AFTER envelope synthesis: needed
      * data columns ++ partition columns ++ envelope. */
    in1: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
    outAttrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
    /** no filter, no projection — kind 0 passes through raw, kind 1
      * only synthesizes the envelope (the pre-pushdown fast path). */
    identity: Boolean)
    extends PartitionReaderFactory {
  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Predicate,
      UnsafeProjection}
    val cp = p.asInstanceOf[CdcFilePartition]
    val raw = if (cp.kind == 0) cdcRead(cp.file) else insRead(cp.file)
    // kind 1 first synthesizes the envelope: _change_type = 'insert',
    // _commit_version = the version that added this file
    val withEnvelope =
      if (cp.kind == 0) raw
      else {
        val dataPart = in1.dropRight(2)
        val proj = UnsafeProjection.create(
          dataPart ++ Seq(
            Literal(org.apache.spark.unsafe.types.UTF8String
              .fromString("insert"),
              org.apache.spark.sql.types.StringType),
            Literal(cp.version,
              org.apache.spark.sql.types.LongType)),
          dataPart)
        raw.map(proj)
      }
    val it =
      if (identity) withEnvelope
      else {
        val inAttrs = if (cp.kind == 0) in0 else in1
        val filtered = filterExpr match {
          case Some(e) =>
            val pred = Predicate.create(e, inAttrs)
            withEnvelope.filter(pred.eval)
          case None => withEnvelope
        }
        val proj = UnsafeProjection.create(outAttrs, inAttrs)
        filtered.map(proj)
      }
    new PartitionReader[InternalRow] {
      override def next(): Boolean = it.hasNext
      override def get(): InternalRow = it.next()
      override def close(): Unit = raw match {
        case c: AutoCloseable => c.close()
        case _ => ()
      }
    }
  }
}

private object ManifestCdcStream {
  /** The `readChangeFeed=true` ScanBuilder (shared by the data-source
    * and catalog front doors), with the same option-borne pushdown as
    * the table stream: `pushColumns` projects the table columns (the
    * envelope always rides), `pushFilter` refutes whole added files of
    * append versions by manifest stats, row-group-skips inside change
    * AND data files via the translatable conjuncts, and re-applies
    * exactly per row as a residual — so `_change_type = 'delete'`
    * works too (envelope-referencing conjuncts are residual-only). */
  def scanBuilder(dir: String, startingVersion: Long,
      limits: TriggerLimits, pushColumnsOpt: Option[String] = None,
      pushFilterSql: Option[String] = None): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        val spark = SparkSession.active
        val (fullDf, idx) = StatsManifest.scanWithIndex(spark, dir)
        val tableSchema = fullDf.schema
        val partSchema = idx.partitionSchema
        val fullCdc = RowOps.cdcSchema(tableSchema)
        val cdcAttrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
          .toAttributes(fullCdc)
        val selected: Seq[String] = pushColumnsOpt match {
          case Some(cs) =>
            val names = cs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            val missing = names.filterNot(tableSchema.fieldNames.contains)
            require(missing.isEmpty,
              "graft-manifest-stream: pushColumns not in the table " +
                s"schema: ${missing.mkString(", ")}")
            names
          case None => tableSchema.fieldNames.toSeq
        }
        val filterExpr = pushFilterSql.map(
          ManifestStreamSource.resolvePushFilter(spark, _, cdcAttrs))
        val out = StructType(fullCdc.filter(f =>
          selected.contains(f.name) ||
            f.name == "_change_type" || f.name == "_commit_version"))
        new Scan {
          override def readSchema(): StructType = out
          override def toMicroBatchStream(
              checkpointLocation: String): MicroBatchStream =
            new ManifestCdcStream(tableSchema, partSchema, dir,
              startingVersion, limits, selected, filterExpr, cdcAttrs,
              out)
        }
      }
    }
}
