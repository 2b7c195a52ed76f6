package graft.engine

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.operators.Layout
import graft.sources.StatsManifest

/** SQL maintenance statements for manifested tables, grafted onto the
  * parser chain (same seam as the MATCH_RECOGNIZE surface):
  *
  * {{{
  *   OPTIMIZE t ZORDER BY (a, b)   -- full re-cluster, deferDelete commit
  *   OPTIMIZE t                    -- compact the small-file tail only
  *   VACUUM t RETAIN 3 VERSIONS    -- expire old versions + reclaim bytes
  * }}}
  *
  * Both OPTIMIZE forms commit through the atomic tombstone+adopt path
  * (snapshots keep working across the rewrite; VACUUM is what finally
  * reclaims superseded bytes), return (files_before, files_written),
  * and refresh the table's cached relation. The table must resolve to a
  * graft-manifest relation — anything else fails loudly. Reference
  * analogue: maintenance DDL enters the reference through the same
  * statement-converter seam as DML
  * (`flink-table-planner-blink/…/operations/SqlToOperationConverter.java`). */
object GraftMaintenance {

  // anchored, case-insensitive full-statement patterns — anything that
  // doesn't match EXACTLY falls through to the delegate parser
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+([\w.`]+)\s*(?:ZORDER\s+BY\s*""" +
      """\(([^)]*)\))?\s*(?:WHERE\s+(.+?))?\s*;?\s*""").r
  // WHERE scope: conjunctions of equality on partition columns (the
  // Delta OPTIMIZE-WHERE restriction) — `p = 1 AND q = 'x'`
  private val WhereEqRe =
    """(?i)\s*(\w+)\s*=\s*(?:'([^']*)'|([\w.\-]+))\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+([\w.`]+)\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS|DAYS)\s*;?\s*""".r
  private val HistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.`]+)\s*;?\s*""".r
  private val RestoreRe =
    ("""(?is)\s*RESTORE\s+TABLE\s+([\w.`]+)\s+TO\s+""" +
      """(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+""" +
      """'([^']+)')\s*;?\s*""").r
  private val AddConstraintRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+CONSTRAINT\s+""" +
      """(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val DropConstraintRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+CONSTRAINT\s+""" +
      """(IF\s+EXISTS\s+)?(\w+)\s*;?\s*""").r
  private val DetailRe =
    """(?is)\s*DESCRIBE\s+DETAIL\s+([\w.`]+)\s*;?\s*""".r

  private def ident(s: String): String = s.replace("`", "")

  /** refreshByPath invalidates the scan state; refreshTable is
    * best-effort — graft-catalog (v2) idents resolve to a FRESH scan
    * per query anyway, and Spark's classic Catalog.refreshTable cannot
    * walk every v2 ident shape. */
  private def refreshTarget(spark: SparkSession, dir: String,
      table: String): Unit = {
    spark.catalog.refreshByPath(dir)
    try spark.catalog.refreshTable(table)
    catch { case _: Exception => () }
  }

  /** The manifested dir behind a catalog table name (resolved through
    * the session's analyzer — same path a query takes). */
  private def dirOf(spark: SparkSession, table: String): String =
    GraftDml.manifestedDir(
      spark.table(table).queryExecution.analyzed) match {
      case Some((dir, _)) => dir
      case None => throw new IllegalArgumentException(
        s"graft OPTIMIZE/VACUUM: $table is not a graft-manifest table")
    }

  final case class GraftOptimizeCommand(table: String,
      zorderBy: Seq[String],
      where: Seq[(String, String)] = Nil) extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("files_before", IntegerType, nullable = false)(),
      AttributeReference("files_written", IntegerType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val dir = dirOf(spark, table)
      val (before, after) =
        if (where.nonEmpty) {
          // partition-scoped compaction (r13): a backfill recompacts
          // exactly the partitions it touched, O(scoped bytes) — at
          // 100 TB a table-wide pass for one day's partition is the
          // difference between minutes and a full-corpus rewrite.
          // Rides autoCompact's manifest-driven bin-pack (rename-first
          // crash protocol, deferDelete commit, rebase-safe).
          require(zorderBy.isEmpty,
            "graft OPTIMIZE: ZORDER BY cannot combine with WHERE — " +
              "z-ordering is a table-wide layout; run it unscoped")
          val partCols = StatsManifest.tablePartitionCols(spark, dir)
          val bad = where.map(_._1).filterNot(n =>
            partCols.exists(_.equalsIgnoreCase(n)))
          require(bad.isEmpty,
            "graft OPTIMIZE WHERE: only partition-column equality is " +
              s"supported; ${bad.mkString(", ")} is not a partition " +
              s"column (table partitions: ${partCols.mkString(", ")})")
          Layout.autoCompact(spark, dir, minFiles = 2,
            targetBytes = 128L << 20, partitionSpec = where.map {
              case (n, v) =>
                partCols.find(_.equalsIgnoreCase(n)).get -> v
            })
        } else if (zorderBy.nonEmpty)
          Layout.optimize(spark, dir, zorderBy, deferDelete = true)
        else {
          val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
          Layout.compactSmall(spark, dir, sc, bloomCols = bc,
            deferDelete = true)
        }
      refreshTarget(spark, dir, table)
      Seq(Row(before, after))
    }
  }

  /** `RETAIN n VERSIONS` keeps a version count; `RETAIN n HOURS|DAYS`
    * keeps the time-travel WINDOW (every version committed within the
    * last n hours/days, the latest always) — the retention contract a
    * deployment actually states ("7 days of time travel", Delta's own
    * VACUUM convention) as opposed to a count that drifts with commit
    * cadence. */
  final case class GraftVacuumCommand(table: String,
      keep: Int, unit: String = "VERSIONS") extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("versions_expired", IntegerType,
        nullable = false)(),
      AttributeReference("versions_kept", LongType, nullable = false)(),
      AttributeReference("orphans_deleted", IntegerType,
        nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val dir = dirOf(spark, table)
      val keepVersions = unit match {
        case "VERSIONS" => keep
        case hd =>
          val ms = keep.toLong * (if (hd == "HOURS") 3600000L
            else 86400000L)
          val cutoff = System.currentTimeMillis() - ms
          // versions committed inside the window stay; the latest
          // always survives (expire requires keep >= 1). Count only
          // the TRAILING run at or past the cutoff: commit times are
          // monotone for sidecar-stamped versions, but a pre-sidecar
          // version's mtime can be perturbed by retro-materialization
          // — a non-trailing "recent" version must not inflate the
          // kept count (expire drops oldest-first, so the kept set is
          // always the trailing run).
          math.max(1, StatsManifest.commitTimes(spark, dir).reverse
            .takeWhile(_._2 >= cutoff).length)
      }
      val n = StatsManifest.expire(spark, dir, keepVersions)
      // crashed-compaction orphans (rename-first protocol) reclaim on
      // the same cadence as superseded snapshot bytes
      val orphans = StatsManifest.vacuumOrphans(spark, dir)
      refreshTarget(spark, dir, table)
      Seq(Row(n, StatsManifest.versions(spark, dir).length.toLong,
        orphans))
    }
  }

  /** DESCRIBE DETAIL t — the one-row operational summary a table
    * owner checks before/after maintenance (Delta ships the same
    * statement shape): location, retained version window, live
    * file/row/byte totals, partition columns. Bytes come from one
    * O(files) driver-side listing of the LIVE file set — the
    * lakehouse-log cost shape, never a data scan. */
  final case class GraftDetailCommand(table: String)
      extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("format", org.apache.spark.sql.types.StringType,
        nullable = false)(),
      AttributeReference("location", org.apache.spark.sql.types.StringType,
        nullable = false)(),
      AttributeReference("current_version", LongType, nullable = false)(),
      AttributeReference("oldest_retained_version", LongType,
        nullable = false)(),
      AttributeReference("num_files", LongType, nullable = false)(),
      AttributeReference("num_rows", LongType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("partition_columns",
        org.apache.spark.sql.types.StringType, nullable = false)(),
      AttributeReference("properties",
        org.apache.spark.sql.types.StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val dir = dirOf(spark, table)
      val vs = StatsManifest.versions(spark, dir)
      val stats = StatsManifest.read(spark, dir)
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bytes = stats.keysIterator.map { k =>
        val fp = new org.apache.hadoop.fs.Path(k)
        if (fs.exists(fp)) fs.getFileStatus(fp).getLen else 0L
      }.sum
      val partCols = StatsManifest.scanWithIndex(spark, dir)
        ._2.partitionSchema.fieldNames.mkString(",")
      // the table-owner-visible policy surface: every sidecar property
      // except the layout keys already shown in their own columns
      val props = StatsManifest.tableProps(spark, dir)
        .filterNot { case (k, _) => k == "partitionCols" }
        .toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(";")
      Seq(Row("graft-manifest", dir, vs.last, vs.head,
        stats.size.toLong, stats.valuesIterator.map(_.rows).sum,
        bytes, partCols, props))
    }
  }

  /** `RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts'` —
    * the write half of time travel (Delta ships the same statement):
    * commits a new version whose live set/schema/manifest are exactly
    * the target's, history intact, CDC fed with the netted diff.
    * Timestamp binds to the newest commit at or before it — the same
    * resolution `TIMESTAMP AS OF` reads use. */
  final case class GraftRestoreCommand(table: String,
      version: Option[Long], timestamp: Option[String])
      extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("restored_to_version", LongType,
        nullable = false)(),
      AttributeReference("new_version", LongType, nullable = false)(),
      AttributeReference("files_reinstated", LongType,
        nullable = false)(),
      AttributeReference("files_dropped", LongType, nullable = false)(),
      AttributeReference("rows_reinstated", LongType,
        nullable = false)(),
      AttributeReference("rows_dropped", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val dir = dirOf(spark, table)
      val toV = version.getOrElse {
        val ts = timestamp.get
        StatsManifest.versionAtMillis(spark, dir,
          StatsManifest.parseTsMillis(spark, ts), ts)
      }
      val r = graft.sources.RowOps.restore(spark, dir, toV)
      refreshTarget(spark, dir, table)
      Seq(Row(r.restoredTo, r.newVersion, r.filesReinstated,
        r.filesDropped, r.rowsReinstated, r.rowsDropped))
    }
  }

  /** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` — install a
    * write-path CHECK constraint (graft.sources.Constraints): existing
    * rows validate first (loud with a sample), every subsequent write
    * path enforces inline. `DROP CONSTRAINT [IF EXISTS] name`
    * removes. */
  final case class GraftAddConstraintCommand(table: String,
      name: String, check: String) extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq.empty
    override def run(spark: SparkSession): Seq[Row] = {
      val dir = dirOf(spark, table)
      graft.sources.Constraints.add(spark, dir, name, check)
      refreshTarget(spark, dir, table)
      Seq.empty
    }
  }

  final case class GraftDropConstraintCommand(table: String,
      name: String, ifExists: Boolean) extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq.empty
    override def run(spark: SparkSession): Seq[Row] = {
      val dir = dirOf(spark, table)
      graft.sources.Constraints.drop(spark, dir, name, ifExists)
      refreshTarget(spark, dir, table)
      Seq.empty
    }
  }

  final case class GraftHistoryCommand(table: String)
      extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("operation",
        org.apache.spark.sql.types.StringType, nullable = false)(),
      AttributeReference("files", LongType, nullable = false)(),
      AttributeReference("rows", LongType, nullable = false)(),
      AttributeReference("committed_at",
        org.apache.spark.sql.types.TimestampType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val dir = dirOf(spark, table)
      StatsManifest.history(spark, dir).map(v =>
        Row(v.version, v.op, v.files, v.rows,
          new java.sql.Timestamp(v.committedAtMs)))
    }
  }

  /** Does `table` resolve to a graft-manifest relation in the active
    * session? Other products ship the SAME maintenance syntax (Delta's
    * OPTIMIZE/ZORDER/VACUUM is identical), so the hook must only CLAIM
    * a statement whose target is ours and let everything else flow to
    * the delegate chain — erroring on a foreign table would break
    * coexistence with whichever extension owns it. Resolution failures
    * (unknown table, unresolvable relation) also fall through: the
    * delegate produces its own, correct, error. */
  private def targetIsManifested(table: String): Boolean =
    SparkSession.getActiveSession.exists { spark =>
      try GraftDml.manifestedDir(
        spark.table(table).queryExecution.analyzed).isDefined
      catch { case _: Exception => false }
    }

  /** The parser hook: intercept the maintenance statements whose target
    * is a graft-manifest table, delegate everything else untouched. */
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case OptimizeRe(tbl, cols, whereTxt)
        if targetIsManifested(ident(tbl)) =>
      val zs = Option(cols).map(_.split(",").map(c => ident(c.trim))
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
      val where = Option(whereTxt).map { w =>
        w.split("(?i)\\bAND\\b").toSeq.map {
          case WhereEqRe(n, q, bare) =>
            n -> Option(q).getOrElse(bare)
          case other => throw new IllegalArgumentException(
            "graft OPTIMIZE WHERE: only `col = value [AND ...]` on " +
              s"partition columns is supported, got '${other.trim}'")
        }
      }.getOrElse(Nil)
      Some(GraftOptimizeCommand(ident(tbl), zs, where))
    case VacuumRe(tbl, n, unit) if targetIsManifested(ident(tbl)) =>
      Some(GraftVacuumCommand(ident(tbl), n.toInt,
        unit.toUpperCase(java.util.Locale.ROOT)))
    case HistoryRe(tbl) if targetIsManifested(ident(tbl)) =>
      Some(GraftHistoryCommand(ident(tbl)))
    case DetailRe(tbl) if targetIsManifested(ident(tbl)) =>
      Some(GraftDetailCommand(ident(tbl)))
    case RestoreRe(tbl, v, ts) if targetIsManifested(ident(tbl)) =>
      Some(GraftRestoreCommand(ident(tbl), Option(v).map(_.toLong),
        Option(ts)))
    case AddConstraintRe(tbl, name, check)
        if targetIsManifested(ident(tbl)) =>
      Some(GraftAddConstraintCommand(ident(tbl), name, check.trim))
    case DropConstraintRe(tbl, ifEx, name)
        if targetIsManifested(ident(tbl)) =>
      Some(GraftDropConstraintCommand(ident(tbl), name,
        ifEx != null))
    case _ => None
  }
}

/** Delegating parser wrapping [[GraftMaintenance.parse]]. */
final class GraftMaintenanceParser(delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMaintenance.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
}
