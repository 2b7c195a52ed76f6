package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}

import graft.sources.{RowOps, StatsManifest}

/** Read-side SQL surfaces of the lakehouse layer:
  *
  * {{{
  *   SELECT … FROM t VERSION AS OF 3            -- snapshot by version
  *   SELECT … FROM t TIMESTAMP AS OF '<ts>'     -- newest commit ≤ ts
  *   SELECT * FROM graft_changes('t', 1, 4)     -- row-level changefeed
  *   SELECT * FROM graft_changes('t', 2)        -- …to the latest version
  * }}}
  *
  * Time travel rides Spark's own parsed `RelationTimeTravel` node. It
  * must be claimed BEFORE the main Resolution batch — `ResolveRelations`
  * throws UNSUPPORTED_FEATURE.TIME_TRAVEL for v1 relations rather than
  * leaving the node unresolved, so an ordinary injected resolution rule
  * never sees it. [[GraftTimeTravelRule]] therefore runs in the earlier
  * hint-resolution batch (`injectHintResolutionRule`) and only claims
  * targets that resolve to graft-manifest relations; everything else
  * keeps Spark's resolution and its errors.
  *
  * The changefeed TVF registers through `injectTableFunction`, i.e. the
  * session's table-function registry — no rule-ordering race at all.
  * Reference analogue: the reference's changelog is SQL-native end to
  * end (`flink-table-planner-blink/…/operations/SqlToOperationConverter
  * .java` routes table functions); here the stored table's changefeed
  * reads back the same way. */
object GraftTimeTravel {

  /** Directory behind a (possibly qualified) table NAME, when it
    * resolves to a graft-manifest relation. */
  private def manifestedDirOfName(spark: SparkSession,
      name: String): Option[String] =
    try GraftDml.manifestedDir(
      spark.table(name).queryExecution.analyzed).map(_._1)
    catch { case _: Exception => None }

  private[engine] def dirOf(spark: SparkSession,
      parts: Seq[String]): Option[String] =
    manifestedDirOfName(spark, parts.mkString("."))

  /** The version a `TIMESTAMP AS OF t` resolves to: the newest commit
    * at or before t (commit wall times from the version log). */
  private[engine] def versionAtTimestamp(spark: SparkSession, dir: String,
      ts: Expression): Long = {
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    val micros = Cast(ts, TimestampType, Some(zone)).eval() match {
      case l: java.lang.Long => l.longValue()
      case _ => throw new IllegalArgumentException(
        s"graft time travel: cannot read ${ts.sql} as a timestamp")
    }
    StatsManifest.versionAtMillis(spark, dir,
      Math.floorDiv(micros, 1000L), ts.sql)
  }

  /** Resolved snapshot relation at `version` — the same pruning
    * `ManifestFileIndex` scan every manifested read gets. */
  private[engine] def snapshotPlan(spark: SparkSession, dir: String,
      version: Long): LogicalPlan =
    spark.read.format("graft-manifest").option("path", dir)
      .option("version", version.toString).load()
      .queryExecution.analyzed

  /** A changefeed bound: a literal version number, or a literal
    * timestamp STRING resolved to the newest version committed at or
    * before it — the same commit-wall-time rule as `TIMESTAMP AS OF`,
    * so `graft_changes(t, '<ts1>', '<ts2>')` reads "what changed
    * between these two instants". */
  private def evalBound(spark: SparkSession, dir: String, e: Expression,
      what: String): Long = e match {
    // a pure-integer string ('3') reads as a version, anything else as
    // a timestamp — mirrors VERSION AS OF vs TIMESTAMP AS OF
    case Literal(s, StringType) if s != null &&
        !s.toString.forall(_.isDigit) =>
      StatsManifest.versionAtMillis(spark, dir,
        StatsManifest.parseTsMillis(spark, s.toString), s.toString)
    case Literal(v, _) if v != null => v.toString.toLong
    case other => throw new IllegalArgumentException(
      s"graft_changes: $what must be a literal version or timestamp " +
        s"string, got ${other.sql}")
  }

  /** Builder for `injectTableFunction`:
    * graft_changes(table, from[, to]) — bounds are versions or
    * timestamp strings (mixable). */
  def changesTvf(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      "graft_changes(table, from[, to]): wrong arity")
    val spark = SparkSession.active
    val tbl = args.head match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_changes: table must be a string literal, got ${other.sql}")
    }
    val dir = manifestedDirOfName(spark, tbl).getOrElse(
      throw new IllegalArgumentException(
        s"graft_changes: $tbl is not a graft-manifest table"))
    val from = evalBound(spark, dir, args(1), "from")
    val to = args.lift(2).map(evalBound(spark, dir, _, "to")).getOrElse(
      StatsManifest.latestVersion(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"graft_changes: $tbl has no committed versions")))
    RowOps.changes(spark, dir, from, to).queryExecution.analyzed
  }

  /** Builder for `injectTableFunction`: `graft_files('t')` — the
    * file-level observability feed every lakehouse audit starts from,
    * straight off the manifest (no data file opens): per LIVE file its
    * key, Hive-partition subpath ('' for flat layouts), row count,
    * byte length (−1 for pre-flen manifests), the manifest version
    * whose dir holds its entry (exact for delta-chain entries; a
    * checkpoint-folded entry reads the checkpoint's slot — "added at
    * or before"), and the per-column min/max/count stats as a TYPED
    * struct — `WHERE stats.min_k >= 150` composes directly, no
    * get_json_object (r13; blooms omitted: binary). Field names drop
    * the manifest's internal domain tag: `lmin__k` → `min_k`,
    * `cnt__k` → `cnt_k`, `sum__k` → `sum_k`. */
  def filesTvf(args: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.functions.{col, regexp_extract,
      regexp_replace, struct}
    require(args.length == 1,
      "graft_files(table): wrong arity")
    val spark = SparkSession.active
    val tbl = args.head match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_files: table must be a string literal, got ${other.sql}")
    }
    val dir = manifestedDirOfName(spark, tbl).getOrElse(
      throw new IllegalArgumentException(
        s"graft_files: $tbl is not a graft-manifest table"))
    val entries = StatsManifest.entriesWithVersion(spark, dir)
    val statCols = entries.schema.fieldNames.filterNot(n =>
      n == "file" || n == "rows" || n == "flen" ||
        n == "version_entry" || n.startsWith("bloom__"))
    val rootKey = StatsManifest.fileKey(
      new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
        .makeQualified(new org.apache.hadoop.fs.Path(dir)))
    val rel = regexp_replace(col("file"),
      "^" + java.util.regex.Pattern.quote(rootKey + "/"), "")
    def statField(n: String): String = n match {
      case x if x.startsWith("lmin__") || x.startsWith("dmin__") ||
        x.startsWith("smin__") => "min_" + x.drop(6)
      case x if x.startsWith("lmax__") || x.startsWith("dmax__") ||
        x.startsWith("smax__") => "max_" + x.drop(6)
      case x if x.startsWith("sum__") => "sum_" + x.drop(5)
      case x if x.startsWith("cnt__") => "cnt_" + x.drop(5)
      case x => x.replace("__", "_")
    }
    entries.select(
      col("file"),
      regexp_extract(rel, "^(.*)/[^/]*$", 1).as("partition"),
      col("rows"),
      col("flen").as("bytes"),
      col("version_entry").as("version_added"),
      struct(statCols.map(n =>
        col(n).as(statField(n))).toIndexedSeq: _*).as("stats"))
      .queryExecution.analyzed
  }
}

/** Hint-batch rule claiming `VERSION AS OF` / `TIMESTAMP AS OF` on
  * manifested tables (see [[GraftTimeTravel]] for why this batch). */
final case class GraftTimeTravelRule(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import GraftTimeTravel._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case tt: RelationTimeTravel =>
        (tt.relation match {
          case u: UnresolvedRelation =>
            GraftTimeTravel.dirOf(spark, u.multipartIdentifier)
          case _ => None
        }) match {
          case Some(dir) =>
            val v = tt.version match {
              case Some(s) => s.toLong
              case None => versionAtTimestamp(spark, dir, tt.timestamp.get)
            }
            snapshotPlan(spark, dir, v)
          case None => tt
        }
    }
}
