package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.StatsManifest
import graft.sources.StatsManifest.{ColStats, FileStats, ManifestFileIndex}

/** Metadata-only aggregates over manifested scans: a global
  * `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` on a
  * [[StatsManifest.scan]] relation is answered from the per-file stats
  * the manifest already holds — the optimizer replaces the whole
  * Aggregate+Scan with a [[LocalRelation]] and ZERO tasks launch.
  *
  * This is the manifest-stats analogue of Spark's own
  * `OptimizeMetadataOnlyQuery` (which serves aggregates over PARTITION
  * columns from the catalog) and of a lakehouse engine answering
  * `SELECT count(*)` from its transaction-log file stats; the reference
  * exposes the same idea as scan-ability contracts
  * (`flink-table-common/…/source/abilities/SupportsAggregatePushDown.java`)
  * — here the pushdown terminus is the manifest, not the scan. At
  * 100 TB the difference is a driver map fold versus ~100k scan tasks
  * for every `count(*)` sanity probe a pipeline runs.
  *
  * Safety gates — the rewrite fires only when it provably equals the
  * scan it replaces:
  *  - every file the scan would list has a manifest entry (a file
  *    appended after the last manifest write → no rewrite, the query
  *    runs normally and stays correct);
  *  - no Filter below the Aggregate, no grouping keys, no DISTINCT
  *    counts, no agg-level FILTER clauses;
  *  - MIN/MAX only on columns whose attribute type matches the stats
  *    domain exactly, with the fold running IN that domain (long /
  *    double / UTF8-binary string) and converted back — domains were
  *    chosen order-exact so min/max commute with the projection;
  *  - only deterministic result expressions over the aggregates
  *    (`count(*) + 1` folds fine; anything referencing rows bails).
  *
  * NULL semantics match Spark's: `count(col)` sums the manifest's
  * per-file non-null counts; MIN/MAX skip all-null files and return
  * NULL when every file is all-null or the table is empty; `count(*)`
  * on an empty directory returns one row of 0.
  */
object ManifestMetadataOnly extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.forall(_.deterministic) =>
      manifestIndexOf(agg.child)
        .flatMap(rewrite(agg.aggregateExpressions, _))
        .getOrElse(agg)
  }

  /** The scan's ManifestFileIndex, when `plan` is exactly a manifested
    * file relation under nothing but column-pruning Projects. */
  private def manifestIndexOf(plan: LogicalPlan): Option[ManifestFileIndex] =
    plan match {
      case Project(projs, child) if projs.forall(_.isInstanceOf[Attribute]) =>
        manifestIndexOf(child)
      case lr: LogicalRelation =>
        lr.relation match {
          case fsRel: HadoopFsRelation =>
            fsRel.location match {
              case idx: ManifestFileIndex => Some(idx)
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }

  private def rewrite(aggExprs: Seq[NamedExpression],
      idx: ManifestFileIndex): Option[LogicalPlan] = {
    // coverage: every file the scan would read must carry stats
    val files = idx.inputFiles
      .map(f => StatsManifest.fileKey(new Path(f)))
    if (!files.forall(idx.stats.contains)) return None
    val perFile: Seq[FileStats] = files.toSeq.map(idx.stats)

    val totalRows = perFile.map(_.rows).sum

    def colStats(a: Attribute): Option[Seq[ColStats]] = {
      val sts = perFile.flatMap(_.cols.get(a.name))
      if (sts.length == perFile.length) Some(sts) else None
    }

    // MIN/MAX folded in the stats domain, converted back to the exact
    // attribute type's INTERNAL repr. Returns Some(null) for a genuine
    // NULL result (no non-null values anywhere), None to bail.
    def extreme(a: Attribute, wantMin: Boolean): Option[Any] =
      colStats(a).flatMap { sts =>
        val ranged = sts.filter(_.hasRange)
        def foldL: Any =
          if (ranged.isEmpty) null
          else {
            val vs = ranged.map(s => if (wantMin) s.lLo else s.lHi)
            fromLongDom(a.dataType, if (wantMin) vs.min else vs.max)
          }
        def foldD: Any =
          if (ranged.isEmpty) null
          else {
            val vs = ranged.map(s => if (wantMin) s.dLo else s.dHi)
            if (wantMin) vs.min else vs.max
          }
        def foldS: Any =
          if (ranged.isEmpty) null
          else UTF8String.fromString(
            ranged.map(s => if (wantMin) s.sLo else s.sHi)
              .reduce((x, y) =>
                if (wantMin) (if (ucmp(x, y) <= 0) x else y)
                else (if (ucmp(x, y) >= 0) x else y)))
        sts.headOption.map(_.dom) match {
          case Some('L') if longDomOk(a.dataType) => Some(foldL)
          case Some('D') if a.dataType == DoubleType => Some(foldD)
          case Some('D') if a.dataType == FloatType =>
            Some(foldD match { case null => null; case d: Double => d.toFloat })
          case Some('S') if a.dataType == StringType => Some(foldS)
          case _ => None
        }
      }

    // exact long SUM for integral columns: order-free accumulation, so
    // the fold equals the scan exactly; double sums are order-sensitive
    // at ulp level and never folded. The fold adds with Math.addExact
    // and BAILS on overflow — under ANSI (Spark 4's default) the scan
    // raises there, under TRY it nulls, so the overflow edge is always
    // left to the scan's own semantics.
    def sumOf(a: Attribute): Option[Any] = a.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        colStats(a).flatMap { sts =>
          val contributing = sts.filter(_.nonNull > 0)
          if (contributing.exists(!_.hasSum)) None // pre-sum manifest
          else if (contributing.isEmpty) Some(null)
          else
            try Some(contributing.map(_.lSum).reduce(Math.addExact(_, _)))
            catch { case _: ArithmeticException => None }
        }
      case _ => None
    }

    def aggValue(ae: AggregateExpression): Option[Any] = ae match {
      case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _)
          if l.value != null =>
        Some(totalRows)
      case AggregateExpression(Count(Seq(a: Attribute)), _, false, None, _) =>
        colStats(a).map(_.map(_.nonNull).sum)
      case AggregateExpression(Min(a: Attribute), _, _, None, _) =>
        extreme(a, wantMin = true)
      case AggregateExpression(Max(a: Attribute), _, _, None, _) =>
        extreme(a, wantMin = false)
      case AggregateExpression(Sum(a: Attribute, mode), _, false, None, _)
          if mode != EvalMode.TRY =>
        sumOf(a)
      case _ => None
    }

    var ok = true
    val folded = aggExprs.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression =>
          aggValue(ae) match {
            case Some(v) => Literal(v, ae.dataType)
            case None => ok = false; ae
          }
      }
    }
    if (!ok || folded.exists(_.references.nonEmpty)) return None
    // anything reference-free yet unevaluable at the driver (e.g. a
    // scalar subquery riding next to the aggregates) → leave the plan
    // alone rather than failing optimization
    try {
      val row = InternalRow.fromSeq(folded.map {
        case Alias(child, _) => child.eval(InternalRow.empty)
        case e => e.eval(InternalRow.empty)
      })
      Some(LocalRelation(aggExprs.map(_.toAttribute), Seq(row)))
    } catch { case _: Exception => None }
  }

  private def longDomOk(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
        DateType | TimestampType => true
    case _ => false
  }

  /** Long-domain value back to the attribute type's INTERNAL repr
    * (date = epoch days int, timestamp = epoch micros long — the same
    * projections the manifest writes). */
  private def fromLongDom(dt: DataType, v: Long): Any = dt match {
    case ByteType => v.toByte
    case ShortType => v.toShort
    case IntegerType | DateType => v.toInt
    case LongType | TimestampType => v
    case BooleanType => v != 0L
    case other => throw new IllegalStateException(s"no long dom: $other")
  }

  /** UTF8 binary order — must match the manifest's string min/max. */
  private def ucmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
}
