package graft.sources

import org.apache.spark.sql.{sources => s}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** [[ParquetFileFormat]] that maps LOGICAL column names to their
  * PHYSICAL (birth) names at the parquet boundary — the read half of
  * metadata-only RENAME COLUMN ([[StatsManifest.PhysicalKey]]).
  *
  * The parquet reader matches requested columns to footer columns BY
  * NAME, so a renamed column's files would silently null-fill under
  * the logical name; this format rewrites the data/required schemas to
  * physical names before delegating. Returned rows are POSITIONAL —
  * identical layout to the logical request — so no per-row projection
  * is needed and whole-stage codegen / the vectorized reader are
  * untouched. Pushed filters are name-rewritten the same way; a filter
  * shape we can't rewrite is dropped, which only costs parquet
  * row-group skipping (Spark keeps the FilterExec above the scan —
  * pushed file-source filters are advisory, never trusted for
  * correctness). Partition columns are never renamed (enforced at
  * rename time), so the partition schema passes through. */
private[graft] class GraftParquetFileFormat(
    val nameMap: Map[String, String]) extends ParquetFileFormat {

  private def phys(st: StructType): StructType =
    StructType(st.map(f =>
      f.copy(name = nameMap.getOrElse(f.name, f.name))))

  private def physName(n: String): String = nameMap.getOrElse(n, n)

  /** Rewrite a pushed filter's attribute names to physical; None for a
    * shape touching a mapped column that we can't rewrite (dropped —
    * the residual FilterExec stays exact). */
  private def mapFilter(f: s.Filter): Option[s.Filter] = {
    if (f.references.forall(r => !nameMap.contains(r))) return Some(f)
    f match {
      case s.EqualTo(n, v) => Some(s.EqualTo(physName(n), v))
      case s.EqualNullSafe(n, v) => Some(s.EqualNullSafe(physName(n), v))
      case s.GreaterThan(n, v) => Some(s.GreaterThan(physName(n), v))
      case s.GreaterThanOrEqual(n, v) =>
        Some(s.GreaterThanOrEqual(physName(n), v))
      case s.LessThan(n, v) => Some(s.LessThan(physName(n), v))
      case s.LessThanOrEqual(n, v) =>
        Some(s.LessThanOrEqual(physName(n), v))
      case s.In(n, vs) => Some(s.In(physName(n), vs))
      case s.IsNull(n) => Some(s.IsNull(physName(n)))
      case s.IsNotNull(n) => Some(s.IsNotNull(physName(n)))
      case s.StringStartsWith(n, v) =>
        Some(s.StringStartsWith(physName(n), v))
      case s.StringEndsWith(n, v) =>
        Some(s.StringEndsWith(physName(n), v))
      case s.StringContains(n, v) =>
        Some(s.StringContains(physName(n), v))
      case s.And(l, r) => for {
        a <- mapFilter(l); b <- mapFilter(r)
      } yield s.And(a, b)
      case s.Or(l, r) => for {
        a <- mapFilter(l); b <- mapFilter(r)
      } yield s.Or(a, b)
      case s.Not(c) => mapFilter(c).map(s.Not)
      case _ => None
    }
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[s.Filter], options: Map[String, String],
      hadoopConf: org.apache.hadoop.conf.Configuration)
      : PartitionedFile => Iterator[InternalRow] =
    super.buildReaderWithPartitionValues(sparkSession,
      phys(dataSchema), partitionSchema, phys(requiredSchema),
      filters.flatMap(mapFilter(_)), options, hadoopConf)

  // ParquetFileFormat defines equality as "is a ParquetFileFormat";
  // two relations over differently-mapped schemas must not compare
  // equal (plan sameResult / exchange reuse could cross tables)
  override def equals(other: Any): Boolean = other match {
    case g: GraftParquetFileFormat => g.nameMap == nameMap
    case _ => false
  }
  override def hashCode(): Int = nameMap.hashCode()
}
