package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset}
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

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StatsManifest.scanWithIndex(SparkSession.active,
      path(options))._1.schema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ManifestStreamTable(schema, path(opts),
      Option(opts.get("startingVersion")).map(_.toLong).getOrElse(0L),
      opts.getBoolean("ignoreChanges", false))
  }
}

private final class ManifestStreamTable(schema: StructType, dir: String,
    startingVersion: Long, ignoreChanges: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"graft-manifest-stream($dir)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new ManifestMicroBatchStream(schema, dir, startingVersion,
            ignoreChanges)
      }
    }
}

/** Offset = the last fully-ingested manifest version. */
private final case class VersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private final class ManifestMicroBatchStream(schema: StructType,
    dir: String, startingVersion: Long, ignoreChanges: Boolean)
    extends MicroBatchStream {
  private val spark = SparkSession.active

  override def initialOffset(): Offset =
    VersionOffset(math.max(0L, startingVersion - 1L))

  override def latestOffset(): Offset = {
    val vs = StatsManifest.versions(spark, dir)
    VersionOffset(vs.lastOption.getOrElse(0L))
  }

  override def deserializeOffset(json: String): Offset = {
    val m = """"version"\s*:\s*(\d+)""".r
    VersionOffset(m.findFirstMatchIn(json).map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(
        s"graft-manifest-stream: bad offset $json")))
  }

  private def filesAt(v: Long): Map[String, StatsManifest.FileStats] =
    if (v <= 0L) Map.empty
    else
      try StatsManifest.readAt(spark, dir, v)
      catch {
        case e: Exception => throw new IllegalStateException(
          s"graft-manifest-stream: version $v is no longer retained — " +
            "the stream was down longer than the table's retention " +
            "window; re-seed from a fresh startingVersion", e)
      }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].version
    val e = end.asInstanceOf[VersionOffset].version
    if (e <= s) return Array.empty
    val before = filesAt(s)
    val after = filesAt(e)
    if (!ignoreChanges) {
      val removedDelta =
        StatsManifest.removedAt(spark, dir, e) --
          (if (s <= 0L) Set.empty[String]
           else StatsManifest.removedAt(spark, dir, s))
      require(removedDelta.isEmpty,
        s"graft-manifest-stream: versions ($s, $e] tombstoned " +
          s"${removedDelta.size} file(s) — the table is not append-only " +
          "over this range. Use RowOps.changesStream for CDC semantics, " +
          "or ignoreChanges=true to stream just the added files " +
          "(rewritten rows will re-emit).")
    }
    val idx = StatsManifest.scanWithIndex(spark, dir)._2
    val partSchema = idx.partitionSchema
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val rootKey = StatsManifest.fileKey(fs.makeQualified(new Path(dir)))
    (after.keySet -- before.keySet).toArray.sorted.map { key =>
      val p = new Path(key)
      // a vanished added file means retention (vacuum / physical
      // rewrite) outran the stream — emitting zero rows here would
      // silently break exactly-once, so fail loudly like filesAt()
      val len =
        if (fs.exists(p)) fs.getFileStatus(p).getLen
        else throw new IllegalStateException(
          s"graft-manifest-stream: added file $key of versions " +
            s"($s, $e] no longer exists — the table was vacuumed or " +
            "physically rewritten past the stream's position; re-seed " +
            "from a fresh startingVersion")
      // Hive-partition values synthesize from the file's path, exactly
      // like the batch scan
      val rel = key.stripPrefix(rootKey).stripPrefix("/")
      val partVals: InternalRow =
        if (partSchema.isEmpty) InternalRow.empty
        else {
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
      ManifestFilePartition(PartitionedFile(partVals,
        org.apache.spark.paths.SparkPath.fromPathString(key), 0L, len,
        Array.empty, 0L, len, Map.empty)): InputPartition
    }
  }

  // built ONCE per stream (the schema is pinned at start): a fresh
  // SessionState per micro-batch would be needless driver work
  private lazy val readerFactory: PartitionReaderFactory = {
    val idx = StatsManifest.scanWithIndex(spark, dir)._2
    val partSchema = idx.partitionSchema
    val dataSchema = StructType(schema.filterNot(f =>
      partSchema.fieldNames.contains(f.name)))
    // row-based reader: the DSv2 row contract is per-record, and the
    // vectorized path's batches-as-rows cast is FileSourceScanExec-only
    val rowSession = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .newSession()
    rowSession.conf.set("spark.sql.parquet.enableVectorizedReader",
      "false")
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      rowSession, dataSchema, partSchema, dataSchema, Seq.empty,
      Map.empty, rowSession.sessionState
        .newHadoopConfWithOptions(Map.empty))
    new ManifestStreamReaderFactory(readFunc)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    readerFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private final case class ManifestFilePartition(file: PartitionedFile)
    extends InputPartition

private final class ManifestStreamReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {
  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val it = readFunc(p.asInstanceOf[ManifestFilePartition].file)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = it.hasNext
      override def get(): InternalRow = it.next()
      override def close(): Unit = it match {
        case c: AutoCloseable => c.close()
        case _ => ()
      }
    }
  }
}
