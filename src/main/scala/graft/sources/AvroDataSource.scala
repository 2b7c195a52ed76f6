package graft.sources

import java.io.File
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 avro READER over avro-core (see [[AvroIO]] for why this exists
  * and the writer): `spark.read.format("graft.sources.AvroDataSource")
  * .load(dir)`. Implements the reference's source-ability contract where
  * it matters for a row format: `SupportsPushDownRequiredColumns` prunes
  * the record→row conversion to the projected columns (avro is row-major,
  * so pruning saves conversion, not IO — same trade as flink-avro).
  * One input partition per container file. */
class AvroDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroDataSource.inferAndValidate(AvroDataSource.path(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new AvroTable(schema,
      AvroDataSource.path(new CaseInsensitiveStringMap(properties)))
}

private object AvroDataSource {
  def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "AvroDataSource: .load(path) is required")
    p
  }

  def listFiles(path: String): Seq[File] = {
    val f = new File(path)
    val all =
      if (f.isDirectory) Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
      else if (f.exists()) Seq(f)
      else Nil
    all.filter(_.getName.endsWith(".avro")).sortBy(_.getName)
  }

  def fileSchema(f: File): Schema = {
    val r = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord]())
    try r.getSchema
    finally r.close()
  }

  // validated schema per directory, revalidated when the directory STAMP
  // (file count + max mtime + total bytes) changes: planning re-reads
  // every file header only when the directory actually changed, not on
  // every query over a static dir. Keyed by PATH with the stamp stored in
  // the value — exactly one live entry per directory, so the cache is
  // bounded by the number of distinct paths read and a rewritten
  // directory replaces (not shadows) its stale entry; the residual
  // staleness window is a same-second in-place rewrite with equal file
  // count and total bytes (mtime is second-granularity on some
  // filesystems), not a permanent stale hit
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, ((Int, Long, Long), StructType)]()

  def inferAndValidate(path: String): StructType = {
    val files = listFiles(path)
    require(files.nonEmpty, s"AvroDataSource: no .avro files under $path")
    val stamp = (files.length,
      files.map(_.lastModified()).max, files.map(_.length()).sum)
    schemaCache.compute(path, (_, prev) =>
      if (prev != null && prev._1 == stamp) prev
      else (stamp, infer(files))
    )._2
  }

  private def infer(files: Seq[File]): StructType = {
      // a heterogeneous directory (evolved schemas) would otherwise
      // decode later files against the first file's expectations and
      // surface as a ClassCastException (or silent wrong values) at scan
      // time — fail at planning with the offending file named instead.
      // Field ORDER may differ across files (the partition reader
      // resolves columns by name against each file's own schema), so
      // compare the name→type sets, not the ordered struct.
      val first = AvroIO.toStructType(fileSchema(files.head))
      def keyed(st: StructType) = StructType(st.fields.sortBy(_.name))
      files.tail.foreach { f =>
        val st = AvroIO.toStructType(fileSchema(f))
        require(keyed(st) == keyed(first),
          s"AvroDataSource: schema of $f does not match ${files.head}: " +
            s"$st vs $first — heterogeneous avro directories are not supported")
      }
      first
  }
}

private final class AvroTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"avro:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(schema, path)
}

private final class AvroScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(required, path)
}

private final class AvroScan(required: StructType, path: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    AvroDataSource.listFiles(path)
      .map(f => AvroFilePartition(f.getAbsolutePath): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required.json)
}

private final case class AvroFilePartition(file: String) extends InputPartition

private final class AvroReaderFactory(requiredJson: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(p.asInstanceOf[AvroFilePartition].file,
      DataType.fromJson(requiredJson).asInstanceOf[StructType])
}

private final class AvroPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val reader = new DataFileReader[GenericRecord](new File(file),
    new GenericDatumReader[GenericRecord]())
  // converters come from the FILE's schema + the pruned Spark type, so
  // per-file encodings (timestamp-millis vs -micros, decimal scale)
  // decode by what the file declares — see AvroIO.readConverter
  private val converters: Array[Any => Any] = {
    val fileSchema = reader.getSchema
    required.fields.map { f =>
      val af = fileSchema.getField(f.name)
      require(af != null,
        s"AvroDataSource: column '${f.name}' absent in $file")
      AvroIO.readConverter(AvroIO.unwrap(af.schema), f.dataType)
    }
  }
  private var current: GenericRecord = _

  override def next(): Boolean =
    if (reader.hasNext) { current = reader.next(); true } else false

  override def get(): InternalRow = {
    val out = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val v = current.get(required.fields(i).name)
      out(i) = if (v == null) null else converters(i)(v)
      i += 1
    }
    new GenericInternalRow(out)
  }

  override def close(): Unit = reader.close()
}
