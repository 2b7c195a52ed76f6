package graft.sources

import java.io.File
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Avro format support built directly on the avro-core jars Spark ships
  * (`avro-1.12`), closing the reference's `flink-formats/flink-avro` row:
  * the spark-avro CONNECTOR is not in this container, so the container
  * file format is implemented here — writer in this object, DSv2 reader
  * in [[AvroDataSource]].
  *
  * Type surface (the fixture/pipeline types): BOOLEAN, INT, LONG, FLOAT,
  * DOUBLE, STRING, BINARY, TIMESTAMP (micros logical type), and ARRAYs
  * of those. Every field is written as a nullable union, matching Spark's
  * default nullability. Maps/structs are out of scope (documented; the
  * reference's flink-avro maps those too, but nothing in the fixture
  * schema needs them).
  *
  * Scale: the writer runs one avro container file per partition (the
  * same layout every distributed avro sink produces); the reader plans
  * one input partition per file — avro sync-marker splitting is a
  * documented non-goal (row-group-less container files at 100 TB should
  * be written at bounded partition size upstream, which the writer
  * does by inheriting the DataFrame's partitioning).
  */
object AvroIO {

  // ---- Spark StructType -> avro Schema ----------------------------------

  private[sources] def toAvroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, nullable(toAvro(f.dataType)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  private def toAvro(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(et, _) => Schema.createArray(nullable(toAvro(et)))
    case other => throw new IllegalArgumentException(
      s"AvroIO: unsupported Spark type $other (supported: boolean, int, " +
        "long, float, double, string, binary, timestamp, arrays thereof)")
  }

  // ---- avro Schema -> Spark StructType ----------------------------------

  private[sources] def toStructType(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD,
      s"AvroIO: top-level avro schema must be a record, got ${s.getType}")
    StructType(s.getFields.asScala.map(f =>
      StructField(f.name, toSpark(unwrap(f.schema)), nullable = true)).toSeq)
  }

  /** Strip the (null, T) union the writer (and most avro writers) emit. */
  private[sources] def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"AvroIO: only (null, T) unions are supported, got $s")
      nonNull.head
    } else s

  private def toSpark(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType != null &&
        s.getLogicalType.getName == "timestamp-micros") TimestampType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.ARRAY => ArrayType(toSpark(unwrap(s.getElementType)))
    case other => throw new IllegalArgumentException(
      s"AvroIO: unsupported avro type $other")
  }

  // ---- writer ------------------------------------------------------------

  /** Write `df` as a directory of avro container files, one per partition
    * (part-NNNNN.avro). Overwrites `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema, "row").toString
    val dir = new File(path)
    if (dir.exists()) {
      Option(dir.listFiles()).foreach(_.foreach(_.delete()))
    } else dir.mkdirs()
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      // parse per task: avro Schema is not serializable-stable across
      // closures, the canonical json is
      val sch = new Schema.Parser().parse(avroJson)
      val out = new File(dir, f"part-$i%05d.avro")
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](sch))
      w.create(sch, out)
      var n = 0L
      rows.foreach { row =>
        w.append(toRecord(row, sch, schema))
        n += 1
      }
      w.close()
      Iterator.single(n)
    }.count(): Unit
  }

  private def toRecord(row: Row, sch: Schema, st: StructType): GenericRecord = {
    val rec = new GenericData.Record(sch)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name,
        if (row.isNullAt(i)) null
        else toAvroValue(row.get(i), f.dataType))
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (t: java.sql.Timestamp, TimestampType) =>
      // floorDiv: plain / truncates toward zero, which shifts pre-epoch
      // timestamps with fractional seconds forward by one second
      java.lang.Long.valueOf(
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000)
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
      s.map(e => if (e == null) null else toAvroValue(e, et)).asJava
    case (other, _) => other
  }
}
