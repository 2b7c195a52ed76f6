package graft.sources

import java.io.File
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro format support built directly on the avro-core jars Spark ships
  * (`avro-1.12`), closing the reference's `flink-formats/flink-avro` row:
  * the spark-avro CONNECTOR is not in this container, so the container
  * file format is implemented here — writer in this object, DSv2 reader
  * in [[AvroDataSource]].
  *
  * Type surface (reference AvroSchemaConverter.java): BOOLEAN, INT, LONG,
  * FLOAT, DOUBLE, STRING, BINARY, TIMESTAMP (timestamp-micros written;
  * timestamp-millis also read), DECIMAL(p,s) (bytes + decimal logical
  * type), DATE (int + date logical type), MAP (string keys, as the avro
  * spec requires), nested RECORDs, and ARRAYs of all of these. Avro
  * time-millis/time-micros read as the underlying int/long (Spark has no
  * TIME type — the same mapping spark-avro uses); foreign-written ENUMs
  * read as strings and FIXED as binary (or decimal per logical type).
  * Spark has no enum/fixed types of its own, so WRITING them goes
  * through the schema-directed `write(df, path, writerSchemaJson)`
  * overload: the target schema declares ENUM/FIXED and the writer
  * validates and encodes string/binary/decimal columns against it —
  * closing the round-trip. Every field the default writer emits is a
  * nullable union, matching Spark's default nullability.
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
      new Schema.Field(f.name, nullable(toAvro(f.dataType, s"${name}_${f.name}")),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  /** `path` seeds unique names for nested record schemas (avro requires
    * record names to be unique within one schema document). */
  private def toAvro(dt: DataType, path: String): Schema = dt match {
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
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(et, _) =>
      Schema.createArray(nullable(toAvro(et, s"${path}_item")))
    case MapType(StringType, vt, _) =>
      Schema.createMap(nullable(toAvro(vt, s"${path}_value")))
    case st: StructType => toAvroSchema(st, path)
    case other => throw new IllegalArgumentException(
      s"AvroIO: unsupported Spark type $other (supported: boolean, int, " +
        "long, float, double, string, binary, timestamp, decimal, date, " +
        "string-keyed maps, structs, arrays thereof)")
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

  private def logicalName(s: Schema): String =
    Option(s.getLogicalType).map(_.getName).getOrElse("")

  private def toSpark(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => logicalName(s) match {
      case "date" => DateType
      case _ => IntegerType // incl. time-millis: millis since midnight
    }
    case Schema.Type.LONG => logicalName(s) match {
      case "timestamp-micros" | "timestamp-millis" => TimestampType
      case _ => LongType // incl. time-micros: micros since midnight
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.ENUM => StringType // symbols surface as strings
    case Schema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.ARRAY => ArrayType(toSpark(unwrap(s.getElementType)))
    case Schema.Type.MAP =>
      MapType(StringType, toSpark(unwrap(s.getValueType)))
    case Schema.Type.RECORD => toStructType(s)
    case other => throw new IllegalArgumentException(
      s"AvroIO: unsupported avro type $other")
  }

  // ---- reader conversion (avro datum -> Spark internal value) -----------

  /** Converter for NON-NULL datums of one field. Built once per file from
    * the file's own avro schema + the pruned Spark type, so millis/micros
    * timestamp encodings (and decimal scales) follow what the file
    * actually declares, not what the writer would have produced. */
  private[sources] def readConverter(s: Schema, dt: DataType): Any => Any =
    dt match {
      case StringType => v => UTF8String.fromString(v.toString)
      case BinaryType => v => v match {
        case bb: ByteBuffer =>
          val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
        case f: org.apache.avro.generic.GenericFixed => f.bytes()
        case other => throw new IllegalArgumentException(
          s"AvroIO: unexpected binary carrier ${other.getClass}")
      }
      case d: DecimalType => v => {
        // bytes-backed or fixed-backed decimal
        val b = v match {
          case bb: ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case f: org.apache.avro.generic.GenericFixed => f.bytes()
          case other => throw new IllegalArgumentException(
            s"AvroIO: unexpected decimal carrier ${other.getClass}")
        }
        Decimal(new java.math.BigDecimal(
          new java.math.BigInteger(b), d.scale), d.precision, d.scale)
      }
      case TimestampType =>
        if (logicalName(s) == "timestamp-millis")
          v => v.asInstanceOf[java.lang.Long].longValue() * 1000L
        else v => v.asInstanceOf[java.lang.Long].longValue()
      case DateType => v => v.asInstanceOf[java.lang.Integer].intValue()
      case ArrayType(et, _) =>
        val ec = readConverter(unwrap(s.getElementType), et)
        v => {
          val items = v.asInstanceOf[java.util.Collection[_]].asScala
          new GenericArrayData(
            items.map(e => if (e == null) null else ec(e)).toArray)
        }
      case MapType(_, vt, _) =>
        val vc = readConverter(unwrap(s.getValueType), vt)
        v => {
          val entries = v.asInstanceOf[java.util.Map[_, _]].asScala.toSeq
          new ArrayBasedMapData(
            new GenericArrayData(entries.map(e =>
              UTF8String.fromString(e._1.toString)).toArray[Any]),
            new GenericArrayData(entries.map(e =>
              if (e._2 == null) null else vc(e._2)).toArray[Any]))
        }
      case st: StructType =>
        val fields = st.fields.map { f =>
          val af = s.getField(f.name)
          require(af != null, s"AvroIO: field '${f.name}' absent in $s")
          f.name -> readConverter(unwrap(af.schema), f.dataType)
        }
        v => {
          val rec = v.asInstanceOf[GenericRecord]
          val out = new Array[Any](fields.length)
          var i = 0
          while (i < fields.length) {
            val d = rec.get(fields(i)._1)
            out(i) = if (d == null) null else fields(i)._2(d)
            i += 1
          }
          new GenericInternalRow(out)
        }
      case _ => identity // boolean / int / long / float / double
    }

  // ---- writer ------------------------------------------------------------

  /** Write `df` as a directory of avro container files, one per partition
    * (part-NNNNN.avro). Overwrites `path`.
    *
    * Each task writes to a task-private temp file and atomically renames
    * it into place on success, so a retried/speculative attempt can never
    * leave a half-written part file and the last successful attempt wins;
    * the driver stamps a `_SUCCESS` marker once the whole job completes
    * (readers wanting job-level atomicity should gate on it — the listing
    * itself does not, matching Spark's own file sources). Like the DSv2
    * reader, this writer addresses a LOCAL (or shared, e.g. NFS)
    * filesystem visible to every executor — the in-container stand-in
    * for an HDFS/object-store committer. */
  def write(df: DataFrame, path: String): Unit =
    writeAs(df, path, toAvroSchema(df.schema, "row"))

  /** Schema-DIRECTED write (reference AvroSchemaConverter.java's
    * schema-first direction): encode `df` against a caller-supplied
    * target avro schema instead of the one [[write]] derives. This is
    * what closes the enum/fixed asymmetry — Spark has no enum or fixed
    * types, so those can only be written when the target schema declares
    * them: StringType → ENUM (symbols validated per value; a non-symbol
    * value fails the task naming value and field), BinaryType → FIXED
    * (exact length enforced), DecimalType → FIXED with a decimal logical
    * type (unscaled bytes sign-extended to the fixed size). All other
    * fields must declare exactly the encoding the default writer
    * produces — checked structurally up front, so an incompatible schema
    * fails at the driver, not per-row in tasks. */
  def write(df: DataFrame, path: String, writerSchemaJson: String,
      strictNullability: Boolean = true): Unit = {
    val target = new Schema.Parser().parse(writerSchemaJson)
    validateWriterSchema(df.schema, target, "row", strictNullability)
    writeAs(df, path, target)
  }

  /** Compatibility walk: every Spark field needs a same-named target
    * field whose (unwrapped) avro type either equals the default mapping
    * or is one of the enum/fixed extensions. */
  private def validateWriterSchema(st: StructType, sch: Schema,
      path: String, strictNulls: Boolean): Unit = {
    require(sch.getType == Schema.Type.RECORD,
      s"AvroIO: writer schema at $path must be a record, got ${sch.getType}")
    st.fields.foreach { f =>
      val af = sch.getField(f.name)
      require(af != null,
        s"AvroIO: writer schema lacks field '$path.${f.name}'")
      // nullability is structural too: a nullable Spark column against a
      // non-union target would only fail per-row in a task when the first
      // null arrives, after partial output exists — reject up front.
      // Spark infers nullable = true for most computed columns even when
      // no value can be null; a caller who KNOWS the data is null-free
      // asserts it by tightening the frame's schema (the message says
      // how), or opts out of the structural check with
      // strictNullability = false and accepts the old per-row
      // fail-on-first-null behavior.
      require(!strictNulls || !f.nullable || af.schema.isNullable,
        s"AvroIO: '$path.${f.name}' is nullable in Spark but target " +
          s"${af.schema} has no null union branch — add a null branch " +
          "to the writer schema, assert non-nullability via " +
          "createDataFrame(df.rdd, schema with nullable=false), or " +
          "pass strictNullability = false to fail per-row instead")
      validateFieldSchema(f.dataType, unwrap(af.schema), s"$path.${f.name}",
        strictNulls)
    }
  }

  private def validateFieldSchema(dt: DataType, s: Schema,
      path: String, strictNulls: Boolean): Unit = (dt, s.getType) match {
    case (StringType, Schema.Type.ENUM) => () // symbols checked per value
    case (BinaryType, Schema.Type.FIXED) => ()
    case (d: DecimalType, Schema.Type.FIXED) =>
      s.getLogicalType match {
        case dec: LogicalTypes.Decimal =>
          require(dec.getPrecision == d.precision && dec.getScale == d.scale,
            s"AvroIO: $path fixed decimal(${dec.getPrecision},${dec.getScale})" +
              s" != Spark decimal(${d.precision},${d.scale})")
        case _ => throw new IllegalArgumentException(
          s"AvroIO: $path maps decimal to fixed without a decimal logical type")
      }
    case (ArrayType(et, cn), Schema.Type.ARRAY) =>
      require(!strictNulls || !cn || s.getElementType.isNullable,
        s"AvroIO: $path[] elements nullable in Spark but target element " +
          s"${s.getElementType} has no null union branch")
      validateFieldSchema(et, unwrap(s.getElementType), s"$path[]",
        strictNulls)
    case (MapType(StringType, vt, vn), Schema.Type.MAP) =>
      require(!strictNulls || !vn || s.getValueType.isNullable,
        s"AvroIO: $path{} values nullable in Spark but target value " +
          s"${s.getValueType} has no null union branch")
      validateFieldSchema(vt, unwrap(s.getValueType), s"$path{}",
        strictNulls)
    case (nested: StructType, Schema.Type.RECORD) =>
      validateWriterSchema(nested, s, path, strictNulls)
    case _ =>
      val default = toAvro(dt, "probe")
      require(default.getType == s.getType &&
          logicalName(default) == logicalName(s),
        s"AvroIO: $path target $s incompatible with Spark type $dt " +
          s"(writer would emit $default)")
  }

  private def writeAs(df: DataFrame, path: String, avro: Schema): Unit = {
    val schema = df.schema
    val avroJson = avro.toString
    val dir = new File(path)
    if (dir.exists()) {
      Option(dir.listFiles()).foreach(_.foreach(_.delete()))
    } else dir.mkdirs()
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      // parse per task: avro Schema is not serializable-stable across
      // closures, the canonical json is
      val sch = new Schema.Parser().parse(avroJson)
      val out = new File(dir, f"part-$i%05d.avro")
      val tmp = new File(dir,
        f".part-$i%05d.avro.${java.util.UUID.randomUUID().toString}.tmp")
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](sch))
      w.create(sch, tmp)
      var n = 0L
      var closed = false
      try {
        rows.foreach { row =>
          w.append(toRecord(row, sch, schema))
          n += 1
        }
        w.close()
        closed = true
        java.nio.file.Files.move(tmp.toPath, out.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally {
        // a toRecord/append throw must still release the file handle
        // (leaked handles accumulate across failed task retries)
        if (!closed) { try w.close() catch { case _: Exception => () } }
        tmp.delete(): Unit // no-op after a successful move
      }
      Iterator.single(n)
    }.count(): Unit
    java.nio.file.Files.write(new File(dir, "_SUCCESS").toPath,
      Array.empty[Byte]): Unit
  }

  private def toRecord(row: Row, sch: Schema, st: StructType): GenericRecord = {
    val rec = new GenericData.Record(sch)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name,
        if (row.isNullAt(i)) null
        else toAvroValue(row.get(i), f.dataType,
          unwrap(sch.getField(f.name).schema)))
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType, sch: Schema): Any =
    (v, dt) match {
      // schema-directed extensions first: the TARGET type decides when a
      // string is an enum symbol or bytes/decimal are a fixed
      case (s: String, StringType) if sch.getType == Schema.Type.ENUM =>
        if (!sch.hasEnumSymbol(s)) throw new IllegalArgumentException(
          s"AvroIO: '$s' is not a symbol of enum ${sch.getFullName} " +
            s"(symbols: ${sch.getEnumSymbols.asScala.mkString(", ")})")
        new GenericData.EnumSymbol(sch, s)
      case (b: Array[Byte], BinaryType) if sch.getType == Schema.Type.FIXED =>
        require(b.length == sch.getFixedSize,
          s"AvroIO: fixed ${sch.getFullName} needs ${sch.getFixedSize} " +
            s"bytes, got ${b.length}")
        new GenericData.Fixed(sch, b)
      case (bd: java.math.BigDecimal, d: DecimalType)
          if sch.getType == Schema.Type.FIXED =>
        // two's-complement sign-extension of the unscaled value into the
        // declared fixed width (the avro spec's fixed-decimal encoding)
        val unscaled = bd.setScale(d.scale).unscaledValue().toByteArray
        val size = sch.getFixedSize
        require(unscaled.length <= size,
          s"AvroIO: decimal $bd needs ${unscaled.length} bytes, fixed " +
            s"${sch.getFullName} holds $size")
        val out = new Array[Byte](size)
        if (bd.signum() < 0) java.util.Arrays.fill(out, 0xFF.toByte)
        System.arraycopy(unscaled, 0, out, size - unscaled.length,
          unscaled.length)
        new GenericData.Fixed(sch, out)
      case (t: java.sql.Timestamp, TimestampType) =>
        // floorDiv: plain / truncates toward zero, which shifts pre-epoch
        // timestamps with fractional seconds forward by one second
        java.lang.Long.valueOf(
          Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000)
      case (t: java.time.Instant, TimestampType) =>
        java.lang.Long.valueOf(
          Math.multiplyExact(t.getEpochSecond, 1000000L) + t.getNano / 1000)
      case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
      case (bd: java.math.BigDecimal, d: DecimalType) =>
        ByteBuffer.wrap(bd.setScale(d.scale).unscaledValue().toByteArray)
      case (dv: java.sql.Date, DateType) =>
        java.lang.Integer.valueOf(dv.toLocalDate.toEpochDay.toInt)
      case (dv: java.time.LocalDate, DateType) =>
        java.lang.Integer.valueOf(dv.toEpochDay.toInt)
      case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
        val es = unwrap(sch.getElementType)
        s.map(e => if (e == null) null else toAvroValue(e, et, es)).asJava
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        val vs = unwrap(sch.getValueType)
        val jm = new java.util.HashMap[String, Any](m.size * 2)
        m.foreach { case (k, value) =>
          jm.put(k.toString,
            if (value == null) null else toAvroValue(value, vt, vs))
        }
        jm
      case (r: Row, st: StructType) => toRecord(r, sch, st)
      case (other, _) => other
    }
}
