package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Native Catalyst expression `image_stats(payload BINARY)`: decode a
  * real raster payload (24-bit BMP or binary PPM — sniffed from the
  * magic bytes) into header fields + per-channel pixel sums, scan-local
  * inside whole-stage codegen. NULL for anything unparseable (corrupt /
  * truncated / unhandled format): one bad file in a corpus flags its
  * row instead of failing the job.
  *
  * This is the §7-step-5 custom-Expression tier, same rationale as
  * [[CosineSimilarity]]: the byte-walking loop (row padding, BGR order,
  * two's-complement little-endian headers) has no `functions._`
  * composition, and a Scala UDF would box every payload. The generated
  * code calls one static method on [[graft.multimodal.ImageCodec]] and
  * returns an InternalRow directly — no serialization boundary.
  * Reference analogue: the scalar-function tier
  * (flink-table-common/.../functions/ScalarFunction.java:92); the
  * reference ships no image kernel, so the decode itself follows the
  * public BMP/PPM format specifications.
  */
case class ImageStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_stats requires BINARY input, got ${other.simpleString}")
  }

  override def prettyName: String = "image_stats"

  override def nullSafeEval(payload: Any): Any =
    graft.multimodal.ImageCodec.stats(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.multimodal.ImageCodec.stats($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
         |""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object ImageStats {
  /** Output shape: header fields + per-channel sums (the parse proof). */
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))
}
