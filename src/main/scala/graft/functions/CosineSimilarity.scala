package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays in a
  * single fused pass (dot product and both norms in one loop).
  *
  * This is the §7-step-5 "custom Expression where built-ins fall short"
  * tier: the composable `aggregate(zip_with(...))` formulation walks each
  * array three times through generic ArrayData lambdas; this walks once
  * over primitive doubles and stays inside whole-stage codegen (the
  * generated code calls one static method — no boxing, no closure
  * dispatch). Semantics match the reference's scalar-function tier
  * (flink-table-common/.../functions/ScalarFunction.java:92) with
  * Spark-native codegen instead of Janino-compiled eval.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ARRAY<DOUBLE>; the registered call sites cast (the
  // ExpectsInputTypes mixin's AbstractDataType is private[sql] in Spark 4)
  override def dataType: DataType = DoubleType

  // null on degenerate inputs (length mismatch, empty, zero norm) even
  // when both children are non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity requires ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = CosineSimilarity.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.CosineSimilarity.compute($a, $b);
         |if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** One-pass cosine. Returns NaN (→ SQL null at the expression layer)
    * when the arrays differ in length, are empty, or either norm is zero —
    * bad vectors surface as nulls instead of flowing through pipelines. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return Double.NaN
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
