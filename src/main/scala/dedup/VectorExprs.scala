package dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.dedupbridge.{columnExpr, exprColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two `array<float>` columns, with
  * whole-stage codegen.
  *
  * The round-2 implementation built dot/cosine from the higher-order
  * `aggregate(zip_with(...))` combinators — HOFs are CodegenFallback and
  * evaluate one boxed lambda call per element, which put ~250 ns/element
  * on every ANN/semdedup scoring pair (q_ann_ivf spent ~6 s scoring 400k
  * 64-dim pairs at sf0.1). This expression generates a primitive
  * `getFloat(i)` loop instead — the hot path stays inside
  * WholeStageCodegen with zero boxing, which is the difference between a
  * scoring stage that survives a 100× scale-up and one that doesn't.
  *
  * Null handling: BinaryExpression's default null-propagation (null in →
  * null out), matching the HOF behavior. Length mismatch scores the
  * common prefix, matching `zip_with`'s null-padding + `+`-of-null
  * semantics only when lengths are equal — engine vectors are
  * fixed-dimension, and AnnSpec pins equality against the HOF formula. */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is off-limits outside org.apache.spark (its
  // AbstractDataType is private[sql]); explicit input check instead
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_f32 requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_s = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  ${ev.value}_s += (double) $a.getFloat(${ev.value}_i) * (double) $b.getFloat(${ev.value}_i);
         |}
         |${ev.value} = ${ev.value}_s;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** dot(a, b) in double precision as a codegen'd column. */
  def dotF32(a: Column, b: Column): Column =
    exprColumn(DotF32(columnExpr(a), columnExpr(b)))
}
