package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `array_dot(a, b) -> double`: the similarity hot-loop as a NATIVE
  * codegen'd expression — a tight primitive loop over columnar ArrayData
  * instead of the zip_with→aggregate lambda chain. Accumulation order and
  * per-element float→double widening match the HOF formulation exactly,
  * so results are bit-identical (ArrayDotSpec asserts it) and the two are
  * interchangeable under the oracle gate.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // Like the HOF chain, mismatched lengths and null elements yield NULL
  // (zip_with pads with nulls and a null product nulls the sum).
  override def nullable: Boolean = true

  private def elemType = left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"array_dot requires two ARRAY<FLOAT> or two ARRAY<DOUBLE> inputs, " +
        s"got ${l.catalogString} and ${r.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (!ArrayDot.comparable(a, b)) null
    else if (elemType == FloatType) ArrayDot.dotFloat(a, b)
    else ArrayDot.dotDouble(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ArrayDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val fn = if (elemType == FloatType) "dotFloat" else "dotDouble"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if (!$helper.comparable($a, $b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $helper.$fn($a, $b);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}

object ArrayDot {
  /** Equal lengths and no null elements — otherwise the result is NULL. */
  def comparable(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (n != b.numElements()) return false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      i += 1
    }
    true
  }

  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}
