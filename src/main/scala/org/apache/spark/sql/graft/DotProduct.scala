package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Raw inner product over `array<float>` as a native Catalyst
  * expression with whole-stage codegen — the scoring kernel of
  * maximum-inner-product search (SURVEY.md A18), where magnitude
  * matters and [[CosineSimilarity]]'s normalization would erase it.
  *
  * Accumulation is sequential left-to-right in double precision, so
  * results are bit-comparable to the DuckDB oracle's
  * `list_inner_product` over `DOUBLE[]` (same fold order, same
  * float→double widening).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |double gDot = 0.0;
      |int gN = java.lang.Math.min($a.numElements(), $b.numElements());
      |for (int gI = 0; gI < gN; gI++) {
      |  gDot += (double) $a.getFloat(gI) * (double) $b.getFloat(gI);
      |}
      |${ev.value} = gDot;
      """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
