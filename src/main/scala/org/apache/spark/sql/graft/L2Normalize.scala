package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType}

/** L2-normalize an `array<float>` as a native Catalyst expression.
  *
  * Replaces the `sqrt(aggregate(...))` + `transform(...)` HOF pair:
  * interpreted lambda evaluation re-computes the closed-over norm
  * subexpression PER ELEMENT (O(d²) boxed ops per row), and
  * CollapseProject can inline the whole HOF tree into downstream
  * consumers — the ADC-table build re-evaluated it per table entry,
  * turning a 10-row query-side projection into ~10⁸ interpreted ops.
  * Here the norm is one primitive pass and each element is touched
  * once, and downstream native expressions evaluate the child exactly
  * once.
  *
  * Semantics match the HOF form bit-for-bit: accumulate Σx² in double
  * left-to-right, n = sqrt; zero-norm vectors pass through unchanged;
  * out_i = (x_i.toDouble / n).toFloat.
  */
case class L2Normalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "l2_normalize"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Float](n)
    if (norm == 0.0) {
      var j = 0
      while (j < n) { out(j) = v.getFloat(j); j += 1 }
    } else {
      var j = 0
      while (j < n) { out(j) = (v.getFloat(j).toDouble / norm).toFloat; j += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2NormalizeExpr", this, classOf[L2Normalize].getName)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
