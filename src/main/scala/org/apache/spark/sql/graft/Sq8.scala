package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType}

/** Symmetric int8 scalar quantization (SQ8) primitives — the 4×
  * bandwidth rung between raw floats and PQ's 32×: each vector stores
  * one double scale (127 / max|x|) plus one byte per dimension, and
  * the approximate dot product is an EXACT integer sum rescaled once.
  * All three are native expressions: the per-(query, vector) dot is
  * the ANN scan's hot loop, and byte-packing via Column HOFs would be
  * interpreted per element.
  */

/** `127 / max|x|` (0.0 for zero/empty vectors — the "no information"
  * convention matching [[CosineSimilarity]]'s zero-vector cosine).
  */
case class Sq8Scale(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_scale"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) { val a = math.abs(v.getFloat(i).toDouble); if (a > m) m = a; i += 1 }
    if (m == 0.0) 0.0 else 127.0 / m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8ScaleExpr", this, classOf[Sq8Scale].getName)
    defineCodeGen(ctx, ev, c =>
      s"((java.lang.Double) $ref.nullSafeEval($c)).doubleValue()")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Quantized codes: `round(x_i · scale)` as one byte per dimension
  * (|code| ≤ 127 by construction of the scale — no clamp needed).
  * Scale is recomputed in-expression (one extra O(d) pass) so the
  * codes column has no cross-column dependency an optimizer could
  * inline into a lambda.
  */
case class Sq8Codes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_codes"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) { val a = math.abs(v.getFloat(i).toDouble); if (a > m) m = a; i += 1 }
    val scale = if (m == 0.0) 0.0 else 127.0 / m
    val out = new Array[Byte](n)
    var j = 0
    while (j < n) { out(j) = math.round(v.getFloat(j).toDouble * scale).toByte; j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8CodesExpr", this, classOf[Sq8Codes].getName)
    defineCodeGen(ctx, ev, c => s"(byte[]) $ref.nullSafeEval($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact integer dot product of two SQ8 code arrays: `Σ a_i·b_i` as a
  * long (d·127² ≤ d·16129 — no overflow until d ~ 5·10¹⁴). The caller
  * rescales by 1/(scale_a·scale_b) once per pair.
  */
case class Sq8Dot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "sq8_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8DotExpr", this, classOf[Sq8Dot].getName)
    defineCodeGen(ctx, ev, (a, b) =>
      s"((java.lang.Long) $ref.nullSafeEval($a, $b)).longValue()")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
