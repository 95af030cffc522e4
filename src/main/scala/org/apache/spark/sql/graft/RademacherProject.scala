package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Johnson-Lindenstrauss random projection to `k` dims with a
  * deterministic Rademacher matrix in one compiled pass:
  * y_j = Σ_i sign(j,i)·x_i / √k, sign(j,i) = 1 − 2·bit13((j·d+i)·2654435761).
  *
  * The Column form (k `aggregate`-over-`zip_with` dot products) is
  * interpreted — Spark's higher-order functions are CodegenFallback —
  * and ~20× slower per row. The signs derive from integer arithmetic,
  * so unlike [[HyperplaneCodes]] there is no matrix reference object at
  * all: k·d multiply-adds in a tight loop, nothing shipped to
  * executors, zero shuffle.
  *
  * Bit-exact with the Column formulation it replaces (and with the SQL
  * oracle): ±1·x is an exact double op and accumulation runs in the
  * same index order.
  */
case class RademacherProject(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0, s"RademacherProject: k must be positive, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rademacher_project"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      val base = j.toLong * d
      var i = 0
      while (i < d) {
        val bit = (((base + i) * 2654435761L) >> 13) & 1L
        val x = v.getFloat(i).toDouble
        if (bit == 0L) acc += x else acc -= x
        i += 1
      }
      // divide (not multiply by the inverse): the Column form divides,
      // and x/√k vs x·(1/√k) differ by an ulp
      out(j) = acc / math.sqrt(k.toDouble)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rademacherExpr", this, classOf[RademacherProject].getName)
    defineCodeGen(ctx, ev, c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
