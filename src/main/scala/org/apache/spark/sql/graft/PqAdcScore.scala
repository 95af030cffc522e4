package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** PQ ADC score: `Σ_j tables[j·k + codes_j]` where `k = |tables| / m`
  * and `m = |codes|` — the approximate dot(query, vector) looked up
  * from a query's [[PqAdcTables]] against a vector's [[PqEncode]]
  * codes. This is THE per-(query, vector) hot loop of the PQ scan
  * (evaluated |corpus|·|queries| times), so it must be m primitive
  * array reads — the `aggregate`-HOF form costs ~0.1 ms/row in
  * interpreted lambda machinery (sequence alloc + boxed accumulate),
  * ~100× this.
  *
  * Accumulation is sequential j = 0..m−1 in double, identical to the
  * HOF form. Out-of-range codes (impossible by construction: PqEncode
  * emits 0..k−1) would read a neighboring subspace's entry rather than
  * throw, matching element_at's non-null contract on in-bounds PQ
  * state.
  */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(codesAny: Any, tablesAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val tables = tablesAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val k = if (m == 0) 0 else tables.numElements() / m
    var score = 0.0
    var j = 0
    while (j < m) {
      score += tables.getDouble(j * k + codes.getInt(j))
      j += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcScoreExpr", this, classOf[PqAdcScore].getName)
    defineCodeGen(ctx, ev, (c, t) =>
      s"((java.lang.Double) $ref.nullSafeEval($c, $t)).doubleValue()")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
