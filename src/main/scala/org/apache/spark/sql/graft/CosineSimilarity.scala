package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over `array<float>` as a native Catalyst
  * expression with whole-stage codegen.
  *
  * This is the hot inner loop of brute-force ANN (SURVEY.md A1) and
  * embedding-dedup (D5): at 100 TB the corpus-side scan evaluates this
  * once per (query, vector) pair, so it must stay inside
  * WholeStageCodegen — a Scala UDF would box every array element.
  * Accumulation is sequential left-to-right in double precision, which
  * keeps results bit-comparable to the DuckDB oracle's
  * `list_dot_product` on `DOUBLE[]`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |double gDot = 0.0, gNa = 0.0, gNb = 0.0;
      |int gN = java.lang.Math.min($a.numElements(), $b.numElements());
      |for (int gI = 0; gI < gN; gI++) {
      |  double gX = (double) $a.getFloat(gI);
      |  double gY = (double) $b.getFloat(gI);
      |  gDot += gX * gY; gNa += gX * gX; gNb += gY * gY;
      |}
      |${ev.value} = (gNa == 0.0 || gNb == 0.0)
      |  ? 0.0 : gDot / (java.lang.Math.sqrt(gNa) * java.lang.Math.sqrt(gNb));
      """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
