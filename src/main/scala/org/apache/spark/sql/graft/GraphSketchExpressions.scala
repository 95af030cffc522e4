package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** G12's HyperBall register kernels, byte-packed: a node's sketch is
  * `m = 2^b` one-byte HLL registers in a BINARY column — 4×+ smaller
  * on the per-round edge shuffle than the original `array<int>` form
  * (the bench showed g_hyperball spending half the extended suite in
  * exactly that traffic), with register-max folds running on raw
  * byte arrays instead of per-element Catalyst array access.
  *
  * Same numbers as the SQL form it replaces: xxhash64(seed 42), index
  * = low b bits, ρ = trailing zeros of the rest + 1 (capped 65−b for
  * zero rest), α·m²/Σ2^−r with linear-counting crossover, and the
  * micro floor happens per node BEFORE any cross-node sum — register
  * order fixes the double-summation order, so estimates are
  * bit-stable at any parallelism.
  */
object GraftHllSketch {

  /** A fresh sketch holding exactly `node`. */
  def init(node: Long, b: Int): Array[Byte] = {
    val m = 1 << b
    val h = XXH64.hashLong(node, 42L)
    val idx = (h & (m - 1)).toInt
    val rest = h >>> b
    val rho =
      if (rest == 0L) 65 - b
      else java.lang.Long.numberOfTrailingZeros(rest) + 1
    val regs = new Array[Byte](m)
    regs(idx) = rho.toByte
    regs
  }

  /** HLL estimate of the sketch's cardinality, micro-floored. */
  def ballMicro(regs: Array[Byte], b: Int): Long = {
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var isum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xFF
      isum += java.lang.Math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / isum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
      else raw
    math.floor(est * 1e6 + 0.5).toLong
  }
}

/** `hll_ball_micro(regs)` — codegen'd scalar readout of a byte-packed
  * sketch (the estimate stays inside whole-stage codegen via a static
  * call, the ByteEntropy pattern).
  */
case class HllBallMicro(child: Expression, b: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_ball_micro"

  override def nullSafeEval(input: Any): Any =
    GraftHllSketch.ballMicro(input.asInstanceOf[Array[Byte]], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftHllSketch.ballMicro($c, $b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
