package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Blockhash-style 64-bit perceptual signature of a binary payload in
  * one compiled pass: the first `maxBytes` bytes are cut into
  * `nBlocks` equal blocks, and bit b is set iff block b's unsigned
  * byte-sum exceeds the mean block sum (`nBlocks·sum(b) > total`) —
  * scale- and brightness-shift-robust in the image world, pure byte
  * arithmetic here (no codecs).
  *
  * The Column form (hex() + per-byte conv() inside nested HOF lambdas)
  * is interpreted with NO common-subexpression elimination across
  * lambda boundaries, so the inner byte materialization re-evaluates
  * per outer element — O(nBlocks²·maxBytes²) string work per row
  * (observed as a one-core hang). Here it is one O(maxBytes) loop over
  * the raw bytes per row, inside whole-stage codegen.
  */
case class BlockhashSig(child: Expression, nBlocks: Int, maxBytes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nBlocks >= 1 && nBlocks <= 64, s"nBlocks must be in [1, 64], got $nBlocks")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "blockhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = math.min(bytes.length, maxBytes)
    if (n == 0) return 0L
    val bs = (n + nBlocks - 1) / nBlocks // ceil(n / nBlocks)
    val sums = new Array[Long](nBlocks)
    var i = 0
    while (i < n) { sums(i / bs) += bytes(i) & 0xff; i += 1 }
    var total = 0L
    var b = 0
    while (b < nBlocks) { total += sums(b); b += 1 }
    var sig = 0L
    b = 0
    while (b < nBlocks) {
      if (sums(b) * nBlocks > total) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blockhashExpr", this, classOf[BlockhashSig].getName)
    defineCodeGen(ctx, ev,
      c => s"((java.lang.Long) $ref.nullSafeEval($c)).longValue()")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
