package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-sketch expressions for the dedup hot path.
  *
  * The Column-API forms of these sketches (nested `transform` /
  * `aggregate` higher-order functions) evaluate interpreted — Spark's
  * HOFs are CodegenFallback — which makes them the bottleneck of a
  * corpus scan. These expressions do the whole
  * normalize → tokenize → shingle → sketch pipeline in ONE compiled
  * loop per row, with no intermediate array materialization at all:
  * the scan stays at parquet-read speed.
  *
  * Hashing matches Spark's `xxhash64` family (XXH64, seed 42) so
  * results are stable and well-mixed; shingles are hashed by chaining
  * token hashes (hashLong composition) instead of building gram
  * strings — set cardinalities are preserved (64-bit collisions are
  * negligible), which is all MinHash/SimHash need.
  */
object TextHash {
  final val Seed = 42L

  /** Normalized whitespace tokens: lowercase, alnum runs only. */
  private[graft] def tokenHashes(s: UTF8String): Array[Long] = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val len = str.length
    while (i <= len) {
      val c = if (i < len) Character.toLowerCase(str.charAt(i)) else ' '
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) sb.append(c)
      else if (sb.length() > 0) {
        val b = UTF8String.fromString(sb.toString).getBytes
        out += XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, Seed)
        sb.setLength(0)
      }
      i += 1
    }
    out.toArray
  }

  /** Distinct hashed n-gram shingles of the normalized tokens. */
  private[graft] def shingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val toks = tokenHashes(s)
    if (toks.length < n) return Array.emptyLongArray
    val seen = new java.util.HashSet[java.lang.Long](toks.length * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](toks.length)
    var i = 0
    while (i + n <= toks.length) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(toks(i + j), h); j += 1 }
      if (seen.add(h)) out += h
      i += 1
    }
    out.toArray
  }

  def minhash(s: UTF8String, n: Int, k: Int, salts: Array[Long]): ArrayData = {
    val grams = shingleHashes(s, n)
    val sig = Array.fill(k)(Long.MaxValue)
    var g = 0
    while (g < grams.length) {
      val gh = grams(g)
      var i = 0
      while (i < k) {
        val v = XXH64.hashLong(gh, salts(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      g += 1
    }
    new GenericArrayData(sig)
  }

  def simhash(s: UTF8String): Long = {
    val toks = tokenHashes(s)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = toks(t)
      var j = 0
      while (j < 64) {
        counts(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
}

/** MinHash signature of a document: k minimums over salted hashes of
  * the distinct n-gram shingles (reference behavior: near-dup corpus
  * dedup; the banding/LSH layer lives in the DataFrame plan on top).
  */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val salts: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashLong(i.toLong, TextHash.Seed))

  override def nullSafeEval(input: Any): Any =
    TextHash.minhash(input.asInstanceOf[UTF8String], n, k, salts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct hashed n-gram shingles of a document (array<long>), the
  * set representation every shingle-based dedup joins and intersects
  * on. One compiled normalize → tokenize → hash-chain loop per row;
  * set cardinality equals the string-gram set's (64-bit collisions
  * negligible), so Jaccard over these ids is exact.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.shingleHashes(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleExpr", this, classOf[ShingleHashes].getName)
    defineCodeGen(ctx, ev, c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunk boundaries (array<int> of cut positions,
  * 1-based, ascending, excluding the final position) — the D16
  * boundary rule `hash(trailing w chars) mod mask == 0` evaluated
  * with a TRUE rolling hash: one multiply-subtract-add per character
  * (O(n)) instead of the Column-HOF form's re-fold per position
  * (O(n·w), interpreted — it benched as the slowest extended entry).
  *
  * Exactness contract: the window hash is the same polynomial the
  * declarative form and the DuckDB oracle fold — h(i) =
  * Σ c_{i−w+1+j}·31^{w−1−j} mod 2^20 — maintained incrementally as
  * `h' = (h − c_out·31^{w−1})·31 + c_in (mod 2^20)`; the modulus is a
  * power of two, so `& (2^20−1)` on the two's-complement long IS the
  * mathematical mod even through the subtraction. Boundaries are
  * therefore bit-identical to the fold, just w× cheaper.
  */
case class CdcBoundaries(child: Expression, w: Int, mask: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  private val M = 1048576L
  private val topPow: Long = {
    var p = 1L
    var k = 0
    while (k < w - 1) { p = (p * 31L) & (M - 1); k += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // CODEPOINT semantics throughout: positions are codepoint indices
    // and hashed values are codepoint values, matching the chunk
    // builder's Spark `length()`/`substr()` (codepoint-based) and the
    // oracle's `ascii()` per-char hash. Iterating UTF-16 code units
    // here (charAt/length) silently shifted boundaries on any
    // supplementary-plane character (emoji, rare CJK) — it only
    // agreed because the corpus is BMP-only; this holds the
    // bit-equality contract off the BMP too.
    val nUnits = s.length
    val cps = new Array[Int](s.codePointCount(0, nUnits))
    var ci = 0
    var off = 0
    while (off < nUnits) {
      val cp = s.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val n = cps.length
    if (n < w) return new GenericArrayData(Array.emptyIntArray)
    val out = new scala.collection.mutable.ArrayBuffer[Int](8)
    var h = 0L
    var i = 0
    while (i < w) { h = (h * 31L + cps(i)) & (M - 1); i += 1 }
    if (h % mask == 0) out += w
    while (i < n) {
      h = ((h - cps(i - w) * topPow) * 31L + cps(i)) & (M - 1)
      i += 1
      if (h % mask == 0) out += i
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcExpr", this, classOf[CdcBoundaries].getName)
    defineCodeGen(ctx, ev, c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte-distribution entropy of a binary payload, in one compiled
  * pass per row (M9's hot loop): struct(n_bytes, n_distinct_bytes,
  * entropy_micro). The declarative form (hex-pair explode → groupBy →
  * micro-rounded terms) shuffles |payload| rows per document and
  * benched ~10 s at sf0.1; this is the identical arithmetic — the
  * same `-(p)·ln(p)·1e6` double shape, positive-half-up rounding,
  * exact long term sums (order-free because terms round BEFORE
  * summing) — with zero shuffle and a 256-int histogram per row.
  */
case class ByteEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_distinct_bytes", IntegerType, nullable = false),
    StructField("entropy_micro", LongType, nullable = false)))
  override def prettyName: String = "byte_entropy"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    val counts = new Array[Int](256)
    var i = 0
    while (i < n) { counts(bytes(i) & 0xFF) += 1; i += 1 }
    var distinct = 0
    var ent = 0L
    var b = 0
    while (b < 256) {
      val c = counts(b)
      if (c > 0) {
        distinct += 1
        val p = c.toDouble / n
        ent += Math.round(-p * Math.log(p) * 1e6)
      }
      b += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(n.toLong, distinct, ent)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteEntExpr", this, classOf[ByteEntropy].getName)
    defineCodeGen(ctx, ev, c => s"(org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of the normalized token stream. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextHash.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash64].getName)
    defineCodeGen(ctx, ev, c => s"((java.lang.Long) $ref.nullSafeEval($c)).longValue()")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
