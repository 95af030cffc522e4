package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-analysis expressions for the per-document metadata hot
  * path (language ID, fingerprinting).
  *
  * Why native: the Column-API forms are chains of higher-order
  * functions (`filter`, `transform`) which are CodegenFallback
  * (interpreted), and CollapseProject inlines the shared
  * tokenize-normalize subtree into EVERY consumer — language ID with 5
  * marker lists re-ran the full regex normalize + split ~10× per row.
  * These expressions tokenize once per row in one compiled loop.
  *
  * Semantics match the Column/SQL-oracle forms exactly:
  * normalization = lowercase, ASCII-alnum runs are tokens, everything
  * else separates (same as regexp_replace(lower(s),'[^a-z0-9]+',' ')).
  */
object TextAnalysis {

  /** Normalized token strings (see class doc for the normalization). */
  private[graft] def tokenStrings(s: UTF8String): Array[String] = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[String](64)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val len = str.length
    while (i <= len) {
      val c = if (i < len) Character.toLowerCase(str.charAt(i)) else ' '
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) sb.append(c)
      else if (sb.length() > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    out.toArray
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** First 16 lowercase-hex chars of the md5 of `s` — matches
    * substring(md5(s), 1, 16) in both Spark and DuckDB.
    */
  private def md5Prefix16(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Minimum md5-prefix over the document's word n-grams (winnowing-
    * style robust fingerprint); null when fewer than n tokens.
    */
  def minGramMd5(s: UTF8String, n: Int): UTF8String = {
    val toks = tokenStrings(s)
    if (toks.length < n) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(48)
    var min: String = null
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = md5Prefix16(md, sb.toString)
      if (min == null || h.compareTo(min) < 0) min = h
      i += 1
    }
    UTF8String.fromString(min)
  }

  /** Dictionary language ID: score = number of tokens (with
    * multiplicity) in each language's marker set; winner = first
    * language in declaration order with the maximal score.
    */
  def langId(s: UTF8String, langs: Array[String],
             markers: Array[java.util.HashSet[String]]): UTF8String = {
    val toks = tokenStrings(s)
    var bestLang = 0
    var bestScore = -1
    var l = 0
    while (l < langs.length) {
      val set = markers(l)
      var score = 0
      var t = 0
      while (t < toks.length) {
        if (set.contains(toks(t))) score += 1
        t += 1
      }
      if (score > bestScore) { bestScore = score; bestLang = l }
      l += 1
    }
    UTF8String.fromString(langs(bestLang))
  }
}

/** One-pass per-document quality counters — the inputs to the C4-style
  * quality ratios. Returns raw counts; the ratio division and rounding
  * stay in (codegen'd) Column arithmetic so numeric semantics are
  * identical to the previous pure-Column form:
  *   - n_chars:  character count of the raw text
  *   - n_tokens: normalized-token count with `split` semantics (an
  *               all-separator document yields 1, matching
  *               split/string_split returning [""])
  *   - n_stop:   tokens (with multiplicity) in the stopword set
  *   - n_punct:  raw chars outside [a-z0-9] and Java \\s (so uppercase
  *               counts as punctuation — same as the regex it replaces)
  *   - n_digit:  raw chars in [0-9]
  */
case class TextStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false)))
  override def prettyName: String = "text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add); s
  }

  override def nullSafeEval(input: Any): Any = {
    val u8 = input.asInstanceOf[UTF8String]
    val str = u8.toString
    var punct = 0L; var digit = 0L
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      val isDigit = c >= '0' && c <= '9'
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (isDigit) digit += 1
      if (!(c >= 'a' && c <= 'z') && !isDigit && !isWs) punct += 1
      i += 1
    }
    val toks = TextAnalysis.tokenStrings(u8)
    var stop = 0L
    var t = 0
    while (t < toks.length) { if (stopSet.contains(toks(t))) stop += 1; t += 1 }
    val nTok = if (toks.length == 0) 1L else toks.length.toLong
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](u8.numChars().toLong, nTok, stop, punct, digit))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStatsExpr", this, classOf[TextStatsExpr].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Language ID over marker word lists — one compiled
  * tokenize-and-score pass per row. Tie-break: first language in
  * `markers` order wins (same as the when-chain Column form).
  */
case class LangIdExpr(child: Expression, markerLists: Seq[(String, Seq[String])])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  @transient private lazy val langs: Array[String] = markerLists.map(_._1).toArray
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    markerLists.map { case (_, ws) =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(s.add); s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    TextAnalysis.langId(input.asInstanceOf[UTF8String], langs, sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdExpr", this, classOf[LangIdExpr].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Minimum md5-prefix over word n-grams (robust content fingerprint);
  * null for documents with fewer than n tokens.
  */
case class MinGramMd5(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_gram_md5"

  override def nullSafeEval(input: Any): Any =
    TextAnalysis.minGramMd5(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minGramMd5Expr", this, classOf[MinGramMd5].getName)
    // result is null for sub-n-token documents even when input is not
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
