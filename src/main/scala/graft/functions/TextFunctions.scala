package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the `documents` table.
  *
  * Everything here is composed from `org.apache.spark.sql.functions`
  * (codegen'd, no UDFs) so the expressions stay inside WholeStageCodegen
  * on a 100 TB scan. Each builder has an exactly-equivalent DuckDB SQL
  * form used by the oracle (see SparkEntry.oracleSql), so normalization
  * rules are deliberately regex-dialect-neutral.
  */
object TextFunctions {

  /** Lowercase, strip non-alphanumerics to single spaces, trim.
    * DuckDB equivalent: trim(lower(regexp_replace(c,'[^a-z0-9]+',' ','g'))).
    */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish piece count: letter runs, single digits, single
    * punctuation marks — a cheap stand-in for a GPT-2-style pre-tokenizer
    * that both engines evaluate identically.
    */
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))

  /** Distinct word n-gram shingles (default 3) of the normalized text.
    * Empty array when the document has fewer than n tokens.
    *
    * Built from n shifted `slice`s zipped together, NOT a
    * transform-over-indices with per-element `get`s: higher-order
    * functions are CodegenFallback (interpreted), so every child
    * expression re-evaluates on each lambda invocation — an
    * index-transform re-runs the `split` of the whole text for every
    * gram element (O(grams·n) splits per row, observed as a 1700 s
    * single-task stall at sf0.1). The zip_with form evaluates each
    * slice once per ROW.
    */
  def wordShingles(c: Column, n: Int = 3): Column =
    array_distinct(wordGrams(c, n))

  /** Word n-grams WITH multiplicity (positional) — the repetition-
    * scoring input, where duplicate grams are the signal, not noise.
    * Same shifted-slice construction as [[wordShingles]] (see that
    * Scaladoc for why not transform-over-indices).
    */
  def wordGrams(c: Column, n: Int): Column = {
    val toks = tokens(c)
    val len = greatest(size(toks) - lit(n - 1), lit(0))
    val parts = (0 until n).map(k => slice(toks, lit(k + 1), len))
    parts.reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
  }

  /** Language-marker stopword lists. Scoring = number of tokens that are
    * marker words for the language; winner = max score with ties broken
    * in (de, en, es, fr, zh) order. Classic dictionary-based language ID
    * — the marker tables are broadcast-sized at any corpus scale.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "los", "las", "que", "y", "por", "como"),
    "fr" -> Seq("le", "les", "des", "et", "une", "est", "dans", "pour"),
    "zh" -> Seq("的", "是", "不", "我", "了", "在")
  )

  def langScore(c: Column, markers: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(markers)))

  /** Predicted language code; deterministic tie-break order de<en<es<fr<zh. */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (lang, m) => lang -> langScore(c, m) }
    def pick(rest: List[(String, Column)]): Column = rest match {
      case (lang, _) :: Nil => lit(lang)
      case (lang, s) :: tail =>
        val best = tail.map(_._2) match {
          case single :: Nil => single
          case more          => greatest(more: _*)
        }
        when(s >= best, lit(lang)).otherwise(pick(tail))
      case Nil => lit("und")
    }
    pick(scores.toList)
  }

  /** Content fingerprint: first 16 hex chars of md5 of normalized text.
    * Stable content-id usable as a dedup/shard key at any scale.
    */
  def fingerprint(c: Column): Column = substring(md5(normText(c)), 1, 16)
}
