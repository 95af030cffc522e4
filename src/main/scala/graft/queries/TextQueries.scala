package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis operators over the `documents` table (SURVEY.md §2
  * X1–X4) — the per-document quality/language/token metadata a
  * training-data pipeline computes before filtering.
  *
  * All four are single-pass narrow maps over the corpus scan (no
  * shuffle except the final presentation ORDER BY, which a real
  * pipeline would not do): at 100 TB these run at full scan throughput
  * inside WholeStageCodegen — every function is composed from
  * `sql.functions`, no UDFs.
  */
object TextQueries {

  /** X1: dictionary language ID. The marker "tables" are literal arrays
    * folded into the plan — the degenerate (and fastest) broadcast.
    * Output includes the ground-truth `lang` column so accuracy is
    * inspectable; the oracle replays the identical scoring in SQL.
    */
  def textLangid(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  /** X2: quality scoring — length, punctuation density, stopword ratio,
    * digit ratio, and a composite keep/drop flag (the C4-style filter
    * shape).
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val txt = col("text")
    val toks = tokens(txt)
    val nTok = size(toks).cast("long")
    val enStop = langMarkers.toMap.apply("en")
    val stopRatio = round(
      size(filter(toks, t => t.isInCollection(enStop))).cast("double") /
        greatest(nTok, lit(1L)), 4)
    val punctRatio = round(
      (length(txt) - length(regexp_replace(txt, "[^a-z0-9\\s]", ""))).cast("double") /
        greatest(length(txt).cast("long"), lit(1L)), 4)
    val digitRatio = round(
      (length(txt) - length(regexp_replace(txt, "[0-9]", ""))).cast("double") /
        greatest(length(txt).cast("long"), lit(1L)), 4)
    d.select(
      col("doc_id"),
      length(txt).cast("long").as("n_chars"),
      nTok.as("n_tokens"),
      stopRatio.as("stopword_ratio"),
      punctRatio.as("punct_ratio"),
      digitRatio.as("digit_ratio"),
      (nTok >= 20 && nTok <= 1000).as("keep")
    ).orderBy("doc_id")
  }

  /** X3: token counting — whitespace tokens and a BPE-ish piece count
    * (letter runs / single digits / single punctuation), the cheap
    * stand-in for a real pre-tokenizer when budgeting token counts for
    * a 100 TB corpus.
    */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("ws_tokens"),
        bpeishCount(col("text")).cast("long").as("bpeish_tokens"))
      .orderBy("doc_id")

  /** X4: content fingerprinting — md5-prefix content id (shard/dedup
    * key) plus a winnowing-style robust fingerprint: the minimum of the
    * per-shingle hashes, stable under small edits at either end of the
    * document.
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        fingerprint(col("text")).as("content_id"),
        array_min(transform(wordShingles(col("text"), 3),
          s => substring(md5(s), 1, 16))).as("min_shingle_hash"))
      .orderBy("doc_id")
}
