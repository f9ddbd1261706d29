package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM training-data pipelines.
  *
  * All functions are `Column -> Column` built from Spark built-ins and
  * higher-order array functions — row-local (no shuffle), codegen-
  * friendly, and expressible 1:1 in the DuckDB oracle dialect.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles as an array column. Row-local (no window,
    * no shuffle) — this is what keeps shingling viable at 100 TB:
    * the shingle set never leaves the scan stage.
    *
    * Higher-order-function reference implementation; production paths
    * use [[shinglesOfText]] (native codegen kernel, bit-identical).
    */
  def shinglesHof(toks: Column, n: Int = 3): Column = {
    val gen = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))
    when(size(toks) >= n, gen).otherwise(expr("array()").cast("array<string>"))
  }

  /** Native shingle kernel over the raw text column
    * ([[graft.plans.WordShingles]]). */
  def shinglesOfText(text: Column, n: Int = 3): Column =
    graft.plans.WordShingles(text, n)

  /** Shingles from a token array (delegates to the native kernel by
    * rejoining — callers that already have the text column should use
    * [[shinglesOfText]]). */
  def shingles(toks: Column, n: Int = 3): Column =
    shinglesOfText(array_join(toks, " "), n)

  /** English-ish stopwords used for quality scoring / language ID. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")

  /** Count of array elements that are in `set`. */
  def countIn(arr: Column, set: Seq[String]): Column =
    size(filter(arr, t => t.isin(set.map(lit(_)): _*))).cast("long")

  /** BPE-ish token count: alpha runs, digit runs, other non-space
    * symbols each count as one token. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long")

  /** Mean token length (Gopher-style word-length gate input). */
  def meanWordLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _)
      .cast("double") / size(toks)

  /** Non-alphanumeric-symbol count per token. */
  def symbolRatio(text: Column, toks: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") / size(toks)

  /** Repeated-bigram fraction: 1 − |distinct bigrams| / |bigrams|. */
  def repRatio(text: Column): Column = {
    val bi = shinglesOfText(text, 2)
    when(size(bi) > 0,
      lit(1.0) - size(array_distinct(bi)).cast("double") / size(bi))
      .otherwise(lit(0.0))
  }

  /** The combined Gopher-style quality gate used by `q_quality_filter`
    * and the curation pipeline: token floor, mean-word-length band,
    * symbol-ratio cap, repetition cap. Row-local. */
  def qualityPass(text: Column): Column = {
    val toks = tokens(text)
    size(toks) >= 10 &&
      meanWordLen(toks) >= 3.0 && meanWordLen(toks) <= 10.0 &&
      symbolRatio(text, toks) <= 0.1 && repRatio(text) <= 0.5
  }
}
