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
}
