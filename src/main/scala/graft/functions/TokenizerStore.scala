package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TrainingB
import graft.sources.Snapshots

/** Stored BPE tokenizer artifact — the [[graft.dedup.BloomIndex]] /
  * [[graft.similarity.VectorIndex]] treatment applied to tokenizer
  * training: train the merge list ONCE (distributed, vocab-sized
  * rounds — [[TrainingB.bpeLoop]]), persist it as a Snapshots-
  * versioned table, and let every later job ENCODE against the stored
  * merges — a chain of codegen'd scan-local `replace` calls, with no
  * training aggregate anywhere in the consumer's plan.
  *
  * At 100 TB the asymmetry is the whole point: training touches the
  * corpus once (one word-count agg; the merge rounds run over the
  * vocabulary, which is millions of rows when the corpus is
  * billions), while encoding is embarrassingly row-local and runs in
  * every downstream scan for the lifetime of the tokenizer.
  */
object TokenizerStore {
  private val layoutVersion = 1

  def mergesRoot(root: String): String = s"$root/merges"

  /** Content-fingerprint default root: same corpus + same hyper-params
    * → same artifact path, so a retried build finds the existing
    * snapshot instead of retraining (the VectorIndex convention). */
  def defaultRoot(words: DataFrame, rounds: Int): String = {
    val fp = words.agg(
      bit_xor(xxhash64(col("word"), col("freq"))).as("h"),
      count(lit(1)).as("n")).head()
    s"/tmp/graft-tokenizer/v$layoutVersion/r$rounds-${fp.getLong(0)}-${fp.getLong(1)}"
  }

  /** Train `rounds` merges from a (word, freq) table and commit the
    * merge list (merge_no, pair, merged, cnt) as a snapshot version. */
  def build(words: DataFrame, root: String, rounds: Int): Long = {
    val (merges, _) = TrainingB.bpeLoop(words, rounds)
    Snapshots.commit(merges, mergesRoot(root))
  }

  /** Idempotent build: no-op when a committed merge list already
    * exists under `root` — a retried nightly run never retrains. */
  def buildIfAbsent(words: DataFrame, root: String, rounds: Int): Unit =
    if (Snapshots.latestVersion(mergesRoot(root)).isEmpty) { build(words, root, rounds); () }

  /** The stored merge list, ordered by merge_no. */
  def readMerges(spark: SparkSession, root: String): DataFrame =
    Snapshots.read(spark, mergesRoot(root)).orderBy(col("merge_no"))

  /** Encode a word column with the stored merges: the wrapped-sentinel
    * symbol string ("<h><e><l><l><o>") fed through one `replace` per
    * merge, IN merge order (BPE applies merges in training order; the
    * wrapped form shares no boundary chars between adjacent matches,
    * so one left-to-right pass per merge IS greedy BPE). The merge
    * list is collected driver-side — it is `rounds` rows by
    * construction, the broadcast-variable shape — and unrolled into
    * the column expression, so the consumer's plan is a pure row-local
    * scan. Returns the encoded symbol string (trim "<>" / split "><"
    * to get tokens). */
  def encodeSym(spark: SparkSession, root: String, word: Column): Column = {
    val merges = readMerges(spark, root)
      .select(col("pair"), col("merged")).collect()
    val sym0 = regexp_replace(word, "(.)", "<$1>")
    merges.foldLeft(sym0) { (c, m) =>
      replace(c, lit("<" + m.getString(0).replace(" ", "><") + ">"),
        lit("<" + m.getString(1) + ">"))
    }
  }
}
