package graft.dedup

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Storable bloom membership index over a key column — the daily-
  * ingest dedup prefilter as a reusable component (the inline form is
  * `q_dedup_bloom`).
  *
  * Build is DISTRIBUTED via Spark's native [[BloomFilterAggregate]]
  * (partial sketches merge map-side — the same sketch the engine's
  * own runtime row-group filters use); the result is one small binary
  * that reduces to the driver like any broadcast-var build. Because
  * it is just bytes, the index is STORABLE: a nightly job builds it
  * once from the corpus and every subsequent batch loads it instead
  * of re-scanning 100 TB. Application is a codegen'd
  * [[BloomFilterMightContain]] literal — no false negatives, so
  * pruned rows are definitely new; false positives must be confirmed
  * by an exact join (the index only prunes).
  */
object BloomIndex {

  /** Build the index over `df(keyCol)`. `expectedItems` sizes the
    * sketch (overestimating costs bytes, underestimating costs false-
    * positive rate — both degrade gracefully, correctness never
    * depends on it). SIZE FROM A COUNT at scale: a sketch sized for
    * 1M keys over a billion-doc corpus saturates and prunes nothing —
    * use [[buildSized]] (one extra count aggregate) unless the caller
    * already knows the cardinality. */
  def build(df: DataFrame, keyCol: String, expectedItems: Long = 1000000L): Array[Byte] =
    df.select(GraftBridge.column(
        new BloomFilterAggregate(hash(keyCol), expectedItems)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Build sized from the frame's own cardinality (one count
    * aggregate — negligible next to the sketch scan itself). */
  def buildSized(df: DataFrame, keyCol: String): Array[Byte] =
    build(df, keyCol, math.max(df.count(), 1L))

  /** Membership predicate for `keyCol` against a built index: true
    * means MIGHT be present (confirm with an exact join), false means
    * definitely absent. An EMPTY corpus builds a null sketch
    * ([[BloomFilterAggregate]] over zero rows) — membership is then
    * constant false (everything is new), not the null predicate a raw
    * might_contain(null, …) would produce (which would silently drop
    * every row from BOTH prune and definitelyNew). */
  def mightContain(index: Array[Byte], keyCol: String): Column =
    if (index == null) org.apache.spark.sql.functions.lit(false)
    else GraftBridge.column(new BloomFilterMightContain(
      Literal(index, BinaryType), hash(keyCol)))

  /** Keep only the rows whose key might be in the index (the rows
    * that need exact confirmation). */
  def prune(df: DataFrame, keyCol: String, index: Array[Byte]): DataFrame =
    df.filter(mightContain(index, keyCol))

  /** Keep only the rows whose key is DEFINITELY not in the index
    * (safe to ingest without any join — no false negatives). */
  def definitelyNew(df: DataFrame, keyCol: String, index: Array[Byte]): DataFrame =
    df.filter(!mightContain(index, keyCol))

  /** A null sketch (empty corpus) round-trips as a ZERO-byte file —
    * save/load stay symmetric with [[mightContain]]'s constant-false
    * handling instead of NPE-ing after sibling artifacts are already
    * written. */
  def save(index: Array[Byte], path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, if (index == null) Array.empty[Byte] else index)
  }

  def load(path: String): Array[Byte] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    if (bytes.isEmpty) null else bytes
  }

  private def hash(c: String) = new XxHash64(Seq(GraftBridge.expression(col(c))))
}
