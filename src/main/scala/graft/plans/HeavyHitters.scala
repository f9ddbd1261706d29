package graft.plans

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a MERGEABLE map-side
  * aggregate: a bounded table of at most `k` (item, count) entries.
  *
  * Guarantee (Misra-Gries 1982; mergeability per Agarwal et al. 2012,
  * "Mergeable Summaries"): after summarizing N items, every item's
  * summary count undercounts its true frequency by at most N/(k+1),
  * so any item with true frequency > N/(k+1) is PRESENT in the
  * summary — no false negatives above the threshold. False positives
  * are expected and harmless when the summary is used as a candidate
  * PRUNER with an exact recount behind it (the bloom-dedup
  * philosophy: the sketch bounds the work, the exact pass owns
  * correctness).
  *
  * Scale shape: each map task sends at most k entries to the shuffle
  * regardless of vocabulary size — vs a full token groupBy whose
  * exchange carries the whole vocabulary.
  */
object MisraGries {
  /** MG decrement: drop every counter by the (k+1)-th largest value
    * and discard non-positive entries — the summary shrinks to ≤ k
    * while preserving the undercount bound. */
  def shrink(k: Int, m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val cut = m.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (t, c) =>
        val d = c - cut; if (d > 0) Some(t -> d) else None
      }
    }

  /** Summary union + shrink — associative and commutative; the bound
    * degrades additively (Agarwal et al. 2012). */
  def mergeSummaries(k: Int, b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else shrink(k, b2.foldLeft(b1) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    })
}

case class HeavyHittersAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    MisraGries.shrink(k, b.updated(a, b.getOrElse(a, 0L) + 1L))
  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    MisraGries.mergeSummaries(k, b1, b2)
  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

/** Merges STORED Misra-Gries summaries (the partial-aggregate shape:
  * a daily job materializes one ≤ k-entry summary per day, and any
  * window's heavy-hitter CANDIDATES come from merging the stored
  * partials — raw data never re-scanned for the sketch). Same
  * guarantee as [[HeavyHittersAgg]]: merged summaries have no false
  * negatives above N/(k+1) over the merged stream. */
case class MgMergeAgg(k: Int)
    extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long], a: Map[String, Long]): Map[String, Long] =
    MisraGries.mergeSummaries(k, b, a)
  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    MisraGries.mergeSummaries(k, b1, b2)
  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
