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
case class HeavyHittersAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  /** MG decrement: drop every counter by the (k+1)-th largest value
    * and discard non-positive entries — the summary shrinks to ≤ k
    * while preserving the undercount bound. */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val cut = m.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (t, c) =>
        val d = c - cut; if (d > 0) Some(t -> d) else None
      }
    }

  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    shrink(b.updated(a, b.getOrElse(a, 0L) + 1L))
  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else shrink(b2.foldLeft(b1) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    })
  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
