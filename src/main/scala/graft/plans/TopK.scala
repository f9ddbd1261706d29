package graft.plans

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate: keeps the k best (score, id) pairs per
  * group, ordered by (score desc, id asc).
  *
  * The window form (`row_number().over(partitionBy(key).orderBy(...))
  * <= k`) must shuffle and sort EVERY candidate row. As an Aggregator
  * the top-k buffer combines map-side: each partition sends at most k
  * pairs per key to the shuffle — at a billion candidates per query
  * vector that is the difference between shuffling k rows and
  * shuffling all of them.
  *
  * Tie-break (id asc) makes results identical to the deterministic
  * window formulation, so the same DuckDB oracle validates both paths.
  */
case class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], List[(Double, Long)]] {

  private def insert(b: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    // k is small (top-k); insertion into a sorted list is O(k)
    val merged = (x :: b).sortBy(t => (-t._1, t._2))
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Double, Long)] = Nil
  override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    insert(b, a)
  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
    b2.foldLeft(b1)(insert)
  override def finish(r: List[(Double, Long)]): List[(Double, Long)] = r

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
}
