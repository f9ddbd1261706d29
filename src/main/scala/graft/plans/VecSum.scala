package graft.plans

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector-sum accumulator: (running sums, row count). */
case class VecAcc(sum: Array[Double], n: Long)

/** Map-side element-wise vector-sum aggregate.
  *
  * Centroid training the naive way — `posexplode` each vector to
  * (dim, value) rows, then groupBy(label, dim) — multiplies the row
  * count by the dimensionality BEFORE the shuffle: 64-d vectors mean
  * 64× the exchange volume. This Aggregator keeps the sum as one
  * array per group and combines map-side, so exactly ONE row per
  * (label) crosses the shuffle regardless of dimensionality; the tiny
  * per-label result is exploded to long format after.
  *
  * Dimensionality is taken from the first row (zero is the empty
  * array), so the same aggregate works for any vector width.
  */
object VecSumAgg extends Aggregator[Array[Double], VecAcc, VecAcc] {

  private def add(sum: Array[Double], v: Array[Double]): Array[Double] =
    if (sum.length == 0) v.clone()
    else {
      val out = new Array[Double](sum.length)
      var i = 0
      while (i < sum.length) { out(i) = sum(i) + v(i); i += 1 }
      out
    }

  override def zero: VecAcc = VecAcc(Array.empty[Double], 0L)
  override def reduce(b: VecAcc, a: Array[Double]): VecAcc =
    VecAcc(add(b.sum, a), b.n + 1)
  override def merge(b1: VecAcc, b2: VecAcc): VecAcc =
    if (b1.n == 0) b2
    else if (b2.n == 0) b1
    else VecAcc(add(b1.sum, b2.sum), b1.n + b2.n)
  override def finish(r: VecAcc): VecAcc = r

  override def bufferEncoder: Encoder[VecAcc] = ExpressionEncoder[VecAcc]()
  override def outputEncoder: Encoder[VecAcc] = ExpressionEncoder[VecAcc]()
}
