package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` exemplar (SURVEY.md §2.12): element-wise
  * centroid of an embedding column. Partial buffers merge
  * associatively across partitions — the same partial/final shape
  * Catalyst gives builtin aggregates — so it scales like any
  * hash aggregation. Registered as a udaf over `Array[Float]` input.
  *
  * Note: double summation order varies with partitioning, so results
  * are equal to the relational (decimal-domain) centroid only to
  * ~1e-7 — tests compare with tolerance; the oracle-checked
  * q_centroid query uses the exact relational form.
  */
class CentroidAggregator(dim: Int)
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
    if (a == null) return b // skip NULL rows like builtin aggregates
    var i = 0
    while (i < dim && i < a.length) { b._1(i) += a(i); i += 1 }
    (b._1, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { x._1(i) += y._1(i); i += 1 }
    (x._1, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0) new Array[Double](dim) else b._1.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExprEnc.doubleArray, Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = ExprEnc.doubleArray
}

private object ExprEnc {
  val doubleArray: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
