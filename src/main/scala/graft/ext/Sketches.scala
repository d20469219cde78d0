package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch (brief §ext; Beyer et
  * al., "On synopses for distinct value estimation under multiset
  * operations", SIGMOD 2007).
  *
  * The sketch keeps the k smallest DISTINCT hash values of a column.
  * With hashes uniform on [0, 2^60) (first 15 md5 hex chars — the
  * same engine-portable integer hash domain the Sampling operators
  * use), the k-th smallest value h_k estimates the distinct count as
  * (k-1) / (h_k / 2^60); with fewer than k distinct hashes the sketch
  * IS the distinct set and the count is exact. Unlike
  * approx_count_distinct's HLL++, the estimator is a pure function of
  * a deterministic hash set — the DuckDB oracle computes the
  * IDENTICAL estimate, so engine parity is checked exactly, not with
  * an error band.
  *
  * Scale shape: runs as a partial/final typed hash aggregation — each
  * partition reduces to ≤ k longs (k=64 → 512 bytes), merges are
  * O(k·log k), and the column is never collected or distinct-shuffled
  * (contrast COUNT(DISTINCT x), which shuffles every distinct value).
  * Sketches of disjoint scans merge associatively (KmvSpec pins
  * merge ≡ whole-input), which is what makes the sketch usable as a
  * streaming/partitioned accumulator at 100 TB.
  */
object Sketches {

  /** Buffer: the ≤k smallest distinct hashes, ascending. Output:
    * (m, kth) = (buffer size, largest kept hash — the k-th minimum
    * when m == k; -1 when the buffer is short, in which case m is the
    * exact distinct count). */
  class KmvAggregator(k: Int)
      extends Aggregator[Long, Seq[Long], (Long, Long)] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    override def zero: Seq[Long] = Vector.empty

    // Sub-k-th inserts pay O(k) (linear contains + re-sort). Fine at
    // k=64: after warm-up the O(1) reject branch handles virtually
    // every row, and sub-k-th hashes arrive ~k·ln(n)/n rarely. For
    // k in the thousands, switch the buffer to a TreeSet-backed
    // bounded heap; the merge ≡ whole-input contract is unchanged.
    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      if (b.length == k && h >= b.last) b // common case after warm-up: O(1)
      else if (b.contains(h)) b
      else (h +: b).sorted.take(k)

    override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
      (x ++ y).distinct.sorted.take(k)

    override def finish(b: Seq[Long]): (Long, Long) =
      (b.length.toLong, if (b.length == k) b.last else -1L)

    override def bufferEncoder: Encoder[Seq[Long]] = Sketches.seqLong
    override def outputEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  }

  private val seqLong: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
