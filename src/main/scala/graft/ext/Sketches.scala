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

  /** Count-Min sketch (Cormode & Muthukrishnan 2005): d=depth hash
    * rows × w=width counters estimate per-key frequencies with
    * one-sided error (never an undercount; collisions only inflate).
    * Hashes come from the engine-portable md5 domain (row index salted
    * into the hash input), so the DuckDB oracle rebuilds the identical
    * sketch and the estimates compare exactly — the sketch is a pure
    * function of the data, not of partitioning.
    *
    * Scale shape: the build is one map-side-combinable hash agg whose
    * output is ≤ d·w rows (4×256 = 1 KiB of counters) regardless of
    * input size — the streaming-friendly alternative to a full
    * per-key count when only heavy-hitter estimates are needed. */
  /** The (row, bucket) positions a key increments — ONE definition
    * shared by build and probe; a drifted copy would read buckets the
    * build never wrote and silently deflate estimates. */
  private def cmsPositions(keyCol: String, depth: Int,
                           width: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    posexplode(array((0 until depth).map { i =>
      TextOps.hex15(concat(lit(s"cms$i|"), col(keyCol).cast("string"))) % width
    }: _*))
  }

  def countMinBuild(df: org.apache.spark.sql.DataFrame, keyCol: String,
                    depth: Int = 4, width: Int = 256): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(cmsPositions(keyCol, depth, width).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes`: min over the d counters each key
    * hashes to. A bucket no probe key ever incremented reads 0. */
  def countMinEstimate(sketch: org.apache.spark.sql.DataFrame,
                       probes: org.apache.spark.sql.DataFrame, keyCol: String,
                       depth: Int = 4, width: Int = 256): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    probes
      .select(col(keyCol), cmsPositions(keyCol, depth, width).as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Deterministic HyperLogLog (Flajolet et al. 2007) over a 60-bit
    * engine-portable hash column (TextOps.hex15 domain), precision
    * `p` ∈ [7, 14] → m = 2^p registers. bucket = h mod m; rho = 1 +
    * trailing-zero count of the remaining 60-p bits (isolated via
    * `h & -h`, whose log2 is EXACT for powers of two — no libm
    * divergence). The estimate is alpha_m·m²·2^cap / Σ 2^(cap-rho_j)
    * with cap = 61-p, the denominator summed as exact BIGINTs (a
    * double Σ2^-rho is order-dependent past 53 bits of spread; the
    * scaled-integer sum is associative, so the DuckDB oracle
    * reproduces the estimate bit-for-bit at ANY p). The ln()-based
    * small-range (linear counting) correction is deliberately omitted:
    * ln's last-ulp rounding differs between libm implementations, which
    * would break exact parity — callers below ~0.7·m distinct should
    * use the KMV sketch, which is exact in that regime.
    *
    * Error/shuffle trade vs KMV: HLL's relative error is ~1.04/√m —
    * p=8 → ~6.5%, p=12 → ~1.6%, p=14 → ~0.8% — for m INTS of register
    * state per partition (p=12 → 4096 rows into the one shuffle, still
    * nothing at executor scale), while KMV at k=64 carries ~12% error
    * in 512 bytes but turns EXACT below k distinct and supports set
    * algebra (union/intersection) on the kept hash sets. Default p=12:
    * the shuffle stays tiny and ~1.6% matches production expectations;
    * drop to p=8 only when thousands of groups each carry a sketch.
    *
    * Scale shape: two map-side-combinable hash aggs — per-bucket MAX
    * shuffles ≤ m rows per partition, the finish agg is one row. The
    * exact distinct count (for accuracy visibility) rides the same
    * per-bucket agg as a count-distinct-within-bucket, so the whole
    * query is ONE scan + one m-row shuffle.
    */
  /** Bottom-k hash-sample quantile sketch — the mergeable quantile
    * estimator beside KMV (distinct counts), HLL (register merge) and
    * CMS (frequencies). The k rows with the SMALLEST row-identity
    * hashes are a uniform random sample fixed by the hash domain, not
    * by partitioning (the KMV selection argument, applied to rows
    * instead of distinct values); quantiles interpolate over that
    * sample. Everything is a pure function of the deterministic md5
    * domain, so the DuckDB oracle reproduces estimates EXACTLY —
    * engine parity is checked bit-for-bit, not with an error band.
    *
    * Scale shape: `orderBy(hash).limit(k)` plans as
    * TakeOrderedAndProject — a per-partition k-heap plus a k-row
    * final merge, one scan, no full sort and no shuffle of the data —
    * and bottom-k sets of disjoint scans merge associatively
    * (ExtSpec pins partitioning invariance), which is what makes the
    * sketch usable as a partitioned accumulator at 100 TB. Sample
    * error is the standard ±O(1/√k) quantile-rank band; k=256 keeps
    * the state at 4 KiB.
    *
    * Hash ties (duplicate ids) break by value so the selected set is
    * well-defined in both engines; `percentile` / `quantile_cont` use
    * the same rank = q·(n−1) linear interpolation in IEEE double. */
  def bottomKQuantiles(df: org.apache.spark.sql.DataFrame, idCol: String,
                       valCol: String, k: Int = 256,
                       qs: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9))
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(k >= 2, s"bottom-k sample needs k >= 2, got $k")
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1))
    val sample = df
      .select(TextOps.hex15(concat(lit("qsk|"), col(idCol).cast("string")))
          .as("__h"),
        col(valCol).cast("double").as("__v"))
      .orderBy(col("__h").asc, col("__v").asc)
      .limit(k)
    sample.agg(
      count(lit(1)).as("n_sample"),
      qs.map(q => expr(s"percentile(__v, $q)").as(s"q${(q * 100).round}")): _*)
  }

  def hllDistinct(hashed: org.apache.spark.sql.DataFrame,
                  hashCol: String, p: Int = 12): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // lower bound 7: alpha_m = 0.7213/(1+1.079/m) only holds for m >= 128
    require(p >= 7 && p <= 14, s"HLL precision must be in [7, 14], got $p")
    val m = 1 << p
    val cap = 61 - p // max rho: (60-p) trailing zeros + 1, plus the rem==0 sentinel
    val hv = col(hashCol)
    val rem = shiftright(hv, p)
    val rho = when(rem === 0, lit(cap)).otherwise(
      (log2(rem.bitwiseAND(negate(rem)).cast("double")) + lit(1)).cast("int"))
    val regs = hashed
      .select((hv % m).cast("int").as("bucket"), rho.as("rho"), hv.as("hv"))
      .groupBy("bucket")
      .agg(max("rho").as("r"), countDistinct(col("hv")).as("nd"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    regs.agg(
        (sum(call_function("shiftleft", lit(1L), lit(cap) - col("r"))) +
          (lit(m.toLong) - count(lit(1))) * lit(1L << cap)).as("denom"),
        sum(col("nd")).as("n_exact"))
      .select(
        (alpha * lit((m.toLong * m).toDouble) * lit((1L << cap).toDouble)
          / col("denom").cast("double")).as("est_distinct"),
        col("n_exact"))
  }
}
