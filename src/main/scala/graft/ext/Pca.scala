package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top principal direction + "all-but-the-top" (ABTT) embedding
  * post-processing (Mu & Viswanath, ICLR 2018: embedding sets share a
  * large common direction; removing it restores isotropy and lifts
  * every cosine-based task) — the missing post-processing stage next
  * to the quantize/PQ/binary family.
  *
  * Determinism architecture (what lets a DuckDB oracle value-check an
  * eigen-computation):
  *  1. embeddings quantize to round(x·scale) LONGS (the KMeans rule:
  *     floor(x·scale + 0.5)) and the scatter statistics (n, Σq,
  *     Σ qqᵀ) accumulate in exact integer arithmetic — order-free, so
  *     ONE typed-Aggregator pass with associative partial buffers is
  *     bit-identical under any partitioning;
  *  2. the centered scatter M = n·Σqqᵀ − (Σq)(Σq)ᵀ derives per entry
  *     as one double expression over exact longs — deterministic IEEE,
  *     identical in both engines;
  *  3. power iteration runs DRIVER-SIDE on the d×d matrix (d² doubles
  *     — the bounded-collect class, like the bloom bitmap: the matrix
  *     is dimension-sized, never data-sized) with fixed iteration
  *     count and left-to-right folds, the exact order DuckDB's
  *     list_sum reproduces; init = e_k at the largest diagonal (ties
  *     to the smallest index), and M is PSD so no sign flips occur —
  *     a final convention (negate unless the largest-|v_i| component,
  *     ties smallest i, is positive) pins the sign anyway.
  *
  * Scale shape: the only data pass is the aggregation — the shuffle
  * carries numPartitions × (d² + d + 1) longs, never the corpus; the
  * eigen-iteration is O(d²·iters) scalar work that belongs on the
  * driver at ANY corpus size. Overflow bound: Σq² entries reach
  * n·(scale·maxAbs)²; at scale 8192 and |x| ≤ 4 that holds n to
  * ~8×10⁹ rows — beyond that drop `scale` a notch or feed a sample
  * (the top direction converges on far smaller samples; the knob and
  * the bound are the contract, not a silent cap).
  */
object Pca {

  /** (n, Σq [d], Σ qqᵀ [d·d] row-major) — all-long, exact. */
  class ScatterAggregator(dim: Int, scale: Long)
      extends Aggregator[Array[Float], (Long, Array[Long], Array[Long]),
        (Long, Array[Long], Array[Long])] {

    override def zero: (Long, Array[Long], Array[Long]) =
      (0L, new Array[Long](dim), new Array[Long](dim * dim))

    override def reduce(b: (Long, Array[Long], Array[Long]),
                        a: Array[Float]): (Long, Array[Long], Array[Long]) = {
      if (a == null) return b
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        q(i) = math.floor(a(i).toDouble * scale + 0.5).toLong
        i += 1
      }
      i = 0
      while (i < dim) {
        b._2(i) += q(i)
        var j = 0
        while (j < dim) { b._3(i * dim + j) += q(i) * q(j); j += 1 }
        i += 1
      }
      (b._1 + 1, b._2, b._3)
    }

    override def merge(x: (Long, Array[Long], Array[Long]),
                       y: (Long, Array[Long], Array[Long])): (Long, Array[Long], Array[Long]) = {
      var i = 0
      while (i < dim) { x._2(i) += y._2(i); i += 1 }
      i = 0
      while (i < dim * dim) { x._3(i) += y._3(i); i += 1 }
      (x._1 + y._1, x._2, x._3)
    }

    override def finish(b: (Long, Array[Long], Array[Long])): (Long, Array[Long], Array[Long]) = b

    override def bufferEncoder: Encoder[(Long, Array[Long], Array[Long])] =
      Encoders.tuple(Encoders.scalaLong, PcaEnc.longArray, PcaEnc.longArray)
    override def outputEncoder: Encoder[(Long, Array[Long], Array[Long])] =
      bufferEncoder
  }

  /** The driver-side eigen step, shared by [[topComponent]] and the
    * oracle-parity spec: returns (sumQ, v, lambda, trace). */
  private[ext] def powerIterate(n: Long, s: Array[Long], s2: Array[Long],
                                dim: Int, iters: Int)
      : (Array[Double], Double, Double) = {
    val m = Array.tabulate(dim, dim)((i, j) =>
      n.toDouble * s2(i * dim + j).toDouble - s(i).toDouble * s(j).toDouble)
    var k = 0
    var i = 1
    while (i < dim) { if (m(i)(i) > m(k)(k)) k = i; i += 1 }
    var v = Array.tabulate(dim)(i => if (i == k) 1.0 else 0.0)
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += m(i)(j) * v(j); j += 1 }
        acc
      }
      var nrm2 = 0.0
      i = 0
      while (i < dim) { nrm2 += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(nrm2)
      v = w.map(_ / nrm)
      it += 1
    }
    // sign convention: the largest-|v_i| component (ties smallest i)
    // is non-negative
    var a = 0
    i = 1
    while (i < dim) { if (math.abs(v(i)) > math.abs(v(a))) a = i; i += 1 }
    if (v(a) < 0) v = v.map(x => -x)
    val w = Array.tabulate(dim) { i =>
      var acc = 0.0; var j = 0
      while (j < dim) { acc += m(i)(j) * v(j); j += 1 }
      acc
    }
    var lambda = 0.0
    i = 0
    while (i < dim) { lambda += v(i) * w(i); i += 1 }
    var trace = 0.0
    i = 0
    while (i < dim) { trace += m(i)(i); i += 1 }
    (v, lambda, trace)
  }

  private def scatter(df: DataFrame, vecCol: String, dim: Int,
                      scale: Long): (Long, Array[Long], Array[Long]) = {
    val agg = udaf(new ScatterAggregator(dim, scale))
    val row = df.select(agg(col(vecCol)).as("s")).head().getStruct(0)
    (row.getLong(0), row.getSeq[Long](1).toArray,
      row.getSeq[Long](2).toArray)
  }

  /** One row per dimension: (dim_id, sum_q — the exact integer column
    * sum, pc1 — the top principal direction, lambda / trace — the
    * Rayleigh quotient and total variance of the n²-scaled scatter,
    * repeated per row so the frame is self-contained). */
  def topComponent(df: DataFrame, idCol: String, vecCol: String,
                   dim: Int = 64, scale: Long = 8192L,
                   iters: Int = 12): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (n, s, s2) = scatter(df, vecCol, dim, scale)
    require(n > 0, "empty corpus")
    val (v, lambda, trace) = powerIterate(n, s, s2, dim, iters)
    (0 until dim).map(i => (i.toLong, s(i), v(i), lambda, trace))
      .toDF("dim_id", "sum_q", "pc1", "lambda", "trace")
  }

  /** OPQ-lite rotation (the "R before the subspace split" of
    * Optimized Product Quantization, Ge et al. CVPR'13, reduced to
    * its first-order term): a single Householder reflection
    * H = I − 2wwᵀ/‖w‖² that maps the corpus's top principal
    * direction onto coordinate axis 0, so the dominant shared
    * variance direction (the Mu & Viswanath common direction the
    * ABTT family measures) lands entirely inside PQ subspace 0
    * instead of smearing across all `numSub` codebooks. H is
    * exactly orthogonal for any w, so L2 distances — and therefore
    * the exact-NN ground truth — are preserved up to IEEE noise;
    * only the subspace DECOMPOSITION changes, which is the entire
    * OPQ objective. Full OPQ alternates R against the codebook fit;
    * this one-reflection form is the deterministic, oracle-checkable
    * first iterate (the rotation is a pure function of the
    * [[topComponent]] power iteration already pinned by q_pca_top).
    *
    * Determinism: w = v − β·e₀ with β = −sign(v₀) (‖w‖² = 2 + 2|v₀|,
    * never degenerate), ‖w‖² and the per-row dot both left-to-right
    * folds — the exact op sequence the DuckDB oracle replays — so
    * the rotated doubles are bit-identical in both engines.
    *
    * Scale shape: the training pass is [[ScatterAggregator]]'s one
    * map-side-combined aggregation over `train` (shuffles
    * numPartitions × (d²+d+1) longs, never the corpus); application
    * is a zero-shuffle per-row projection against `w` as a literal.
    * Returns (idCol, vecCol) with vecCol rotated to array<double> —
    * drop-in for every (id, vector) seam in the PQ family. */
  def opqRotate(df: DataFrame, idCol: String, vecCol: String,
                train: DataFrame, dim: Int = 64, scale: Long = 8192L,
                iters: Int = 12): DataFrame = {
    val (n, s, s2) = scatter(train, vecCol, dim, scale)
    require(n > 0, "empty training corpus")
    val (v, _, _) = powerIterate(n, s, s2, dim, iters)
    val beta = if (v(0) >= 0) -1.0 else 1.0
    val w = v.clone(); w(0) = v(0) - beta
    var nw2 = 0.0
    var i = 0
    while (i < dim) { nw2 += w(i) * w(i); i += 1 }
    val wl = typedLit(w.toSeq)
    val x = transform(col(vecCol), c => c.cast("double"))
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (p, q) => p * q), lit(0.0), _ + _)
    df.select(col(idCol), x.as("__x"))
      .withColumn("__wx", dot(col("__x"), wl))
      .select(col(idCol),
        zip_with(col("__x"), wl,
          (xi, wi) => xi - lit(2.0) * col("__wx") / lit(nw2) * wi)
          .as(vecCol))
  }

  /** ABTT projection removal: x′ = x − (x·v)v per row against the
    * broadcast direction — zero shuffle. Emits the projection and the
    * before/after squared norms (left-to-right folds, engine-equal);
    * post-processed similarity just uses x′. */
  def abtt(df: DataFrame, idCol: String, vecCol: String,
           dim: Int = 64, scale: Long = 8192L, iters: Int = 12): DataFrame = {
    val (n, s, s2) = scatter(df, vecCol, dim, scale)
    require(n > 0, "empty corpus")
    val (v, _, _) = powerIterate(n, s, s2, dim, iters)
    val vl = typedLit(v.toSeq)
    val x = transform(col(vecCol), c => c.cast("double"))
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (p, q) => p * q), lit(0.0), _ + _)
    df.select(col(idCol), x.as("__x"))
      .withColumn("proj", dot(col("__x"), vl))
      .withColumn("norm2_before", dot(col("__x"), col("__x")))
      .withColumn("__xp",
        zip_with(col("__x"), vl, (xi, vi) => xi - col("proj") * vi))
      .withColumn("norm2_after", dot(col("__xp"), col("__xp")))
      .select(col(idCol), col("proj"), col("norm2_before"),
        col("norm2_after"))
  }
}

private object PcaEnc {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
