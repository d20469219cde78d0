package graft.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native nearest-centroid argmin — the codegen fast path for the
  * k-means / product-quantization hot loops.
  *
  * `nearest_centroid(vec, cents, offset, len)` scans the centroid
  * list once and returns `struct(d2, j)`: the minimal squared-L2
  * distance over components `[offset, offset + len)` (0-based, read
  * at the SAME offsets from the vector and from each centroid — the
  * PQ subspace convention where codebook rows are full-width), and
  * the 0-based index of the winning centroid, ties to the smallest
  * index.
  *
  * Why this exists: the Column-HOF formulation — `array_min(
  * transform(cents, c => struct(dist2(slice(v), slice(c)), j)))` with
  * `dist2 = aggregate(zip_with(...))` — evaluates an interpreted
  * lambda chain and allocates two slices plus a zipped array PER
  * CENTROID PER ROW. At the trained-codebook gate config (256
  * centroids × 16 subspaces) that is ~8M interpreted evaluations per
  * 2k-vector corpus and turned the PQ family's encode from ~1 s into
  * ~17 s at sf0.1. This expression is one fused primitive loop.
  *
  * BIT-IDENTICAL to the HOF path by construction, for both element
  * domains:
  *  - LONG arrays (the integer-exact k-means fit domain): d2 is a
  *    long sum — exact, order-free;
  *  - DOUBLE arrays (PQ encode over dyadic codebook components): the
  *    per-subspace accumulation runs element 0 → len-1, the same
  *    left-to-right order as `aggregate(zip_with(...))`, so the
  *    double is the identical IEEE value;
  *  - tie rule: centroids scan in index order and replace only on
  *    strictly-smaller d2 — exactly `array_min` over struct(d2, j)
  *    (min d2, then min j). d2 of finite inputs is never NaN.
  * The unchanged DuckDB oracles of q_kmeans_fit / q_pq_* /
  * q_ivf_pq_* re-prove the equivalence value-by-value every round.
  *
  * PRECONDITIONS (all call sites guarantee them): non-null array
  * elements, every array at least `offset + len` long, centroid
  * index == the caller's centroid id domain (callers pass centroid
  * lists sorted by id with contiguous ids, or translate j through a
  * parallel id array).
  */
case class NearestCentroid(vec: Expression, cents: Expression,
                           offset: Expression, length: Expression)
    extends QuaternaryExpression {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = offset
  override def fourth: Expression = length

  private lazy val isLong: Boolean = vec.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cents.dataType, offset.dataType, length.dataType) match {
      case (ArrayType(e1, _), ArrayType(ArrayType(e2, _), _), o, l)
          if e1 == e2 && (e1 == LongType || e1 == DoubleType) &&
            (o == IntegerType || o == LongType) &&
            (l == IntegerType || l == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          "nearest_centroid requires (ARRAY<T>, ARRAY<ARRAY<T>>, INT, INT) " +
            s"with T in {LONG, DOUBLE}, got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("d2", if (isLong) LongType else DoubleType, nullable = false),
    StructField("j", IntegerType, nullable = false)))

  override def prettyName: String = "graft_nearest_centroid"

  override def nullSafeEval(v: Any, cs: Any, o: Any, l: Any): Any = {
    val off = o.asInstanceOf[Number].intValue()
    val len = l.asInstanceOf[Number].intValue()
    if (isLong)
      NearestCentroid.computeLong(
        v.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData], off, len)
    else
      NearestCentroid.computeDouble(
        v.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData], off, len)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "computeLong" else "computeDouble"
    nullSafeCodeGen(ctx, ev, (v, cs, o, l) =>
      s"${ev.value} = graft.catalyst.NearestCentroid.$fn(" +
        s"$v, $cs, (int) $o, (int) $l);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): NearestCentroid =
    copy(vec = newFirst, cents = newSecond,
      offset = newThird, length = newFourth)
}

object NearestCentroid {
  def computeLong(v: ArrayData, cs: ArrayData,
                  off: Int, len: Int): InternalRow = {
    val n = cs.numElements()
    var bestD = Long.MaxValue
    var bestJ = -1
    var c = 0
    while (c < n) {
      val cv = cs.getArray(c)
      var d = 0L
      var i = 0
      while (i < len) {
        val diff = v.getLong(off + i) - cv.getLong(off + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; bestJ = c }
      c += 1
    }
    InternalRow(bestD, bestJ)
  }

  def computeDouble(v: ArrayData, cs: ArrayData,
                    off: Int, len: Int): InternalRow = {
    val n = cs.numElements()
    var bestD = Double.PositiveInfinity
    var bestJ = -1
    var first = true
    var c = 0
    while (c < n) {
      val cv = cs.getArray(c)
      var d = 0.0
      var i = 0
      while (i < len) {
        val diff = v.getDouble(off + i) - cv.getDouble(off + i)
        d += diff * diff
        i += 1
      }
      if (first || d < bestD) { bestD = d; bestJ = c; first = false }
      c += 1
    }
    InternalRow(bestD, bestJ)
  }

  /** Idempotent session registration (used by KMeans / Similarity). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_centroid",
      exprs => NearestCentroid(exprs.head, exprs(1), exprs(2), exprs(3)),
      "built-in")
}
