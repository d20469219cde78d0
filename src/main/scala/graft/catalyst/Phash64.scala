package graft.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Perceptual (pHash-style) 64-bit media fingerprint over the opaque
  * payload column: container header stripped (length data-dependent,
  * from the sniffed kind — same contract as
  * [[graft.ext.Multimodal.contentSignature]]), bytes folded into an
  * 8×8 integer "luma" grid, 2-D integer DCT-II, and one bit per AC
  * coefficient — set when the coefficient exceeds the median AC.
  * Identical content in a different container hashes identically;
  * slightly perturbed content lands a few Hamming bits away; unrelated
  * content is ~32 bits away (each AC coefficient clears the median
  * half the time). The real-codec luma plane is the stubbed step
  * (this container ships no image codec — the grid fold is a
  * deterministic stand-in, like decodeStub); the DCT → median-sign
  * pipeline after it is the REAL pHash computation and is what the
  * DuckDB oracle re-derives integer-for-integer.
  *
  * Layout puts AC coefficient k (1..63) at bit 63 − k and leaves the
  * DC slot (bit 0 position 63) clear, so the hash is always
  * non-negative — no engine-specific 64-bit sign wrap to dodge
  * (the SimHash64 lesson).
  *
  * The grid fold is built for LOCALITY, the property the whole hash
  * rides on: cell c accumulates bytes j ≡ c (mod 64) with a small
  * CYCLIC weight (j div 64) mod 7 + 1, reduced mod 1 000 003 — so one
  * flipped byte moves one cell by at most 255·7 = 1785 (a wrap at the
  * modulus boundary is the rare exception), which shifts every DCT
  * coefficient by a sliver and flips only the bits whose coefficient
  * sat near the median. An unboundedly growing weight (or a small
  * modulus) would make a single byte flip randomize its whole cell
  * and the "perceptual" property would vanish.
  *
  * Integer bounds: grid cells < 1 000 003; |C| ≤ 10⁴, so the inner
  * product ≤ 8·10⁶·10⁴ = 8·10¹⁰ and a full coefficient ≤
  * 8·10⁴·8·10¹⁰ = 6.4·10¹⁵ — comfortably inside BIGINT for both
  * engines.
  *
  * Scale shape: per-row projection, zero shuffle, codegen via a
  * static call. At 100 TB the 8-byte hash + two 32-bit bands are what
  * move; payloads never shuffle.
  */
case class Phash64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"phash64 requires (BINARY, INT), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "phash64"

  override def nullSafeEval(payload: Any, hdr: Any): Any =
    Phash64.compute(payload.asInstanceOf[Array[Byte]],
      hdr.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, h) =>
      s"${ev.value} = graft.catalyst.Phash64.compute($p, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Phash64 =
    copy(left = newLeft, right = newRight)
}

object Phash64 {

  /** Scaled DCT-II basis: Coef(u)(x) = round(10⁴·cos((2x+1)uπ/16)).
    * Math.cos is IEEE-deterministic, and the oracle SQL interpolates
    * THESE values, so both engines share one matrix by construction. */
  val Coef: Array[Array[Long]] = Array.tabulate(8, 8)((u, x) =>
    Math.round(10000.0 * Math.cos((2 * x + 1) * u * Math.PI / 16.0)))

  private final val GridMod = 1000003L

  /** Shared by interpreted eval and generated code. */
  def compute(payload: Array[Byte], hdr: Int): Long = {
    val start = math.max(0, math.min(hdr, payload.length))
    // stubbed "decode": fold content bytes into an 8x8 grid with a
    // small CYCLIC position weight (see scaladoc: locality is the
    // point — one flipped byte must move its cell by ≤ 1785)
    val luma = new Array[Long](64)
    var i = start
    while (i < payload.length) {
      val j = i - start
      val c = j & 63
      luma(c) = (luma(c) +
        (payload(i) & 0xff).toLong * ((j >> 6) % 7 + 1)) % GridMod
      i += 1
    }
    // T = C · G · Cᵗ, all integer
    val inner = new Array[Long](64) // inner(v*8+x) = Σ_y G(x,y)·C(v,y)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0L
        var y = 0
        while (y < 8) { s += luma(x * 8 + y) * Coef(v)(y); y += 1 }
        inner(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    val t = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v2 = 0
      while (v2 < 8) {
        var s = 0L
        var x = 0
        while (x < 8) { s += Coef(u)(x) * inner(v2 * 8 + x); x += 1 }
        t(u * 8 + v2) = s
        v2 += 1
      }
      u += 1
    }
    // median AC = 32nd smallest of the 63 AC coefficients
    val ac = java.util.Arrays.copyOfRange(t, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var hash = 0L
    var k = 1
    while (k < 64) {
      if (t(k) > med) hash |= 1L << (63 - k)
      k += 1
    }
    hash
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "phash64", exprs => Phash64(exprs(0), exprs(1)), "built-in")
}
