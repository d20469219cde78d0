package graft.catalyst

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array — the production-width
  * sibling of [[SimHash16]]. A 16-bit fingerprint bands into only 256
  * bucket values, so on a 10⁹-document corpus each bucket holds ~N/256
  * docs and the candidate join turns quadratic; 64 bits band into
  * 4×16-bit keys (65536 values each), keeping buckets ~N/65536 and the
  * pigeonhole recall guarantee out to hamming 3 (4 bands, ≤3 flipped
  * bits → ≥1 untouched band). Same mechanism otherwise: each token
  * votes ±1 per bit of its md5-derived hash (here the first EIGHT
  * digest bytes = first 16 hex chars, big-endian), fingerprint bit b
  * set iff the vote sum is positive. One pass per document, no
  * explode, no shuffle; the portable hex-derivation keeps the DuckDB
  * oracle and the composed reference path bit-for-bit agreed
  * (SimHash64Spec). Ref: /root/reference/src/data_processing.py —
  * content-identity semantics; widened for corpus-scale dedup.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING> input, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // NULL when no non-null token contributed a vote — same contract as
  // SimHash16 (the composed explode path emits no row for such docs).
  override def nullable: Boolean = true

  override def nullSafeEval(tokens: Any): Any =
    SimHash64.computeOrNull(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |java.lang.Long ${ev.value}_r = graft.catalyst.SimHash64.computeOrNull($t);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code. NULL tokens are
    * skipped; if NO token contributes, the result is NULL, not 0. */
  def computeOrNull(tokens: ArrayData): java.lang.Long = {
    val votes = new Array[Int](64)
    val md = digest.get()
    var contributed = false
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        contributed = true
        md.reset()
        val d = md.digest(tokens.getUTF8String(i).getBytes)
        // first eight digest bytes, big-endian == first 16 hex chars
        var h = 0L
        var j = 0
        while (j < 8) {
          h = (h << 8) | (d(j) & 0xffL)
          j += 1
        }
        var b = 0
        while (b < 64) {
          votes(b) += ((((h >>> b) & 1L) << 1) - 1).toInt
          b += 1
        }
      }
      i += 1
    }
    if (!contributed) return null
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
}
