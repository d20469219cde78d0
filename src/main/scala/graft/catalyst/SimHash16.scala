package graft.catalyst

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 16-bit SimHash over a token array — one pass per document.
  * The Column-composition path explodes (doc × token × 16 bits) and
  * aggregates twice (two shuffles); this expression is a plain
  * projection: NO explode, NO shuffle, the fingerprint computed where
  * the row already lives. Hash derivation is identical to the
  * portable formulation (first two md5 digest bytes = first four hex
  * chars), so the DuckDB oracle and the composition path agree
  * bit-for-bit — pinned by SimHash16Spec and the unchanged q_simhash
  * oracle.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires ARRAY<STRING> input, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  // NULL when no non-null token contributed a vote (empty / all-null
  // array): the composed explode path emits no row for such a doc, so
  // a 0L here would be a value the composition can never produce.
  // Mirrors MinHashSig's no-shingle NULL.
  override def nullable: Boolean = true

  override def nullSafeEval(tokens: Any): Any =
    SimHash16.computeOrNull(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |java.lang.Long ${ev.value}_r = graft.catalyst.SimHash16.computeOrNull($t);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code. NULL tokens are
    * skipped (explode drops them in the composition path too); if NO
    * token contributes, the result is NULL, not 0. */
  def computeOrNull(tokens: ArrayData): java.lang.Long = {
    val votes = new Array[Int](16)
    val md = digest.get()
    var contributed = false
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        contributed = true
        md.reset()
        val d = md.digest(tokens.getUTF8String(i).getBytes)
        // first two digest bytes == first four hex chars of md5(tok)
        val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        var b = 0
        while (b < 16) {
          votes(b) += (((h >> b) & 1) << 1) - 1
          b += 1
        }
      }
      i += 1
    }
    if (!contributed) return null
    var fp = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash16", exprs => SimHash16(exprs.head), "built-in")
}
