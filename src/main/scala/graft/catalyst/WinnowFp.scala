package graft.catalyst

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native winnowing fingerprints straight from the TOKEN array
  * (Schleimer/Wilkerson/Aiken MOSS selection): hash every word
  * k-gram shingle (hex15-of-md5 — the engine-portable long domain
  * every fingerprint op shares), slide a w-hash window, keep each
  * window's minimum, return the DISTINCT selected fingerprints in
  * first-occurrence order — exactly the values (and explode
  * semantics) of the composed Column formulation it replaces, pinned
  * by the unchanged DuckDB oracles.
  *
  * Why native: the Column form evaluates one md5 expression per
  * shingle plus a slice/array_min pair per window through codegen'd
  * but allocation-heavy array HOFs; this is ONE scalar call per
  * document with a reused thread-local digest and primitive long
  * arrays — same plan shape (shuffle-free projection), less per-row
  * interpretation. The same move as [[MinHashSig]] / [[SimHash64]].
  *
  * NULL contract (matches the composed path): fewer than k tokens →
  * null (the exploded row disappears, as the empty-array form did);
  * shingles containing a null token are skipped.
  */
case class WinnowFp(child: Expression, shingleK: Int, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp requires ARRAY<STRING> tokens input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(tokens: Any): Any =
    WinnowFp.compute(tokens.asInstanceOf[ArrayData], shingleK, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("wfResult")
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |ArrayData $resultTerm = graft.catalyst.WinnowFp.compute($t, $shingleK, $window);
         |if ($resultTerm == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $resultTerm;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of the digest as a non-negative long —
    * nibbles 0..14 = bytes 0..6 and the high nibble of byte 7,
    * identical to `conv(substring(md5(s), 1, 15), 16, 10)`. */
  private def hex15(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def compute(tokens: ArrayData, shingleK: Int, window: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < shingleK) return null
    val tokenBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tokenBytes(i) =
        if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val md = digest.get()
    val hashCount = n - shingleK + 1
    val hs = new Array[Long](hashCount)
    val valid = new Array[Boolean](hashCount)
    var start = 0
    while (start < hashCount) {
      var ok = true
      var k = 0
      while (k < shingleK) { if (tokenBytes(start + k) == null) ok = false; k += 1 }
      valid(start) = ok
      if (ok) {
        md.reset()
        k = 0
        while (k < shingleK) {
          if (k > 0) md.update(' '.toByte)
          md.update(tokenBytes(start + k))
          k += 1
        }
        hs(start) = hex15(md.digest())
      }
      start += 1
    }
    // the composed path hashes wordShingles output, where concat_ws
    // SKIPS nulls — but the library only feeds split() tokens (never
    // null), so null-token shingles are simply skipped here, the
    // MinHashSig contract
    if (!valid.exists(identity)) return null
    // window minima over the hash sequence, in window order; when the
    // doc has fewer than `window` hashes there is ONE window spanning
    // everything (sequence(1, greatest(1, H - w + 1)) semantics)
    val nWindows = math.max(1, hashCount - (window - 1))
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nWindows) {
      var m = Long.MaxValue
      var any = false
      var t = j
      val end = math.min(hashCount, j + window)
      while (t < end) {
        if (valid(t) && hs(t) < m) { m = hs(t); any = true }
        t += 1
      }
      if (any) seen.add(m)
      j += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fp", exprs => {
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"winnow_fp $what must be an int literal, got $other")
        }
        WinnowFp(exprs.head, intLit(exprs(1), "shingleK"),
          intLit(exprs(2), "window"))
      }, "built-in")
}
