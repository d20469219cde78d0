package graft.catalyst

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature straight from the TOKEN array: for each
  * seed s in 0..numHashes-1, the minimum md5(s || '|' || shingle)
  * over all word n-gram shingles — shingles are never materialized as
  * strings; the digest is fed token bytes + separators incrementally,
  * which is byte-identical to hashing the joined shingle. Returned as
  * lowercase hex (hex encoding is order-preserving, so unsigned
  * digest-byte comparison equals hex-string order), exactly the
  * portable formulation the DuckDB oracles and the composed Column
  * path use. Duplicate shingles cannot change a minimum, so no
  * dedup is needed for signature parity with the distinct-shingle
  * composed path.
  *
  * Taking tokens (not a shingle array) matters for plan shape:
  * a shingle-array input column built from `transform(...)` gets
  * inlined by CollapseProject into every reference, re-running the
  * tokenizing split per element. Here the whole shingle+hash stage is
  * ONE scalar call per document — a shuffle-free projection.
  */
case class MinHashSig(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING> tokens input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(tokens: Any): Any =
    MinHashSig.compute(tokens.asInstanceOf[ArrayData], shingleN, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("mhResult")
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |ArrayData $resultTerm = graft.catalyst.MinHashSig.compute($t, $shingleN, $numHashes);
         |if ($resultTerm == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $resultTerm;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic digest comparison == hex-string order. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** NULL when the document has fewer than shingleN tokens — the same
    * absence the exploded path produces for shingle-less docs. */
  def compute(tokens: ArrayData, shingleN: Int, numHashes: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < shingleN) return null
    val tokenBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tokenBytes(i) =
        if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val seedBytes = (0 until numHashes)
      .map(s => String.valueOf(s).getBytes("UTF-8")).toArray
    val mins = new Array[Array[Byte]](numHashes)
    val md = digest.get()
    var start = 0
    var any = false
    while (start <= n - shingleN) {
      var ok = true
      var k = 0
      while (k < shingleN) { if (tokenBytes(start + k) == null) ok = false; k += 1 }
      if (ok) {
        any = true
        var s = 0
        while (s < numHashes) {
          md.reset()
          md.update(seedBytes(s))
          md.update('|'.toByte)
          k = 0
          while (k < shingleN) {
            if (k > 0) md.update(' '.toByte)
            md.update(tokenBytes(start + k))
            k += 1
          }
          val d = md.digest()
          if (mins(s) == null || less(d, mins(s))) mins(s) = d
          s += 1
        }
      }
      start += 1
    }
    if (!any) return null
    new GenericArrayData(mins.map(toHex(_).asInstanceOf[Any]))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => {
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig $what must be an int literal, got $other")
        }
        MinHashSig(exprs.head, intLit(exprs(1), "shingleN"),
          intLit(exprs(2), "numHashes"))
      }, "built-in")
}
