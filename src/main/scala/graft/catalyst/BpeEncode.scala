package graft.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-pair-encoding merge loop as a native expression: one
  * pretoken string in, the ARRAY of merged symbols out. This is the
  * step the reference-free pretokenizer (TextOps.bpePretokens)
  * deliberately stopped short of — with it, token COUNTS for corpus
  * sizing come from an actual merge table instead of the pretoken
  * upper bound.
  *
  * Algorithm (the canonical encoder loop): split the token into code
  * points, then repeatedly find the LOWEST-ranked adjacent symbol
  * pair present in the merge table and fuse all its leftmost
  * non-overlapping occurrences, until no adjacent pair is ranked.
  * Per-row imperative, zero shuffle — the expression is a projection
  * and rides whole-stage codegen via a static call (same pattern as
  * [[SimHash16]]).
  *
  * The merge table is validated CLOSED at construction: every
  * compound symbol a merge consumes must be produced by an
  * earlier-ranked merge. Real learned BPE tables have this property
  * by construction, and it is what makes the merge order confluent —
  * fusing pair p can only create pairs ranked after p, so "merge all
  * occurrences of the current minimum" and "merge one occurrence at a
  * time" converge to the same encoding (the DuckDB oracle exploits
  * exactly this equivalence with iterated single replaces).
  */
case class BpeEncode(child: Expression,
                     merges: Seq[(String, String)] = BpeEncode.DefaultMerges)
    extends UnaryExpression {

  private lazy val table = new BpeTable(merges)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires STRING input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(token: Any): Any =
    BpeEncode.encode(token.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.catalyst.BpeEncode.encode($t, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Rank-indexed merge table: pair (a, b) -> rank (lower fuses first). */
final class BpeTable(merges: Seq[(String, String)]) extends Serializable {
  require(merges.nonEmpty, "empty merge table")
  require(merges.distinct.length == merges.length, "duplicate merge pair")
  // closure: each side of merge i is a single code point or the
  // product of an earlier merge
  locally {
    val produced = scala.collection.mutable.HashSet.empty[String]
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      Seq(a, b).foreach { s =>
        require(s.codePointCount(0, s.length) == 1 || produced.contains(s),
          s"merge table not closed: rank-$i side '$s' is neither a code " +
            "point nor produced by an earlier merge")
      }
      produced += a + b
    }
  }

  private val ranks: Map[String, Map[String, Int]] =
    merges.zipWithIndex.groupBy(_._1._1).map { case (a, g) =>
      a -> g.map { case ((_, b), r) => b -> r }.toMap
    }

  def rank(a: String, b: String): Int =
    ranks.get(a).flatMap(_.get(b)).getOrElse(Int.MaxValue)
}

object BpeEncode {

  /** A tiny hand-built table over common English bigrams (leading
    * space included, GPT-2 style). Deliberately fixed and public: the
    * correctness oracle inlines the SAME ranked list, so both engines
    * encode from identical vocab. A deployment swaps in its learned
    * table via the expression's `merges` parameter. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("th", "e"), ("an", "d"), ("in", "g"), ("o", "u"),
    ("l", "e"), ("s", "t"), (" ", "t"), (" ", "a"), (" ", "the"))

  /** Shared by interpreted eval and generated code. */
  def encode(token: UTF8String, table: BpeTable): ArrayData = {
    val s = token.toString
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cc = Character.charCount(s.codePointAt(i))
      syms.add(s.substring(i, i + cc))
      i += cc
    }
    var done = syms.size < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = table.rank(syms.get(j), syms.get(j + 1))
        if (r < best) { best = r; bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        val a = syms.get(bi)
        val b = syms.get(bi + 1)
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            out.add(a + b); k += 2
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms = out
        done = syms.size < 2
      }
    }
    val arr = new Array[Any](syms.size)
    var m = 0
    while (m < syms.size) { arr(m) = UTF8String.fromString(syms.get(m)); m += 1 }
    new GenericArrayData(arr)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_encode", exprs => BpeEncode(exprs.head), "built-in")
}
