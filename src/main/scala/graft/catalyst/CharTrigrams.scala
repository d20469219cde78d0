package graft.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character trigrams: all length-3 code-point substrings of
  * the input (optionally distinct, first-occurrence order) in one
  * tight loop — value-identical to the composed
  * `transform(sequence(0, length-3), i -> substr(text, i+1, 3))`
  * Column form ([[graft.ext.TextOps.charShingles]] at n = 3): the
  * slices go through the SAME `UTF8String.substringSQL` the Substring
  * expression calls, so code-point semantics match by construction,
  * and fewer-than-3-code-point inputs return the empty array.
  *
  * Why native: the composed form pays one interpreted HOF element
  * per position (sequence materialization, lambda eval, per-slice
  * expression dispatch) — on the single-row-group gate fixtures this
  * work is single-core, so per-row constant factors are the whole
  * cost of the language-ID profile build. Same move as [[WinnowFp]].
  */
case class CharTrigrams(child: Expression, distinct: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_trigrams requires STRING input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_trigrams"

  override def nullSafeEval(text: Any): Any =
    CharTrigrams.compute(text.asInstanceOf[UTF8String], distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.catalyst.CharTrigrams.compute($t, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
    copy(child = newChild)
}

object CharTrigrams {

  def compute(text: UTF8String, distinct: Boolean): GenericArrayData = {
    val n = text.numChars()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val count = n - 2
    if (!distinct) {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = text.substringSQL(i + 1, 3)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i < count) {
        seen.add(text.substringSQL(i + 1, 3))
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      new GenericArrayData(out)
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_trigrams", exprs => {
        val d = exprs(1) match {
          case Literal(v: Boolean, BooleanType) => v
          case other => throw new IllegalArgumentException(
            s"char_trigrams distinct flag must be a boolean literal, got $other")
        }
        CharTrigrams(exprs.head, d)
      }, "built-in")
}
