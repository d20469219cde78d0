package graft.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity over two double arrays — the codegen fast
  * path for the similarity operators. One fused loop accumulates
  * dot(a,b), ‖a‖², ‖b‖² simultaneously where the Column-HOF
  * composition (`aggregate(zip_with(...))` × 3) walks the arrays three
  * times through higher-order-function plumbing. The accumulation
  * order per sum is identical to the HOF path (element 0 → n-1), so
  * results are BIT-IDENTICAL — pinned by CosineSimilaritySpec and by
  * the unchanged DuckDB oracles of every similarity query.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine requires two ARRAY<DOUBLE> inputs, got $other")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  // may return NULL for non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.computeOrNull(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.catalyst.CosineSimilarity.computeOrNull($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Shared by interpreted eval and generated code. Zero vectors
    * yield NaN exactly like the HOF division does. Mismatched lengths
    * or a null element yield NULL — also exactly like the HOF path
    * (zip_with pads with nulls; null poisons the running aggregate),
    * so the bit-identical claim holds on those edges too. */
  def computeOrNull(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    java.lang.Double.valueOf(dot / (Math.sqrt(na) * Math.sqrt(nb)))
  }

  /** Idempotent session registration (used by the Similarity ops). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
}
