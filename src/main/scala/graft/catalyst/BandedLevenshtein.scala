package graft.catalyst

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite a thresholded edit-distance PREDICATE over
  * the unbounded Levenshtein into its banded form,
  *
  *   levenshtein(a, b) <= k
  *     ==>  abs(length(a) - length(b)) <= k  AND
  *          levenshtein(a, b, k) >= 0
  *
  * The unbounded DP is O(len(a)·len(b)) per row; the banded DP is
  * O(k·len) and the length guard skips it entirely when the size gap
  * alone exceeds k — the optimization every caller of "is dist within
  * k" wants but rarely writes by hand. Null semantics are preserved
  * exactly (null input → null predicate either way), the banded
  * sentinel (-1 above threshold) maps to `>= 0`, and the rewritten
  * tree no longer matches the pattern, so the rule is idempotent
  * under the fixed-point batch. Only integer literal thresholds
  * rewrite — a column-valued threshold keeps the unbounded form.
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`), so any
  * session built with `spark.sql.extensions=graft.catalyst.GraftExtensions`
  * gets the rewrite for DataFrame and SQL predicates alike.
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  private def rewrite(a: Expression, b: Expression, k: Expression): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k),
      GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_, IntegerType)) =>
        rewrite(a, b, k)
      case GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(a, b, None)) =>
        rewrite(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(kv: Int, IntegerType))
          if kv > Int.MinValue => // kv-1 must not wrap to MaxValue
        rewrite(a, b, Literal(kv - 1))
      case GreaterThan(Literal(kv: Int, IntegerType), Levenshtein(a, b, None))
          if kv > Int.MinValue =>
        rewrite(a, b, Literal(kv - 1))
    }
}
