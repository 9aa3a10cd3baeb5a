package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, GreaterThan, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound levenshtein evaluations that feed a distance
  * filter.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic program
  * per row and then throws away every distance above k. Spark's
  * thresholded form (`Levenshtein(a, b, Some(k))`, SQL
  * `levenshtein(a, b, k)`) runs a banded DP that early-exits once the
  * distance provably exceeds k — O(k·min(|a|,|b|)) — and returns -1 for
  * "above threshold". This rule rewrites, inside `Filter` conditions:
  *
  *   levenshtein(a, b) <= k   →   abs(length(a) - length(b)) <= k
  *                                 AND levenshtein(a, b, k) >= 0
  *   levenshtein(a, b) <  k   →   same with threshold k-1
  *
  * (k a non-negative int literal; both operand orders matched). The
  * prepended length guard is implied by the distance bound — length
  * difference is a lower bound on edit distance — and costs O(1), so
  * rows with wildly different lengths never start the DP at all.
  *
  * Semantics are preserved exactly, including nulls: if either side is
  * null the original predicate is null (row dropped); the rewritten
  * conjunction is also null. The rewrite is idempotent by construction —
  * the pattern requires a threshold-free `Levenshtein`, and the output
  * contains only the thresholded form.
  *
  * Registered by `graft.functions.GraftExtensions` via
  * `injectOptimizerRule`; sessions without the extension can opt in with
  * `spark.experimental.extraOptimizations`. The fuzzy-linkage verify step
  * (`llm/Dedup.fuzzyPairs`) uses the thresholded form directly; this rule
  * catches ad-hoc SQL/DataFrame queries that don't.
  */
object ThresholdedLevenshtein extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = cond.transformUp {
        // k.value != null guards against Literal(null, IntegerType):
        // null.asInstanceOf[Int] unboxes to 0, which would rewrite the
        // always-null comparison into one that keeps equal strings.
        // NullPropagation normally folds the null form first, but that
        // ordering is not contractual under extraOptimizations.
        case LessThanOrEqual(lev @ Levenshtein(_, _, None), k @ Literal(_, IntegerType))
            if k.value != null && intVal(k) >= 0 =>
          bounded(lev, intVal(k))
        case GreaterThanOrEqual(k @ Literal(_, IntegerType), lev @ Levenshtein(_, _, None))
            if k.value != null && intVal(k) >= 0 =>
          bounded(lev, intVal(k))
        case LessThan(lev @ Levenshtein(_, _, None), k @ Literal(_, IntegerType))
            if k.value != null && intVal(k) >= 1 =>
          bounded(lev, intVal(k) - 1)
        case GreaterThan(k @ Literal(_, IntegerType), lev @ Levenshtein(_, _, None))
            if k.value != null && intVal(k) >= 1 =>
          bounded(lev, intVal(k) - 1)
      }
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
  }

  private def intVal(l: Literal): Int = l.value.asInstanceOf[Int]

  private def bounded(lev: Levenshtein, k: Int): Expression = {
    val kLit = Literal(k, IntegerType)
    val lenGuard = LessThanOrEqual(
      Abs(Subtract(Length(lev.left), Length(lev.right))), kLit)
    And(lenGuard, GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(kLit)), Literal(0, IntegerType)))
  }
}
