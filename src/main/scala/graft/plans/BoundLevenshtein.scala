package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{
  EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite BOUNDED edit-distance predicates to the
  * thresholded Levenshtein kernel.
  *
  * `levenshtein(x, y) <= k` computes the full O(|x|·|y|) dynamic program
  * for every pair and THEN compares; Spark's 3-arg
  * `levenshtein(x, y, k)` runs a banded O(k·min(|x|,|y|)) DP that bails
  * out the moment the distance provably exceeds k, returning -1 — so
  * `levenshtein(x, y, k) >= 0` is the same predicate at a fraction of
  * the work (the dominant cost in fuzzy-dedup joins; q_dedup_edit writes
  * the kernel by hand and documents the measurement). This rule applies
  * the rewrite AUTOMATICALLY wherever a user wrote the naive bound —
  * projection filters, join conditions, having clauses — covering:
  *
  *   lev(x,y) <= k , k >= lev(x,y)  →  lev(x,y,k) >= 0
  *   lev(x,y) <  k , k >  lev(x,y)  →  lev(x,y,k-1) >= 0
  *   lev(x,y) =  k                  →  lev(x,y,k) = k
  *
  * (k a non-negative integer literal; the 2-arg expression only — an
  * already-thresholded call is left alone). Null semantics are
  * unchanged: both forms are null-intolerant in the string children.
  *
  * Registered through [[GraftExtensions]] (`spark.sql.extensions=
  * graft.plans.GraftExtensions`) for session-wide use; tests attach the
  * same object via `spark.experimental.extraOptimizations`, the
  * sanctioned per-session injection point (builder extensions cannot be
  * retrofitted onto an already-running session).
  */
object BoundLevenshtein extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None),
          k @ Literal(v: Int, IntegerType)) if v >= 0 =>
        GreaterThanOrEqual(Levenshtein(l, r, Some(k)), Literal(0))
      case GreaterThanOrEqual(k @ Literal(v: Int, IntegerType),
          Levenshtein(l, r, None)) if v >= 0 =>
        GreaterThanOrEqual(Levenshtein(l, r, Some(k)), Literal(0))
      case LessThan(Levenshtein(l, r, None),
          Literal(v: Int, IntegerType)) if v >= 1 =>
        GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(v - 1))),
          Literal(0))
      case GreaterThan(Literal(v: Int, IntegerType),
          Levenshtein(l, r, None)) if v >= 1 =>
        GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(v - 1))),
          Literal(0))
      case EqualTo(Levenshtein(l, r, None),
          k @ Literal(v: Int, IntegerType)) if v >= 0 =>
        EqualTo(Levenshtein(l, r, Some(k)), k)
    }
}

/** Session-extension entry point (`--conf spark.sql.extensions=
  * graft.plans.GraftExtensions`): installs the engine's optimizer
  * rewrites into every session built with it. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => BoundLevenshtein)
}
