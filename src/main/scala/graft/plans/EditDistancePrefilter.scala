package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Optimizer rule: cheap length prefilter for edit-distance
  * thresholds.
  *
  * `WHERE levenshtein(a, b) <= k` runs the O(|a|·|b|) DP for every
  * candidate pair — in an ER blocking join that is the verify stage's
  * whole cost. But edit distance is bounded below by the length
  * difference, so `abs(length(a) − length(b)) <= k` is a necessary
  * condition costing two length reads. This rule conjoins it:
  *
  *   levenshtein(a, b) <= k  →  abs(len(a) − len(b)) <= k AND
  *                              levenshtein(a, b) <= k
  *
  * (all four comparison spellings). Exact under three-valued logic: a
  * null operand makes both conjuncts NULL; a FALSE prefilter implies
  * the DP comparison is FALSE too (lev ≥ |len diff| > k), so
  * AND-semantics never change a row. Conjunction order matters —
  * Spark evaluates And left-to-right, so the guard short-circuits the
  * DP. Idempotent by construction (a guarded comparison is left
  * untouched), which the fixed-point optimizer batch requires.
  *
  * Only the 2-argument levenshtein is rewritten: the 3-argument
  * thresholded form already bails out early inside the kernel.
  */
object EditDistancePrefilter extends Rule[LogicalPlan] {

  private def lenDiffGuard(
      a: Expression, b: Expression,
      mk: (Expression, Expression) => Expression, k: Expression): Option[Expression] =
    if (a.dataType == StringType && b.dataType == StringType &&
      a.deterministic && b.deterministic)
      Some(mk(Abs(Subtract(Length(a), Length(b))), k))
    else None

  private def intLit(e: Expression): Boolean = e match {
    case Literal(_, IntegerType) => true
    case _ => false
  }

  /** The guard this rule would attach to `cmp`, if `cmp` is a
    * thresholded 2-arg levenshtein comparison.
    */
  private def guardOf(cmp: Expression): Option[Expression] = cmp match {
    case LessThanOrEqual(Levenshtein(a, b, None), k) if intLit(k) =>
      lenDiffGuard(a, b, LessThanOrEqual, k)
    case LessThan(Levenshtein(a, b, None), k) if intLit(k) =>
      lenDiffGuard(a, b, LessThan, k)
    case GreaterThanOrEqual(k, Levenshtein(a, b, None)) if intLit(k) =>
      lenDiffGuard(a, b, LessThanOrEqual, k)
    case GreaterThan(k, Levenshtein(a, b, None)) if intLit(k) =>
      lenDiffGuard(a, b, LessThan, k)
    case _ => None
  }

  private def rec(e: Expression): Expression = e match {
    // already guarded: leave the whole subtree alone (the comparison
    // below has no further levenshtein nodes)
    case a @ And(g, c) if guardOf(c).exists(_.semanticEquals(g)) => a
    case cmp =>
      guardOf(cmp) match {
        case Some(g) => And(g, cmp)
        case None => cmp.mapChildren(rec)
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformWithPruning(
    _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.FILTER)) {
    case f @ Filter(cond, child) =>
      val newCond = rec(cond)
      if (newCond.fastEquals(cond)) f else Filter(newCond, child)
  }
}
