package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound edit-distance predicates before they run.
  *
  * `levenshtein(a, b) <= d` appears in every fuzzy-match filter/join, and
  * evaluated naively it is an O(|a|·|b|) dynamic program PER CANDIDATE
  * PAIR — the dominant cost of a similarity join even after blocking. Two
  * exact rewrites shrink it:
  *
  *   1. **Length-band guard**: `lev(a, b) ≥ abs(len(a) − len(b))` is a
  *      theorem (every insertion/deletion moves length by one), so
  *      `abs(length(a) − length(b)) <= d AND …` is implied by the
  *      original predicate — prepending it changes nothing semantically,
  *      and conjunction short-circuit skips the DP entirely for pairs
  *      whose lengths already rule them out.
  *   2. **Threshold push-down**: Spark's three-argument
  *      `Levenshtein(a, b, threshold)` runs the banded O(d·min(len))
  *      variant and returns −1 past the threshold — so
  *      `lev(a, b) <= d  ⟺  lev(a, b, d) >= 0`. The full DP never runs
  *      even for pairs that pass the band.
  *
  * Matches `<=`/`<` and their reversed (`d >= lev`, `d > lev`) forms with
  * a foldable non-negative integer bound, in `Filter` and `Join`
  * conditions. Idempotent by construction: the rewrite produces only
  * thresholded `Levenshtein` nodes, which no pattern matches again, and a
  * condition that ALREADY carries a hand-written length band for the same
  * pair (either argument order) is left alone — the author's guard wins.
  *
  * Null semantics are preserved: a null input nulls both the band guard
  * and the thresholded comparison exactly as it nulled the original.
  *
  * Wired into every driver session via
  * `spark.experimental.extraOptimizations` ([[graft.LocalSession]]) and
  * into `--conf spark.sql.extensions` deployments via
  * [[graft.GraftExtensions]].
  */
object LevenshteinBandGuard extends Rule[LogicalPlan] {

  private def bound(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) if v >= 0 => Some(v)
    case _ => None
  }

  /** condition already carries abs(length−length) over this pair? */
  private def hasBand(cond: Expression, l: Expression, r: Expression): Boolean =
    cond.exists {
      case Abs(Subtract(Length(a), Length(b), _), _) =>
        (a.semanticEquals(l) && b.semanticEquals(r)) ||
          (a.semanticEquals(r) && b.semanticEquals(l))
      case _ => false
    }

  /** `abs(length(l) − length(r)) <= d  AND  levenshtein(l, r, d) >= 0` */
  private def banded(l: Expression, r: Expression, d: Int): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(l), Length(r))),
        Literal(d, IntegerType)),
      GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(d, IntegerType))),
        Literal(0, IntegerType)))

  private def rewriteCond(cond: Expression): Expression = {
    def open(l: Expression, r: Expression) = !hasBand(cond, l, r)
    cond.transformUp {
      case LessThanOrEqual(Levenshtein(l, r, None), d)
          if bound(d).isDefined && open(l, r) =>
        banded(l, r, bound(d).get)
      case GreaterThanOrEqual(d, Levenshtein(l, r, None))
          if bound(d).isDefined && open(l, r) =>
        banded(l, r, bound(d).get)
      // strict forms: lev < d  ⟺  lev <= d−1 (d >= 1; d <= 0 is
      // constant-false and left for the constant folder to deal with)
      case LessThan(Levenshtein(l, r, None), d)
          if bound(d).exists(_ >= 1) && open(l, r) =>
        banded(l, r, bound(d).get - 1)
      case GreaterThan(d, Levenshtein(l, r, None))
          if bound(d).exists(_ >= 1) && open(l, r) =>
        banded(l, r, bound(d).get - 1)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val next = rewriteCond(cond)
      if (next.fastEquals(cond)) f else f.copy(condition = next)
    case j @ Join(_, _, _, Some(cond), _) =>
      val next = rewriteCond(cond)
      if (next.fastEquals(cond)) j else j.copy(condition = Some(next))
  }
}
