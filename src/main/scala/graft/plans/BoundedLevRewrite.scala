package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.BoundedLevenshteinExpr

/** Optimizer rule: a comparison of full `levenshtein(a, b)` against an
  * integer literal only needs the BANDED distance — `min(lev, k+1)` decides
  * `lev <= k` exactly, in O(k·n) with early exit instead of O(n·m)
  * ([[BoundedLevenshteinExpr]]). Users keep writing the standard
  * `levenshtein(a, b) <= 2` predicate (portable SQL, what every similarity
  * tutorial shows); the rule swaps in the banded form the way Catalyst's
  * own rewrites turn `count(*) > 0` exists-subqueries into semi-joins —
  * declarative surface, specialized execution.
  *
  * Rewritten shapes (both operand orders): `lev <= k`, `lev < k`,
  * `lev = k` (k ≥ 0 — distance-k bands also decide exact equality at k).
  * Guards: the literal must be a non-negative INT below [[MaxK]] (past
  * that the band is the whole matrix and the rewrite is pointless), and
  * Spark's own three-arg thresholded `levenshtein(a, b, t)` is left
  * alone — the user already chose a bound. Strict `>` / `>=` against the
  * full distance genuinely needs the unbounded value, so those never
  * rewrite.
  *
  * Installed by [[graft.functions.GraftFunctions.register]] via
  * `spark.experimental.extraOptimizations` (works on an existing session)
  * and by `GraftExtensions` via `injectOptimizerRule` for
  * `spark.sql.extensions`-configured deployments. */
object BoundedLevRewrite extends Rule[LogicalPlan] {

  /** Above this the band covers typical strings anyway — skip. */
  val MaxK = 1000

  private def le(a: Expression, b: Expression, k: Int): Expression =
    LessThanOrEqual(BoundedLevenshteinExpr(a, b, k), Literal(k))
  private def eq(a: Expression, b: Expression, k: Int): Expression =
    EqualTo(BoundedLevenshteinExpr(a, b, k), Literal(k))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(a, b, None), IntegerLiteral(k))
      if k >= 0 && k <= MaxK => le(a, b, k)
    case GreaterThanOrEqual(IntegerLiteral(k), Levenshtein(a, b, None))
      if k >= 0 && k <= MaxK => le(a, b, k)
    case LessThan(Levenshtein(a, b, None), IntegerLiteral(k))
      if k >= 1 && k <= MaxK + 1 => le(a, b, k - 1)
    case GreaterThan(IntegerLiteral(k), Levenshtein(a, b, None))
      if k >= 1 && k <= MaxK + 1 => le(a, b, k - 1)
    case EqualTo(Levenshtein(a, b, None), IntegerLiteral(k))
      if k >= 0 && k <= MaxK => eq(a, b, k)
    case EqualTo(IntegerLiteral(k), Levenshtein(a, b, None))
      if k >= 0 && k <= MaxK => eq(a, b, k)
  }
}
