package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer extension (SURVEY.md §4.3 / §2.11: the `Rule[LogicalPlan]`
  * surface): guards `levenshtein(a, b) <= k` predicates with the implied
  * cheap pre-filter `abs(length(a) - length(b)) <= k`.
  *
  * Soundness: edit distance is bounded below by the length difference
  * (every insert/delete changes the length by one, substitutions not at
  * all), so the guard never removes a qualifying row. Benefit: the
  * conjunction evaluates left-to-right under codegen, so candidate pairs
  * whose lengths already differ by more than k never run the O(|a|·|b|)
  * dynamic program — in a blocked fuzzy join the guard skips most
  * in-block candidates for the price of two length reads.
  *
  * Idempotent by construction (safe under the optimizer's fixed-point
  * driver and repeated extraOptimizations batches): a guard is only
  * added when no semantically-equal conjunct already exists.
  *
  * Registered per-session via `spark.experimental.extraOptimizations`
  * (see GraftExtensions.installOptimizations) — the runtime twin of
  * `SparkSessionExtensions.injectOptimizerRule`.
  */
object LevenshteinGuard extends Rule[LogicalPlan] {

  private def guardFor(lev: Levenshtein, bound: Expression): Expression =
    LessThanOrEqual(
      Abs(Subtract(Length(lev.left), Length(lev.right))), bound)

  /** Split a condition into top-level conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  private def addGuards(cond: Expression): Expression = {
    val cs = conjuncts(cond)
    val out = cs.flatMap {
      case leq @ LessThanOrEqual(lev: Levenshtein, bound @ Literal(_, _)) =>
        val g = guardFor(lev, bound)
        if (cs.exists(_.semanticEquals(g))) Seq(leq) else Seq(g, leq)
      case other => Seq(other)
    }
    out.reduce(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val guarded = addGuards(cond)
      if (guarded.fastEquals(cond)) f else f.copy(condition = guarded)
    case j @ Join(_, _, _, Some(cond), _) =>
      val guarded = addGuards(cond)
      if (guarded.fastEquals(cond)) j else j.copy(condition = Some(guarded))
  }
}
