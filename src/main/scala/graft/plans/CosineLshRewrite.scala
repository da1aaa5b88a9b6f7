package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.CosineSimilarity

/** Optimizer extension (SURVEY.md §4.3's last custom-work row, VERDICT
  * r10 task 2): rewrites a BRUTE-FORCE cosine-threshold join — a join
  * whose only cross-side predicate is `cosine_sim(a, b) >= τ` (no
  * equi-join key, so Spark can only plan a CartesianProduct or
  * BroadcastNestedLoopJoin: the O(N²) shape that melts at 100 TB) —
  * into the sign-cell LSH-bucketed form llm_ann_ivf / llm_dedup_embed
  * hand-write:
  *
  *  - both sides gain an 8-bit sign cell (signs of the first 8
  *    embedding dimensions);
  *  - the LEFT side explodes into its own cell + the 8 hamming-1
  *    flips (9 probes — a pair within hamming distance 1 matches
  *    through EXACTLY one probe, so no dedup step is needed);
  *  - the join becomes an EQUI-JOIN on (probe = cell) with the
  *    original exact-cosine predicate kept as the verification filter;
  *  - a final Project restores the original output (the helper
  *    columns never escape).
  *
  * Both sides then shuffle ONCE on the cell key and only same-bucket
  * candidate pairs materialize. The trade is the hand-written ops'
  * documented LSH recall miss: a qualifying pair whose sign cells
  * differ in ≥ 2 of the first 8 dimensions is lost — near-dups
  * disagree only on dimensions near zero, so the 1-bit slack absorbs
  * noise sign-flips. Because the rewrite is an APPROXIMATION, it is
  * opt-in: inert unless `spark.graft.lsh.rewrite.enabled=true` (the
  * same contract as engine hints that trade exactness for a plan
  * class — never a silent default).
  *
  * Idempotent: the rewritten join HAS a cross-side equality conjunct
  * (probe = cell), which the guard treats as an existing equi-key, so
  * a second pass leaves it alone. Registered per-session via
  * `spark.experimental.extraOptimizations`
  * (GraftExtensions.installOptimizations) and via
  * `injectOptimizerRule` on the `spark.sql.extensions` path.
  */
object CosineLshRewrite extends Rule[LogicalPlan] {

  val Flag = "spark.graft.lsh.rewrite.enabled"

  /** Sign cell of the first 8 dimensions: bit i set iff vec[i] > 0.
    * Unrolled Adds (no HOF): stays codegen-friendly and resolves
    * without the analyzer. */
  private def signCell(vec: Expression): Expression =
    (0 until 8).map { i =>
      If(
        GreaterThan(ElementAt(vec, Literal(i + 1)),
          Cast(Literal(0), ElementAt(vec, Literal(i + 1)).dataType)),
        Literal(1 << i), Literal(0)): Expression
    }.reduce(Add(_, _))

  /** probes(cell) = [cell, cell^1, cell^2, …, cell^128] — 9 distinct
    * ints (a flip always changes the cell). */
  private def probes(cell: Expression): Expression =
    CreateArray(cell +: (0 until 8).map(j =>
      BitwiseXor(cell, Literal(1 << j)): Expression))

  /** Top-level conjuncts of a condition. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** The (leftVec, rightVec) of a cosine-threshold conjunct, oriented
    * so the first element references only `left` and the second only
    * `right`; None if the conjunct is not that shape. */
  private def cosineSides(c: Expression, left: LogicalPlan,
                          right: LogicalPlan): Option[(Expression, Expression)] = {
    def orient(a: Expression, b: Expression) =
      if (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) Some((a, b))
      else if (b.references.subsetOf(left.outputSet) &&
               a.references.subsetOf(right.outputSet)) Some((b, a))
      else None
    c match {
      case GreaterThanOrEqual(cs: CosineSimilarity, Literal(_, _)) =>
        orient(cs.left, cs.right)
      case GreaterThan(cs: CosineSimilarity, Literal(_, _)) =>
        orient(cs.left, cs.right)
      case LessThanOrEqual(Literal(_, _), cs: CosineSimilarity) =>
        orient(cs.left, cs.right)
      case LessThan(Literal(_, _), cs: CosineSimilarity) =>
        orient(cs.left, cs.right)
      case _ => None
    }
  }

  /** True when some conjunct already equi-joins the two sides — Spark
    * will plan a hash/sort-merge join; nothing to rescue. */
  private def hasEquiKey(cs: Seq[Expression], left: LogicalPlan,
                         right: LogicalPlan): Boolean =
    cs.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty) ||
        (b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty)
      case EqualNullSafe(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty) ||
        (b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(Flag, "false") != "true") return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if cosineFindable(j) =>
        val cs = conjuncts(cond)
        val (lv, rv) = cs.flatMap(cosineSides(_, left, right)).head
        // LEFT: explode the 9 probes of the left vector's sign cell
        val explode = Explode(probes(signCell(lv)))
        val probeAttr = AttributeReference("__lsh_probe", IntegerType,
          nullable = false)()
        val gen = Generate(explode, unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(probeAttr), child = left)
        // RIGHT: the right vector's own sign cell
        val cellAlias = Alias(signCell(rv), "__lsh_cell")()
        val proj = Project(right.output :+ cellAlias, right)
        val newCond = And(EqualTo(probeAttr, cellAlias.toAttribute), cond)
        Project(j.output, Join(gen, proj, Inner, Some(newCond), hint))
    }
  }

  private def cosineFindable(j: Join): Boolean = j match {
    case Join(left, right, Inner, Some(cond), _) =>
      val cs = conjuncts(cond)
      !hasEquiKey(cs, left, right) &&
        cs.exists(cosineSides(_, left, right).isDefined)
    case _ => false
  }
}
