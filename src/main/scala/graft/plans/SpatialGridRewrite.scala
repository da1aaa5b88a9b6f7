package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer extension completing the rescue-rule family
  * ([[CosineLshRewrite]] cosine threshold, its top-k sibling,
  * [[JaccardLshRewrite]] text, [[RangeBucketRewrite]] 1-D bands): the
  * 2-D EUCLIDEAN-RADIUS join. A naive spatial join is written as a
  * theta self-join on the squared-distance predicate
  *
  *   (ax − bx)·(ax − bx) + (ay − by)·(ay − by) <= R²
  *
  * — no equi key, so Spark can only plan a CartesianProduct or
  * BroadcastNestedLoopJoin: O(N·M) distance evaluations, the shape
  * that melts when neither side broadcasts. This rule rewrites it into
  * the grid-cell equi-join `joinSpatialRadius` hand-writes
  * (Joins.scala — the standard spatial-bin plan every distributed geo
  * engine produces):
  *
  *  - cell width W = ⌈√R²⌉, so any within-R pair is at most one cell
  *    apart per axis;
  *  - the LEFT side explodes into its 3×3 cell neighborhood — two
  *    stacked Generates over `sequence(floordiv(ax) − 1,
  *    floordiv(ax) + 1)` (and the y twin);
  *  - the RIGHT side contributes its OWN cell (floordiv(bx),
  *    floordiv(by)) as join-key expressions — each qualifying pair
  *    meets in exactly one (cellx, celly), so no dedup step exists;
  *  - the original predicate stays as the residual filter, discarding
  *    same-neighborhood near-misses;
  *  - a final Project restores the original output.
  *
  * Like RangeBucketRewrite this is EXACT, not approximate — but cell
  * division must be FLOOR division (`(c − pmod(c, W)) div W`), not
  * Spark's truncating IntegralDivide: truncation collapses (−W, W)
  * into one double-width cell 0, and a pair straddling it at distance
  * just under 2W would violate the one-cell-apart invariant. Floor
  * keeps |a − b| <= W ⟹ |floor(a/W) − floor(b/W)| <= 1 for any sign.
  *
  * Shuffle is keyed on cells (~9× point mass on the exploded side,
  * never pairs); per-cell work is local density²; a skewed hot cell
  * AQE-splits like any hash join. Opt-in
  * (`spark.graft.spatial.rewrite.enabled=true`) like its siblings: a
  * plan-class change the user should see themselves flip. Idempotent:
  * the rewritten join HAS cross-side equality conjuncts (the cell
  * keys), which the shared equi-key guard treats as join keys.
  * Integral coordinate types only.
  */
object SpatialGridRewrite extends Rule[LogicalPlan] {

  val Flag = "spark.graft.spatial.rewrite.enabled"

  /** One squared axis gap oriented (left expr, right expr) — the two
    * factors of the Multiply must be the SAME subtraction, with one
    * end on each side of the join. (p−q)² = (q−p)², so orientation is
    * normalized here. */
  private case class AxisGap(l: Expression, r: Expression)

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def axisOf(e: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[AxisGap] = e match {
    case Multiply(Subtract(p, q, _), Subtract(p2, q2, _), _)
        if p.semanticEquals(p2) && q.semanticEquals(q2) &&
          isIntegral(p) && isIntegral(q) =>
      if (p.references.nonEmpty && q.references.nonEmpty &&
          p.references.subsetOf(left.outputSet) &&
          q.references.subsetOf(right.outputSet)) Some(AxisGap(p, q))
      else if (p.references.nonEmpty && q.references.nonEmpty &&
          q.references.subsetOf(left.outputSet) &&
          p.references.subsetOf(right.outputSet)) Some(AxisGap(q, p))
      else None
    case _ => None
  }

  private def asLong(l: Literal): Option[Long] = l match {
    case Literal(v: Byte, ByteType)   => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType)   => Some(v)
    case _                            => None
  }

  private case class RadiusCond(x: AxisGap, y: AxisGap, r2: Long)

  /** The first conjunct of shape `gapx² + gapy² <= r2` (either
    * comparison orientation), both gaps crossing the join. */
  private def findRadius(cs: Seq[Expression], left: LogicalPlan,
                         right: LogicalPlan): Option[RadiusCond] = {
    def fromSum(sum: Expression, lim: Expression): Option[RadiusCond] =
      (sum, lim) match {
        case (Add(m1, m2, _), l: Literal) =>
          for {
            r2 <- asLong(l) if r2 >= 0
            gx <- axisOf(m1, left, right)
            gy <- axisOf(m2, left, right)
          } yield RadiusCond(gx, gy, r2)
        case _ => None
      }
    cs.iterator.flatMap {
      case LessThanOrEqual(a, b)    => fromSum(a, b)
      case GreaterThanOrEqual(a, b) => fromSum(b, a)
      case _                        => None
    }.nextOption()
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(Flag, "false") != "true") return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if radiusFindable(j) =>
        val cs = CosineLshRewrite.conjuncts(cond)
        val RadiusCond(gx, gy, r2) = findRadius(cs, left, right).get
        // smallest W with W² >= R² — then |gap| <= R <= W per axis
        val w = {
          var c = math.max(1L, math.sqrt(r2.toDouble).toLong)
          while (c * c < r2) c += 1
          c
        }
        // FLOOR division, exact for negatives: (c − pmod(c, W)) div W
        def fdiv(e: Expression): Expression = {
          val c = Cast(e, LongType)
          IntegralDivide(Subtract(c, Pmod(c, Literal(w))), Literal(w))
        }
        def neighborhood(center: Expression): Expression =
          new Sequence(Subtract(fdiv(center), Literal(1L)),
            Add(fdiv(center), Literal(1L)), Some(Literal(1L)))
            .withTimeZone(conf.sessionLocalTimeZone)
        val cellX = AttributeReference("__cell_x", LongType,
          nullable = false)()
        val cellY = AttributeReference("__cell_y", LongType,
          nullable = false)()
        val genX = Generate(Explode(neighborhood(gx.l)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(cellX), child = left)
        val genY = Generate(Explode(neighborhood(gy.l)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(cellY), child = genX)
        val eq = And(EqualTo(cellX, fdiv(gx.r)), EqualTo(cellY, fdiv(gy.r)))
        Project(j.output, Join(genY, right, Inner, Some(And(eq, cond)), hint))
    }
  }

  private def radiusFindable(j: Join): Boolean = j match {
    case Join(left, right, Inner, Some(cond), _) =>
      val cs = CosineLshRewrite.conjuncts(cond)
      !CosineLshRewrite.hasEquiKey(cs, left, right) &&
        findRadius(cs, left, right).isDefined
    case _ => false
  }
}
