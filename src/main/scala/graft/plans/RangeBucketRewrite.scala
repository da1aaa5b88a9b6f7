package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer extension (the temporal/numeric sibling of
  * [[CosineLshRewrite]] / [[JaccardLshRewrite]]): rewrites a
  * BRUTE-FORCE point-in-interval join — a join whose only cross-side
  * predicates are `x >= lo AND x <= hi` (a BETWEEN; no equi key, so
  * Spark can only plan a CartesianProduct or
  * BroadcastNestedLoopJoin — the O(points·intervals) shape that melts
  * when neither side broadcasts) — into the bucketed equi-join
  * join_range / join_interval_overlap hand-write:
  *
  *  - the interval side explodes into its covered bucket ids,
  *    `sequence(lo div W, hi div W)` (a Filter(lo <= hi) guards the
  *    sequence against inverted intervals, which match nothing anyway);
  *  - the point side contributes `x div W` as a join-key expression;
  *  - the join becomes an EQUI-JOIN on the bucket with the original
  *    range predicate kept as the residual filter;
  *  - a final Project restores the original output.
  *
  * Both sides then shuffle ONCE on the bucket key and only same-bucket
  * pairs materialize. Unlike the LSH rescues this rewrite is EXACT —
  * truncating division by a positive W is monotone nondecreasing, so
  * x ∈ [lo, hi] implies x div W ∈ [lo div W, hi div W]: every
  * qualifying pair meets in exactly the bucket containing x (each
  * interval emits each bucket once — no dedup step), and the residual
  * predicate discards same-bucket near-misses. The trade is tuning,
  * not correctness: each interval carries (hi−lo)/W + 1 copies, so W
  * (`spark.graft.range.rewrite.bucket`, default 1024) should sit near
  * the median interval width — W too small explodes the interval side,
  * W too large degrades toward one giant bucket. Because the rewrite
  * reshapes cost rather than semantics it could default on, but it
  * ships opt-in (`spark.graft.range.rewrite.enabled=true`) like its
  * siblings: a plan-class change a user should see themselves flip.
  *
  * Idempotent: the rewritten join HAS a cross-side equality conjunct
  * (x div W = bucket), which the shared equi-key guard treats as an
  * existing join key. Integral key types only — float buckets would
  * need epsilon care the numeric families don't.
  */
object RangeBucketRewrite extends Rule[LogicalPlan] {

  val Flag = "spark.graft.range.rewrite.enabled"
  val WidthConf = "spark.graft.range.rewrite.bucket"

  private case class RangeCond(x: Expression, lo: Expression, hi: Expression)

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The (x, lo, hi) of a two-conjunct band, oriented so x references
    * only one side and BOTH bounds only the other; None otherwise.
    * Every inequality conjunct yields two readings (a >= b is both
    * "x=a bounded below by b" and "x=b bounded above by a"); the
    * pairing over a shared x resolves the ambiguity. */
  private def findRange(cs: Seq[Expression], left: LogicalPlan,
                        right: LogicalPlan): Option[RangeCond] = {
    val lowers = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression)]
    val uppers = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression)]
    cs.foreach {
      case GreaterThanOrEqual(a, b) => lowers += ((a, b)); uppers += ((b, a))
      case GreaterThan(a, b)        => lowers += ((a, b)); uppers += ((b, a))
      case LessThanOrEqual(a, b)    => lowers += ((b, a)); uppers += ((a, b))
      case LessThan(a, b)           => lowers += ((b, a)); uppers += ((a, b))
      case _                        =>
    }
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    (for {
      (x, lo)  <- lowers.iterator
      (x2, hi) <- uppers.iterator
      if x.semanticEquals(x2)
      if isIntegral(x) && isIntegral(lo) && isIntegral(hi)
      px <- sideOf(x); pl <- sideOf(lo); ph <- sideOf(hi)
      if pl == ph && px != pl
    } yield RangeCond(x, lo, hi)).nextOption()
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(Flag, "false") != "true") return plan
    val width = conf.getConfString(WidthConf, "1024").toLong
    require(width > 0, s"$WidthConf must be positive")
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if rangeFindable(j) =>
        val cs = CosineLshRewrite.conjuncts(cond)
        val RangeCond(x, lo, hi) = findRange(cs, left, right).get
        val pointIsLeft = x.references.subsetOf(left.outputSet)
        val (pSide, iSide) = if (pointIsLeft) (left, right) else (right, left)
        def bucketOf(e: Expression): Expression =
          IntegralDivide(Cast(e, LongType), Literal(width))
        val bucketAttr = AttributeReference("__range_bucket", LongType,
          nullable = false)()
        // inverted intervals (lo > hi) match nothing in the original
        // query; the filter keeps them out of sequence()'s domain
        // Sequence is TimeZoneAware: without an explicit zone it stays
        // unresolved and the optimizer's plan-integrity check rejects
        // the rewrite (numeric sequences never use it, but resolution
        // demands it)
        val gen = Generate(
          Explode(new Sequence(bucketOf(lo), bucketOf(hi),
            Some(Literal(1L))).withTimeZone(conf.sessionLocalTimeZone)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(bucketAttr),
          child = Filter(LessThanOrEqual(Cast(lo, LongType),
            Cast(hi, LongType)), iSide))
        val eq = EqualTo(bucketOf(x), bucketAttr)
        val (nl, nr) = if (pointIsLeft) (pSide, gen) else (gen, pSide)
        Project(j.output, Join(nl, nr, Inner, Some(And(eq, cond)), hint))
    }
  }

  private def rangeFindable(j: Join): Boolean = j match {
    case Join(left, right, Inner, Some(cond), _) =>
      val cs = CosineLshRewrite.conjuncts(cond)
      !CosineLshRewrite.hasEquiKey(cs, left, right) &&
        findRange(cs, left, right).isDefined
    case _ => false
  }
}
