package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DecimalType

/** EAGER AGGREGATION (partial-aggregate pushdown below a join) — the
  * classic warehouse rewrite (Yan & Larson, VLDB '95; "group-by
  * pushdown" in Oracle/SQL Server/BigQuery) that Spark's optimizer does
  * not perform: in
  *
  *   SELECT d.g, sum(f.x) FROM fact f JOIN dim d ON f.fk = d.pk GROUP BY d.g
  *
  * the join shuffles (or broadcast-probes) EVERY fact row only for the
  * aggregate to collapse them immediately after. Pre-aggregating the
  * fact side by the join key first —
  *
  *   Aggregate(G, sum(ps))( Join( Aggregate(fk, sum(x) AS ps)(fact), dim ) )
  *
  * — shrinks the join's probe side from |fact| rows to |distinct fk|
  * (orders → customers is ~10×; clickstream → user is often 1000×),
  * which at 100 TB is the difference between shuffling the corpus and
  * shuffling its key space. The identity is UNCONDITIONALLY exact for
  * the decomposable aggregates — each partial row joins with exactly
  * the multiplicity its fact rows would have (the inner join multiplies
  * whole fk-groups at a time):
  *
  *   sum(x)   = sum(partial_sum)   (Σ x·m  = Σ ps·m per dim match count m)
  *   count(*) = sum(partial_count)
  *   min/max  = min/max of partials (multiplicities don't move extrema;
  *              zero-match groups vanish on both sides)
  *
  * No uniqueness or referential declaration is needed — unlike
  * [[JoinEliminationRewrite]], this rewrite is sound on any inner
  * equi-join. avg / DISTINCT / FILTER-clause aggregates are not
  * decomposable this way and bail; DECIMAL sums bail (the partial
  * re-sum widens precision differently from the single-level sum).
  *
  * Fire conditions (all checked structurally):
  *  - `spark.graft.aggpush.enabled` = true (session opt-in, inert
  *    otherwise — the rescue-family convention);
  *  - Aggregate over an INNER single-equi-condition join;
  *  - every grouping expression is a plain attribute of the dim side or
  *    the fact join key itself;
  *  - every aggregate is Sum/Min/Max over a fact-side attribute or
  *    Count(literal), with no distinct/filter;
  *  - the fact side is not already this rule's partial shape
  *    (idempotence — re-application would nest partials forever).
  */
object AggPushdownRewrite extends Rule[LogicalPlan] {

  val Flag = "spark.graft.aggpush.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(Flag, "false") != "true") return plan
    plan.transform {
      case agg @ Aggregate(_, _, j: Join, _) =>
        rewrite(agg, j).getOrElse(agg)
      // ColumnPruning leaves an attribute-only Project over the join;
      // it is transparent here — the rebuilt aggregate references only
      // partial + dim attributes, all in the new join's output (a later
      // pruning pass re-narrows the dim side)
      case agg @ Aggregate(_, _, Project(pl, j: Join), _)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        rewrite(agg, j).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, j: Join): Option[LogicalPlan] =
    j match {
      case Join(left, right, Inner,
          Some(EqualTo(a: AttributeReference, b: AttributeReference)), hint) =>
        // orient: the fact side is the one every aggregate input lives on
        val aggInputs = AttributeSet(agg.aggregateExpressions.flatMap {
          case Alias(c, _) => c.collect {
            case ae: AggregateExpression => ae
          }.flatMap(_.references)
          case _ => Nil
        })
        Seq((left, right, a, b), (right, left, b, a)).collectFirst {
          case (fact, dim, fk, _)
              if fact.outputSet.contains(fk) &&
                aggInputs.subsetOf(fact.outputSet) &&
                agg.groupingExpressions.forall {
                  case g: AttributeReference =>
                    dim.outputSet.contains(g) || g.exprId == fk.exprId
                  case _ => false
                } &&
                !alreadyPartial(fact, fk) =>
            (fact, dim, fk)
        }.flatMap { case (fact, dim, fk) =>
          build(agg, j, fact, dim, fk, hint)
        }
      case _ => None
    }

  /** Idempotence guard: the fact side already is this rule's
    * fk-keyed partial aggregate. */
  private def alreadyPartial(fact: LogicalPlan, fk: Attribute): Boolean =
    fact match {
      case Aggregate(Seq(g: AttributeReference), _, _, _) =>
        g.exprId == fk.exprId
      case _ => false
    }

  private def build(agg: Aggregate, j: Join, fact: LogicalPlan,
                    dim: LogicalPlan, fk: AttributeReference,
                    hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint)
      : Option[LogicalPlan] = {
    // collect the distinct decomposable aggregate functions; one partial
    // column per (kind, input) pair, shared by repeated uses
    var ok = true
    val partials = scala.collection.mutable.LinkedHashMap
      .empty[(String, Option[ExprId]), (NamedExpression, Attribute)]
    def partialFor(kind: String, input: Option[AttributeReference],
                   mk: => AggregateFunction): Attribute = {
      val key = (kind, input.map(_.exprId))
      partials.getOrElseUpdate(key, {
        val al = Alias(mk.toAggregateExpression(),
          s"gp_${kind}_${input.map(_.name).getOrElse("star")}")()
        (al, al.toAttribute)
      })._2
    }
    def rwAgg(ae: AggregateExpression): Expression = {
      if (ae.isDistinct || ae.filter.nonEmpty) return { ok = false; ae }
      ae.aggregateFunction match {
        case s @ Sum(x: AttributeReference, _)
            if !s.dataType.isInstanceOf[DecimalType] =>
          val p = partialFor("sum", Some(x), Sum(x))
          ae.copy(aggregateFunction = Sum(p))
        case Min(x: AttributeReference) =>
          val p = partialFor("min", Some(x), Min(x))
          ae.copy(aggregateFunction = Min(p))
        case Max(x: AttributeReference) =>
          val p = partialFor("max", Some(x), Max(x))
          ae.copy(aggregateFunction = Max(p))
        case c: Count if c.children.forall(_.foldable) =>
          val p = partialFor("cnt", None, Count(Literal(1)))
          // count is non-nullable; the re-sum is not — but a group only
          // exists where partial rows exist, so 0 never surfaces
          Coalesce(Seq(ae.copy(aggregateFunction = Sum(p)), Literal(0L)))
        case _ => ok = false; ae
      }
    }
    def rw(e: Expression): Expression = e match {
      case ae: AggregateExpression => rwAgg(ae)
      case other => other.mapChildren(rw)
    }
    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference => a // a grouping key, unchanged
      case al @ Alias(c, n) => Alias(rw(c), n)(exprId = al.exprId)
      case other => { ok = false; other }
    }
    if (!ok || partials.isEmpty) return None
    val partialAgg = Aggregate(Seq(fk),
      fk +: partials.values.map(_._1).toSeq, fact)
    val newJoin = j match {
      case jn: Join => jn.copy(
        left = if (jn.left eq fact) partialAgg else jn.left,
        right = if (jn.right eq fact) partialAgg else jn.right)
    }
    Some(agg.copy(aggregateExpressions = newAggExprs, child = newJoin))
  }
}
