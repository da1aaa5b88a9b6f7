package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** PK-FK JOIN ELIMINATION — the constraint-driven rewrite every
  * warehouse optimizer ships (Oracle, Snowflake, BigQuery `RELY`
  * constraints) and Spark cannot do because it has no constraint
  * catalog: an inner equi-join to a dimension whose columns nothing
  * above the join reads is a no-op — PROVIDED the dimension's join key
  * is UNIQUE (no row multiplication) and the fact's foreign key is
  * REFERENTIAL (no row loss). Generated SQL (BI tools, semantic
  * layers, view stacks) emits these joins constantly; at 100 TB each
  * one is a corpus-sized shuffle or broadcast probe bought for nothing.
  *
  * The rewrite:
  *
  *   Project(factCols, Join_inner(fact, dim, fk = pk))
  *     →  Project(factCols, Filter(IsNotNull(fk), fact))
  *
  * The injected IsNotNull preserves the inner join's one observable
  * effect on the fact side (null FKs never match) whether or not the
  * column is declared non-null — so the ONLY trusted declarations are
  * uniqueness + referential integrity, exactly the pair real engines
  * accept as `RELY` from the ETL contract. A dimension key that is
  * secretly non-unique or non-covering breaks those engines the same
  * way; the declaration is the user's responsibility, the spec pins
  * the data here satisfies it, and the demonstrator's oracle REPLAYS
  * THE JOIN — the gate proves the elimination is invisible.
  *
  * Conf surface (session-scoped, inert unless enabled):
  *  - `spark.graft.joinelim.enabled` — opt-in flag;
  *  - `spark.graft.joinelim.dim` — path marker identifying the
  *    dimension relation (file-source root must contain it);
  *  - `spark.graft.joinelim.pk` — the declared-unique join key column;
  *  - `spark.graft.joinelim.fk` — the fact column referential
  *    integrity is declared FOR (a join on any other fact column is a
  *    genuine filter and must keep its join);
  *  - `spark.graft.joinelim.fact` — optional path marker for the FACT
  *    relation: when set, the fk attribute must trace by exprId to a
  *    file-source scan of that relation through RI-preserving nodes
  *    (see riLineage) — the declaration names a (table, column) pair,
  *    not a column name.
  *
  * Bail conditions (each keeps the original plan): non-inner joins
  * (outer/semi carry different semantics — semi is already cheap),
  * compound or non-equi conditions, a dimension subtree that is not a
  * pure column-pruning path to the declared relation (a Filter on the
  * dim side makes the join selective — eliminating it would resurrect
  * filtered-out fact rows), and any projection referencing a dimension
  * attribute (the match is on the Project-over-Join pair, so "nothing
  * above reads dim columns" is checked structurally, not assumed).
  */
object JoinEliminationRewrite extends Rule[LogicalPlan] {

  val Flag = "spark.graft.joinelim.enabled"
  val DimConf = "spark.graft.joinelim.dim"
  val PkConf = "spark.graft.joinelim.pk"
  val FkConf = "spark.graft.joinelim.fk"
  val FactConf = "spark.graft.joinelim.fact"

  /** RI-preserving lineage (ADVICE r13): the fk ATTRIBUTE — by exprId,
    * never name alone — must originate from a file-source scan of the
    * declared fact relation, reached only through nodes that can drop,
    * duplicate, or NULL rows (project/filter/join) but never mint fk
    * VALUES outside the scanned column's domain. A withColumn-derived
    * column has a fresh Alias exprId (no scan carries it → bail); a
    * Union reuses its first child's exprIds but can inject foreign
    * values through the other children (the default case bails on any
    * non-listed node, Union included). Outer joins may NULL the fk on
    * the way up — exactly what the injected IsNotNull guard absorbs. */
  private def riLineage(p: LogicalPlan, fk: ExprId,
                        factMark: String): Boolean =
    p match {
      case lr: LogicalRelation =>
        lr.output.exists(_.exprId == fk) && (lr.relation match {
          case fs: HadoopFsRelation =>
            factMark.isEmpty ||
              fs.location.rootPaths.exists(_.toString.contains(factMark))
          case _ => false
        })
      case Project(_, c) => riLineage(c, fk, factMark)
      case Filter(_, c) => riLineage(c, fk, factMark)
      case j: Join => j.children.exists(riLineage(_, fk, factMark))
      case _ => false
    }

  /** Pure column-pruning path down to a file-source scan of the
    * declared dimension (the MvRollupRewrite.baseScan discipline). One
    * filter shape is admitted: `IsNotNull(pk)` conjunctions — the
    * optimizer's own InferFiltersFromConstraints plants one under
    * every inner join, and it is provably transparent to elimination
    * (a null pk could never match; referential integrity covers every
    * non-null fk). Any OTHER dim-side predicate is selective — it
    * could drop matching dim rows and with them fact rows — and bails. */
  private def dimScan(p: LogicalPlan, mark: String, pk: String): Boolean =
    p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        dimScan(c, mark, pk)
      case Filter(cond, c) =>
        splitConjuncts(cond).forall {
          case IsNotNull(a: AttributeReference) => a.name == pk
          case _ => false
        } && dimScan(c, mark, pk)
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toString.contains(mark))
        case _ => false
      }
      case _ => false
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** If the join qualifies and `used` touches no dimension attribute,
    * the replacement fact-side child (with the null guard injected).
    * The fact column must be the DECLARED foreign key: referential
    * integrity was promised for that column alone — any other fact
    * column equi-joined to the pk (orders.o_orderkey = c_custkey, say)
    * is a genuine filter whose elimination would resurrect unmatched
    * rows. */
  private def eliminate(j: Join, used: AttributeSet, mark: String,
                        pk: String, fkName: String,
                        factMark: String): Option[LogicalPlan] =
    j match {
      case Join(left, right, Inner,
          Some(EqualTo(a: AttributeReference, b: AttributeReference)), _) =>
        // orient: which side is the declared dimension joined on its pk?
        Seq((left, right, a, b), (right, left, b, a)).collectFirst {
          case (fact, dim, fk, dpk)
              if dimScan(dim, mark, pk) && dpk.name == pk &&
                fk.name == fkName &&
                dim.outputSet.contains(dpk) &&
                fact.outputSet.contains(fk) &&
                riLineage(fact, fk.exprId, factMark) &&
                used.subsetOf(fact.outputSet) =>
            Filter(IsNotNull(fk), fact)
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(Flag, "false") != "true") return plan
    val mark = conf.getConfString(DimConf, "")
    val pk = conf.getConfString(PkConf, "")
    val fkName = conf.getConfString(FkConf, "")
    val factMark = conf.getConfString(FactConf, "")
    if (mark.isEmpty || pk.isEmpty || fkName.isEmpty) return plan
    // the consumer whose expressions prove "nothing reads dim columns"
    // is the node DIRECTLY above the join — the two shapes generated
    // SQL leaves after column pruning are Project-over-Join and
    // Aggregate-over-Join
    plan.transform {
      case p @ Project(pl, j: Join) =>
        eliminate(j, AttributeSet(pl.flatMap(_.references)), mark, pk,
          fkName, factMark)
          .map(f => Project(pl, f)).getOrElse(p)
      case agg @ Aggregate(gs, aggs, j: Join, _) =>
        eliminate(j, AttributeSet((gs ++ aggs).flatMap(_.references)),
          mark, pk, fkName, factMark)
          .map(f => agg.copy(child = f)).getOrElse(agg)
      // DISTINCT ELIMINATION — the same declaration's other classic
      // payoff: `SELECT DISTINCT cols FROM dim` where cols INCLUDE the
      // declared-unique key is already duplicate-free, and the
      // de-duplicating Aggregate (what the optimizer rewrites Distinct
      // into: grouping == output, all plain attributes) is a full
      // shuffle bought for nothing. Requires the child to be the pure
      // pruning path to the declared relation — any Filter/Join below
      // could not create duplicates either, but stays out of scope to
      // keep the proof obligation exactly "the scan's rows are unique
      // on pk".
      case agg @ Aggregate(gs, aggs, child, _)
          if gs.nonEmpty && gs.length == aggs.length &&
            gs.forall(_.isInstanceOf[AttributeReference]) &&
            aggs.forall(_.isInstanceOf[AttributeReference]) &&
            gs.map(_.asInstanceOf[AttributeReference].exprId).toSet ==
              aggs.map(_.asInstanceOf[AttributeReference].exprId).toSet &&
            gs.exists(_.asInstanceOf[AttributeReference].name == pk) &&
            dimScan(child, mark, pk) =>
        Project(aggs.map(_.asInstanceOf[AttributeReference]), child)
    }
  }
}
