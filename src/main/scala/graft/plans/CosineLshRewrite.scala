package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, Generate, Join, LogicalPlan, Project, Window, WindowGroupLimit}
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

  /** Top-level conjuncts of a condition (shared with JaccardLshRewrite). */
  private[plans] def conjuncts(e: Expression): Seq[Expression] = e match {
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
    * will plan a hash/sort-merge join; nothing to rescue. (Shared with
    * JaccardLshRewrite.) */
  private[plans] def hasEquiKey(cs: Seq[Expression], left: LogicalPlan,
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
    val thresholdRescued = plan.transform {
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
    // second shape (SURVEY §4.3's "brute-force cosine TOP-K", VERDICT
    // r11 task 2): Filter(rank ≤ k) over a per-query row_number window
    // ordered by cosine DESC whose input is a keyless cross/inner join —
    // the rank-per-query spelling of ANN. Rescued into the IVF probe
    // form llm_ann_ivf hand-writes: the join gains the probe=cell equi
    // key, everything above (window, rank filter) is untouched, so the
    // window ranks only same-probe candidates instead of the corpus².
    thresholdRescued.transform {
      case f: Filter => topkRewrite(f).getOrElse(f)
    }
  }

  /** Descend from a Window's child to the underlying Join, collecting
    * the intermediate Projects (alias maps for attribute resolution).
    * WindowGroupLimit (inserted by InferWindowGroupLimit before this
    * rule runs) is transparent. Any other node kills the match — a
    * fan-out/agg between window and join would change the semantics
    * the rescue argument relies on. */
  private def pathToJoin(p: LogicalPlan, acc: List[Project])
      : Option[(List[Project], Join)] = p match {
    case j: Join => Some((acc, j))
    case pr: Project => pathToJoin(pr.child, acc :+ pr)
    case wg: WindowGroupLimit => pathToJoin(wg.child, acc)
    case _ => None
  }

  /** Substitute project aliases top-down so `e` (written against the
    * top project's output) re-expresses over the Join's output. */
  private def resolveThrough(e: Expression, projs: List[Project]): Expression =
    projs.foldLeft(e) { (expr, pr) =>
      val aliasMap = pr.projectList.collect {
        case a: Alias => a.toAttribute.exprId -> a.child
      }.toMap
      expr.transformUp {
        case ar: AttributeReference => aliasMap.getOrElse(ar.exprId, ar)
      }
    }

  /** Rank-bounding conjunct: rank ≤ k / rank < k / k ≥ rank / rank = 1
    * over one of the window's rank-like output attributes. */
  private def boundsRank(cond: Expression, rankAttrs: Seq[Attribute]): Boolean = {
    def isRank(e: Expression) = e match {
      case a: Attribute => rankAttrs.exists(_.semanticEquals(a))
      case _ => false
    }
    conjuncts(cond).exists {
      case LessThanOrEqual(a, Literal(_, _)) => isRank(a)
      case LessThan(a, Literal(_, _)) => isRank(a)
      case GreaterThanOrEqual(Literal(_, _), a) => isRank(a)
      case GreaterThan(Literal(_, _), a) => isRank(a)
      case EqualTo(a, Literal(_, _)) => isRank(a)
      case _ => false
    }
  }

  private def topkRewrite(f: Filter): Option[LogicalPlan] = {
    // Filter(rank ≤ k) directly over the Window (projects in between
    // would carry the rank attr — accept those too)
    def findWindow(p: LogicalPlan): Option[Window] = p match {
      case w: Window => Some(w)
      case pr: Project => findWindow(pr.child)
      case _ => None
    }
    val w = findWindow(f.child).getOrElse(return None)
    val rankAttrs = w.windowExpressions.collect {
      case a @ Alias(WindowExpression(_: RowNumber | _: Rank | _: DenseRank,
        _), _) => a.toAttribute
    }
    if (rankAttrs.isEmpty || !boundsRank(f.condition, rankAttrs)) return None
    // the window must rank per query (nonempty partition) by cosine DESC
    if (w.partitionSpec.isEmpty || w.orderSpec.isEmpty) return None
    val SortOrder(ordE, direction, _, _) = w.orderSpec.head
    if (direction != Descending) return None
    val (projs, j) = pathToJoin(w.child, Nil).getOrElse(return None)
    val Join(left, right, jt, cond, hint) = j
    if (jt != Inner && jt != Cross) return None
    if (cond.exists(c => hasEquiKey(conjuncts(c), left, right))) return None
    // ordering key contains a cross-side cosine once re-expressed over
    // the join output
    val ordResolved = resolveThrough(ordE, projs)
    val cos = ordResolved.collectFirst { case cs: CosineSimilarity => cs }
      .getOrElse(return None)
    val (lv, rv) = {
      val a = cos.left; val b = cos.right
      if (a.references.nonEmpty && b.references.nonEmpty &&
          a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) (a, b)
      else if (b.references.nonEmpty && a.references.nonEmpty &&
               b.references.subsetOf(left.outputSet) &&
               a.references.subsetOf(right.outputSet)) (b, a)
      else return None
    }
    // the probe side is the QUERY side — the one the window partitions
    // by (each query's candidate set is its 9 probed cells)
    val partRefs = AttributeSet(
      w.partitionSpec.map(resolveThrough(_, projs)).flatMap(_.references))
    if (partRefs.isEmpty) return None
    val qIsLeft =
      if (partRefs.subsetOf(left.outputSet)) true
      else if (partRefs.subsetOf(right.outputSet)) false
      else return None
    val (qPlan, qVec, cPlan, cVec) =
      if (qIsLeft) (left, lv, right, rv) else (right, rv, left, lv)
    val explode = Explode(probes(signCell(qVec)))
    val probeAttr = AttributeReference("__lsh_probe", IntegerType,
      nullable = false)()
    val gen = Generate(explode, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(probeAttr), child = qPlan)
    val cellAlias = Alias(signCell(cVec), "__lsh_cell")()
    val proj = Project(cPlan.output :+ cellAlias, cPlan)
    val eq = EqualTo(probeAttr, cellAlias.toAttribute)
    val newCond = cond.map(And(eq, _)).getOrElse(eq)
    val (nl, nr) = if (qIsLeft) (gen, proj) else (proj, gen)
    val replacement = Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
    Some(f.transformUp { case jj: Join if jj eq j => replacement })
  }

  private def cosineFindable(j: Join): Boolean = j match {
    case Join(left, right, Inner, Some(cond), _) =>
      val cs = conjuncts(cond)
      !hasEquiKey(cs, left, right) &&
        cs.exists(cosineSides(_, left, right).isDefined)
    case _ => false
  }
}
