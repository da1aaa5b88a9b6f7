package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension surface (SURVEY.md §4.3 tier (c)): a custom
  * logical node + planner strategy + physical operator for top-k-per-group
  * with PARTIAL pushdown.
  *
  * The window formulation (win_topk_pergroup) shuffles EVERY row to its
  * group's partition, sorts, ranks, and discards all but k. This operator
  * plans two physical stages, mirroring partial/final hash aggregation:
  *
  *   TopKPerGroupExec(final,  k)   — requires ClusteredDistribution(group)
  *   +- TopKPerGroupExec(partial, k) — runs on the map side, any layout
  *      +- child
  *
  * The partial stage keeps at most k rows per (group, input-partition) in
  * bounded insertion-sorted buffers, so the exchange moves at most
  * k·partitions rows per group instead of the full table — at 100 TB with
  * k=3 that is the difference between shuffling 100 TB and shuffling a few
  * megabytes per group. EnsureRequirements inserts the hash exchange from
  * the declared distribution, so AQE still plans/coalesces it normally.
  * The final stage re-runs the same bounded merge on the clustered rows
  * and emits a 1-based rank column.
  *
  * Buffers never exceed k rows per group; comparator and key projection
  * are generated per partition (codegen'd ordering via RowOrdering.create).
  */
case class TopKPerGroupPlan(
    grouping: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKPerGroupPlan {
  def apply(grouping: Seq[Expression], ordering: Seq[SortOrder], k: Int,
      child: LogicalPlan): TopKPerGroupPlan =
    TopKPerGroupPlan(grouping, ordering, k,
      AttributeReference("rn", IntegerType, nullable = false)(), child)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: TopKPerGroupPlan =>
      val partial = TopKPerGroupExec(p.grouping, p.ordering, p.k,
        rankAttr = None, isFinal = false, planLater(p.child))
      TopKPerGroupExec(p.grouping, p.ordering, p.k,
        rankAttr = Some(p.rankAttr), isFinal = true, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    grouping: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    isFinal: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    rankAttr.fold(child.output)(child.output :+ _)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) ClusteredDistribution(grouping) :: Nil
    else UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupingExprs = grouping
    val orderingExprs = ordering
    val kk = k
    val childOutput = child.output
    val emitRank = isFinal
    val outputAttrs = output
    val fn = (iter: Iterator[InternalRow]) => {
      val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
      val cmp = RowOrdering.create(orderingExprs, childOutput)
      val buffers =
        mutable.LinkedHashMap.empty[InternalRow, mutable.ArrayBuffer[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        val buf = buffers.getOrElse(key, null) match {
          case null =>
            val b = mutable.ArrayBuffer.empty[InternalRow]
            buffers.put(key.copy(), b)
            b
          case b => b
        }
        if (buf.length < kk || cmp.compare(row, buf(buf.length - 1)) < 0) {
          val r = row.copy()
          var i = buf.length
          buf.append(r)
          while (i > 0 && cmp.compare(r, buf(i - 1)) < 0) {
            buf(i) = buf(i - 1)
            i -= 1
          }
          buf(i) = r
          if (buf.length > kk) buf.remove(buf.length - 1)
        }
      }
      if (!emitRank) {
        buffers.valuesIterator.flatMap(_.iterator)
      } else {
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
        buffers.valuesIterator.flatMap { buf =>
          buf.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.setInt(0, i + 1)
            outProj(joined(r, rankRow))
          }
        }
      }
    }: Iterator[InternalRow]
    child.execute().mapPartitions(fn, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** DataFrame-level constructor + session wiring for the custom operator. */
object TopKPerGroup {

  /** Install the planner strategy on a live session (idempotent) — the
    * runtime twin of `injectPlannerStrategy`. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies = cur :+ TopKPerGroupStrategy
  }

  /** Top-k rows per group by `orderBy` (with explicit tie-break), with a
    * 1-based `rn` rank column appended. Column names resolve against the
    * analyzed child plan. */
  def topK(df: DataFrame, groupCols: Seq[String], orderDesc: String,
      tieAsc: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val ordering = Seq(
      SortOrder(attr(orderDesc), org.apache.spark.sql.catalyst.expressions.Descending),
      SortOrder(attr(tieAsc), org.apache.spark.sql.catalyst.expressions.Ascending))
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(attr), ordering, k, analyzed))
  }
}
