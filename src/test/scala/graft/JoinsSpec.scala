package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

class JoinsSpec extends SparkSpec {

  /** AQE wraps the plan; execute first, then collect across the final plan
    * including inside materialized query stages (stages are leaf nodes, so
    * a plain collect stops at their boundary). */
  private def collectFinal[T](df: DataFrame)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    df.collect()
    def walk(p: SparkPlan): Seq[T] = {
      val here = if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      here ++ kids.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("join_broadcast plans both dims as BroadcastHashJoin") {
    val bhj = collectFinal(graft.operators.Joins.joinBroadcast(spark, sf)) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.size == 2, s"expected 2 broadcast joins, got ${bhj.size}")
  }

  test("join_sort_merge honours the merge hint") {
    val smj = collectFinal(graft.operators.Joins.joinSortMerge(spark, sf)) {
      case s: SortMergeJoinExec => s
    }
    assert(smj.nonEmpty, "merge hint must yield SortMergeJoin")
  }

  test("outer joins preserve unmatched sides") {
    val left = graft.operators.Joins.joinLeft(spark, sf)
    // every customer appears at least once
    assert(left.select("c_custkey").distinct().count() == 150)
    val semi = graft.operators.Joins.joinLeftSemi(spark, sf).count()
    val anti = graft.operators.Joins.joinLeftAnti(spark, sf).count()
    assert(semi + anti == 150) // semi ⊎ anti partitions customers
  }
}
