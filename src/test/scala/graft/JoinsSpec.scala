package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

class JoinsSpec extends SparkSpec {

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

  test("join_bucketed: the bucketed join itself has no shuffle exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val df = graft.operators.Joins.joinBucketed(spark, sf)
    // exchanges above the join (for the groupBy/orderBy) are expected;
    // the join inputs themselves must be exchange-free bucket scans
    val smj = collectFinal(df) { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "bucketed equi join should be a merge join")
    val shufflesUnderJoin = smj.head.collect { case e: ShuffleExchangeExec => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must not shuffle its inputs:\n${smj.head}")
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
