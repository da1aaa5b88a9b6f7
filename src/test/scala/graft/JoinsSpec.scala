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

  test("outer joins preserve unmatched sides") {
    val left = graft.operators.Joins.joinLeft(spark, sf)
    // every customer appears at least once
    assert(left.select("c_custkey").distinct().count() == 150)
    val semi = graft.operators.Joins.joinLeftSemi(spark, sf).count()
    val anti = graft.operators.Joins.joinLeftAnti(spark, sf).count()
    assert(semi + anti == 150) // semi ⊎ anti partitions customers
  }
}
