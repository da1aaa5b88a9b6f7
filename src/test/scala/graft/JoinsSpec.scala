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

  test("join_dpp injects a dynamic partition pruning filter into the fact scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = graft.operators.Joins.joinDpp(spark, sf)
    val scans = collectFinal(df) { case s: FileSourceScanExec => s }
    val dynamic = scans.exists(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")))
    assert(dynamic,
      s"fact scan must carry a dynamicpruning partition filter:\n" +
        scans.map(_.partitionFilters).mkString("\n"))
  }

  test("join_salted equals the unsalted join") {
    import org.apache.spark.sql.functions._
    val salted = graft.operators.Joins.joinSalted(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, _)) => assert(n == plain(k)) }
  }

  test("runtime bloom filter is injected on the fact side") {
    val df = graft.operators.Joins.joinRuntimeFilter(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "InjectRuntimeFilter must add a bloom probe to the fact scan side")
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
