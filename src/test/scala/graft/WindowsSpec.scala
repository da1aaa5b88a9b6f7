package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.window.WindowExec

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("win_rank numbering on a literal group") {
    val dir = "/tmp/graft-test-win"
    Seq(
      (1L, "n1", 1, 100.0, "SEG"),
      (2L, "n2", 1, 100.0, "SEG"),
      (3L, "n3", 1, 50.0, "SEG"),
      (4L, "n4", 1, 10.0, "OTHER")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = graft.operators.Windows.winRank(spark, dir)
      .orderBy($"c_mktsegment", $"rn")
      .select($"c_custkey", $"rn", $"rnk", $"drnk").collect()
    assert(got.toSeq == Seq(
      Row(4L, 1, 1, 1),            // OTHER
      Row(1L, 1, 1, 1),            // SEG: 100.0, key 1 wins tie
      Row(2L, 2, 1, 1),            // SEG: tied balance → same rank
      Row(3L, 3, 3, 2)))           // SEG: rank skips, dense_rank doesn't
  }

  test("win_topk_pergroup returns at most 3 rows per customer") {
    val df = graft.operators.Windows.winTopkPerGroup(spark, sf)
    val over = df.groupBy("o_custkey").count().where($"count" > 3).count()
    assert(over == 0)
    assert(df.where($"rn" > 3).count() == 0)
  }

  test("window ops plan exactly one WindowExec (single shuffle+sort)") {
    val df = graft.operators.Windows.winFrameRows(spark, sf)
    val n = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }.size
    assert(n == 1)
  }

  test("win_frame_range 7d trailing sum is monotone within a burst") {
    // every row's n_7d >= 1 and sum includes its own value
    val df = graft.operators.Windows.winFrameRange(spark, sf)
    assert(df.where($"n_7d" < 1).count() == 0)
  }
}
