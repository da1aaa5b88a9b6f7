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

  test("win_ignore_nulls: forward-fill and prev-observation replay locally") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Windows.winIgnoreNulls(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    val events = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts").cast("long"),
        col("event_type"), round(col("value"), 4))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    events.groupBy(_._2).foreach { case (_, evs) =>
      var lastObs: Option[Double] = None
      val firstObs = evs.sortBy(e => (e._3, e._1))
        .find(_._4 != "view").map(_._5)
      evs.sortBy(e => (e._3, e._1)).foreach { e =>
        val r = rows(e._1)
        val obs = if (e._4 != "view") Some(e._5) else None
        assert(Option(r.getAs[java.lang.Double]("obs")).map(_.toDouble) == obs)
        assert(Option(r.getAs[java.lang.Double]("prev_obs")).map(_.toDouble)
          == lastObs, s"prev_obs at event ${e._1}")
        lastObs = obs.orElse(lastObs)
        assert(Option(r.getAs[java.lang.Double]("filled")).map(_.toDouble)
          == lastObs, s"filled at event ${e._1}")
        assert(Option(r.getAs[java.lang.Double]("first_obs")).map(_.toDouble)
          == firstObs)
      }
    }
  }

  test("win_frame_interval: trailing-hour frame replays microsecond-exact per user") {
    import org.apache.spark.sql.functions.col
    val got = graft.operators.Windows.winFrameInterval(spark, sf)
      .where(col("user_id") < 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val ev = graft.Tables.events(spark, sf)
      .where(col("user_id") < 5)
      .select(col("user_id"), col("event_id"), col("ts"),
        org.apache.spark.sql.functions.expr(
          "CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 +
          (r.getTimestamp(2).getNanos / 1000) % 1000, r.getLong(3)))
    assert(ev.nonEmpty && got.size == ev.length)
    ev.groupBy(_._1).foreach { case (_, rows) =>
      rows.foreach { case (u, eid, tUs, _) =>
        val inFrame = rows.filter(r =>
          r._3 <= tUs && r._3 >= tUs - 3600000000L)
        val (n, cents) = got((u, eid))
        assert(n == inFrame.length.toLong,
          s"user $u event $eid frame count")
        assert(cents == inFrame.map(_._4).sum, s"user $u event $eid mass")
      }
    }
  }
}
