package graft

import graft.operators.StreamIO

class StreamIOSpec extends SparkSpec {
  import spark.implicits._

  test("checkpoint recovery does not double output on restart") {
    val out = StreamIO.checkpointRecovery(spark, sf)
    val n = out.count()
    val expected = graft.Tables.events(spark, sf)
      .where($"event_type" === "signup").count()
    assert(n == expected, s"restart must be exactly-once: $n vs $expected")
    // and no duplicate event_ids
    assert(out.select("event_id").distinct().count() == n)
  }

  test("rate-micro-batch source produces deterministic rows") {
    val r = StreamIO.sourceRate(spark, sf).collect().head
    assert(r.getAs[Long]("n_rows") >= 100)
    assert(r.getAs[Long]("min_v") == 0L)
  }

  test("memory-source replay equals its VALUES oracle shape") {
    val rows = StreamIO.sourceMemory(spark, sf).collect()
    // 5 events over 3 hours × type → 4 (h0 click, h0 view, h1 click, h2 view)
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("n_events")).sum == 5)
  }

  test("stream-stream join matches the batch interval join") {
    val streamed = StreamIO.joinStreamStream(spark, sf)
      .select("click_id", "purchase_id").collect().toSet
    val ev = graft.Tables.events(spark, sf)
    val c = ev.where($"event_type" === "click")
      .select($"user_id".as("cu"), $"event_id".as("click_id"), $"ts".as("cts"))
    val p = ev.where($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"event_id".as("purchase_id"), $"ts".as("pts"))
    val batch = c.join(p, $"cu" === $"pu" &&
        $"pts" >= $"cts" - org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES") &&
        $"pts" <= $"cts")
      .select("click_id", "purchase_id").collect().toSet
    assert(streamed == batch)
  }
}
