package graft

import java.nio.file.Files

import graft.operators.PipelineOps
import graft.pipeline.{FileTopic, Pipeline}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("declared pipeline: streaming execution equals batch execution") {
    val batch = PipelineOps.revenuePipeline(sf).runBatch(spark)
      .collect().map(_.toSeq).toSet
    val streamed = PipelineOps.pipelineE2e(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("pipeline restart from the same checkpoint is exactly-once") {
    val scratch = Files.createTempDirectory("graft-pipe-test").toString
    val out = s"$scratch/out"
    val ckpt = s"$scratch/ckpt"
    val p = PipelineOps.revenuePipeline(sf)
    def runOnce(): Unit = {
      val q = p.start(spark, out, ckpt)
      if (!q.awaitTermination(120000L)) q.stop()
    }
    runOnce()
    val first = spark.read.parquet(out).count()
    runOnce() // same checkpoint + same source: must process nothing new
    val second = spark.read.parquet(out).count()
    assert(first == second, s"restart doubled output: $first -> $second")
    assert(spark.read.parquet(out).select("event_id").distinct().count() == first)
  }

  test("stages compose in declaration order") {
    val dir = Files.createTempDirectory("graft-pipe-order").toString
    Seq((1L, 5.0), (2L, 50.0), (3L, 500.0)).toDF("id", "v")
      .write.parquet(s"$dir/t.parquet")
    val p = Pipeline.from("order-test", FileTopic(s"$dir/t.parquet"))
      .stage(_.where($"v" > 10))          // drops id=1
      .stage(_.selectExpr("id", "v * 2 AS v2")) // then projects
    val got = p.runBatch(spark).orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((2L, 100.0), (3L, 1000.0)))
  }

  test("curation pipeline: stream equals batch, duplicates collapse") {
    val batch = PipelineOps.curationPipeline(sf).runBatch(spark)
      .collect().map(_.toSeq).toSet
    val streamed = PipelineOps.pipelineCuration(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // exact-dup fixture docs must have collapsed: distinct hashes only
    val hashes = streamed.toSeq.map(_.head)
    assert(hashes.distinct.size == hashes.size)
    // survivor count == distinct gated texts, computed independently
    val want = graft.Tables.documents(spark, sf)
      .selectExpr("text", "size(split(text, ' ')) AS nt")
      .where("nt BETWEEN 10 AND 5000")
      .select("text").distinct().count()
    assert(hashes.size.toLong == want)
  }
}
