package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only stage-timing probe (not part of the driver contract): times
  * named SparkEntry queries and prints their final adaptive plans, to
  * localize where wall-clock goes before optimizing. Usage:
  *   runMain graft.DevProbe <sfDir> <name> [name...]
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // run twice: first run pays codegen+AQE warmup, second is steady
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val rows = df.queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $n run$i: $rows rows in $dt%.2f s")
        if (i == 2) println(df.queryExecution.executedPlan.toString.take(8000))
      }
    }
    spark.stop()
  }
}
