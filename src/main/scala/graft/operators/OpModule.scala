package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of related operators contributing to the SparkEntry registry. */
trait OpModule {
  /** op name → (session, sfDir) => result. Names are SURVEY.md §2 keys. */
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** op name → equivalent DuckDB SQL over the fixture tables. Keys absent
    * here (streaming / approximate ops) get a rows-only check. */
  def oracle: Map[String, String]
}

private[operators] object MemoUtil {
  /** Free the block-manager storage behind a localCheckpoint'd DataFrame
    * (its analyzed plan is a LogicalRDD over the materialized blocks).
    * Memo resets must call this before dropping their references —
    * clearing the map alone strands the checkpoint blocks until GC,
    * inflating memory across bench passes. */
  def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
