package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator module contributes a `queries` map (op name →
  * (SparkSession, sfDir) => DataFrame) and an `oracle` map (op name →
  * equivalent DuckDB SQL over the same parquet fixture tables). This object
  * is the flat registry the driver consumes (Verify.scala / Bench.scala).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggHash(spark, "/root/testdata/sf0.001")

  private val modules: Seq[OpModule] = Seq(
    Scans, Filters, Joins, Aggregates, SortsSetOps, Windows, ScalarFns,
    Streaming, StreamIO, LlmOps, LlmExtended, LlmCuration, LlmScale,
    Analytics, PipelineOps, Retrieval, Preference
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
