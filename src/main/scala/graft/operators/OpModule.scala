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
