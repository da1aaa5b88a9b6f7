package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders (TESTDATA.md: TPC-H-ish star schema + `events`
  * stream table + `documents`/`embeddings` LLM tables).
  *
  * At-scale note: every loader is a plain columnar Parquet scan — Spark's
  * vectorized reader + Catalyst column pruning / predicate pushdown apply
  * automatically, so downstream operators should express projections and
  * filters declaratively (never cache-then-filter) to keep the pushdown
  * reaching the scan at 100 TB.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` at build time (Verify /
    * Bench / SparkSpec all do) so the column arrives as a raw ns long; the
    * loader truncates to a µs TimestampType column — the oracle side
    * mirrors this with `make_timestamp(epoch_ns(ts) // 1000)`. The conf is
    * deliberately NOT set here: mutating session state inside a loader
    * races under concurrent query construction. */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
