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
  /** Cast any TIMESTAMP_NTZ column to TimestampType. The regenerated
    * driver fixtures store naive timestamp[us] (no UTC flag); sessions set
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false` so the scan emits
    * TimestampType NATIVELY (no cast above the scan — a cast would block
    * parquet predicate pushdown on every date filter), making this fold a
    * no-op. It stays as a dispatch fallback for sessions without the conf:
    * all sessions run `spark.sql.session.timeZone=UTC`, so the cast is the
    * identity on the underlying µs value, and the DuckDB oracle reads the
    * same naive values as-is either way. */
  private def instantTyped(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        d.withColumn(f.name,
          col(f.name).cast(org.apache.spark.sql.types.TimestampType))
      else d
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    instantTyped(spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Normalize `events.ts` to a µs TimestampType column regardless of
    * fixture generation. Early driver fixtures stored TIMESTAMP(NANOS),
    * which Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL])
    * unless `spark.sql.legacy.parquet.nanosAsLong=true` (Verify / Bench /
    * SparkSpec all set it) — the column then arrives as a raw ns LONG and
    * is truncated here. Current fixtures store timestamp[us] without the
    * UTC flag, which Spark reads as TIMESTAMP_NTZ; all sessions run with
    * `spark.sql.session.timeZone=UTC`, so the NTZ→TZ cast is the identity
    * on the underlying µs value. Either way the oracle side sees the same
    * instants: DuckDB's `make_timestamp(epoch_ns(ts) // 1000)` reads the
    * naive timestamp as-is. Dispatch on the OBSERVED dtype (not a conf)
    * so the loader keeps working across fixture regenerations. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => df
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
