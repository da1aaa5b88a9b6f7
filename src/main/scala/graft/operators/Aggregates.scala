package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Aggregation operators (SURVEY.md §2.4).
  *
  * All group-bys here are plain hash aggregations: Spark plans them as
  * partial (map-side) + final HashAggregate around a single shuffle on the
  * grouping keys, which is exactly the shape that scales — at 100 TB the
  * map-side combine collapses each of the ~billions of input rows into a
  * handful of per-partition group states before anything crosses the wire.
  *
  * Oracle-determinism (SURVEY.md §5.4): fractional-double aggregates are
  * rounded to 4 decimals on BOTH sides; every output is totally ordered by
  * its grouping keys (unique per row, so no tiebreaker needed).
  */
object Aggregates extends OpModule {

  /** Flagship: TPC-H Q1-shaped scan→filter→hash-agg→sort. */
  def aggHash(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("2001-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val aggHashSql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 4) AS sum_qty,
      | round(sum(l_extendedprice), 4) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(avg(l_discount), 4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_hash" -> aggHash _
  )

  def oracle: Map[String, String] = Map(
    "agg_hash" -> aggHashSql
  )
}
