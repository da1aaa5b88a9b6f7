package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Projection / filter / predicate operators (SURVEY.md §2.2).
  *
  * All predicates here are declarative `Column` expressions, so Catalyst
  * pushes them into the parquet scan (`PushedFilters` in the explain) —
  * at 100 TB that's the difference between reading row groups whose
  * min/max stats can match and reading everything. The scalar subquery in
  * `filter_subquery` is a broadcast cross-join of a 1-row aggregate: the
  * aggregate reduces map-side, only one row crosses the wire, and no
  * driver-side `collect` blocks the pipeline.
  */
object Filters extends OpModule {

  /** Computed projections (arithmetic over columns). Outputs are raw
    * doubles on purpose: per-row IEEE arithmetic on identical input bits is
    * bitwise-deterministic across engines, whereas round() tie-breaking is
    * NOT (Spark HALF_UP vs DuckDB's C rounding diverge on boundary reprs).
    * Rounding is only for order-sensitive multi-row aggregates (§5.4). */
  def project(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))
        * (lit(1) + col("l_tax"))).as("charged"))

  def filterSimple(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** AND / OR / NOT / IN / BETWEEN / LIKE in one predicate tree. */
  def filterCompound(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .where(
        (col("o_orderstatus").isin("F", "O")
          && col("o_totalprice").between(1000, 50000)
          && col("o_orderpriority").like("1%"))
          || (!col("o_orderstatus").isin("F", "O")
            && col("o_orderpriority").like("5%")))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority"))

  /** WHERE x > (SELECT avg(x) …) — scalar subquery as broadcast cross join. */
  def filterSubquery(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val avgQty = li.agg(avg(col("l_quantity")).as("avg_qty"))
    li.crossJoin(broadcast(avgQty))
      .where(col("l_quantity") > col("avg_qty"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
  }

  def distinctRows(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "project" -> project _,
    "filter_simple" -> filterSimple _,
    "filter_compound" -> filterCompound _,
    "filter_subquery" -> filterSubquery _,
    "distinct_rows" -> distinctRows _
  )

  def oracle: Map[String, String] = Map(
    "project" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice * (1 - l_discount) AS net_price,
        | l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
        |FROM lineitem""".stripMargin,
    "filter_simple" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity < 24""".stripMargin,
    "filter_compound" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE (o_orderstatus IN ('F','O')
        |       AND o_totalprice BETWEEN 1000 AND 50000
        |       AND o_orderpriority LIKE '1%')
        |   OR (o_orderstatus NOT IN ('F','O')
        |       AND o_orderpriority LIKE '5%')""".stripMargin,
    "filter_subquery" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)""".stripMargin,
    "distinct_rows" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
