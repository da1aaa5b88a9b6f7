package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sorts / limits / top-k (SURVEY.md §2.6) and set operations (§2.7).
  *
  * At-scale notes: `sort_global` is a range-partitioned sort (Spark samples
  * key ranges, then sorts per partition) — the only all-data sort in the
  * inventory; everything else avoids total ordering until the final small
  * result. `topk` must plan as TakeOrderedAndProject (per-partition O(n log
  * k) heap + driver merge of k·partitions rows, no full sort/shuffle) —
  * plan-shape asserted in SortsSetOpsSpec. Set ops are shuffles on the full
  * row hash; `union_all` alone is shuffle-free (pure concatenation).
  */
object SortsSetOps extends OpModule {

  def sortGlobal(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  def limitOp(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** ORDER BY + LIMIT k → TakeOrderedAndProject, the scalable top-k. */
  def topk(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(10)

  /** Per-partition sort (sink prep; partition-dependent → rows-only check). */
  def sortPartition(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .repartition(col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  def setUnionAll(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).select(col("o_custkey").as("k"))
    val b = Tables.customer(s, d).select(col("c_custkey").as("k"))
    a.union(b)
  }

  def setUnionDistinct(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).select(col("o_custkey").as("k"))
    val b = Tables.customer(s, d).select(col("c_custkey").as("k"))
    a.union(b).distinct()
  }

  def setIntersect(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).select(col("o_custkey").as("k"))
    val b = Tables.customer(s, d).where(col("c_acctbal") > 0)
      .select(col("c_custkey").as("k"))
    a.intersect(b)
  }

  def setExcept(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d).select(col("c_custkey").as("k"))
    val b = Tables.orders(s, d).select(col("o_custkey").as("k"))
    a.except(b)
  }

  /** Multiset (bag) semantics — the ALL variants SQL defines alongside
    * the distinct forms: INTERSECT ALL keeps min(countA, countB) copies
    * per value, EXCEPT ALL keeps max(0, countA − countB). Spark plans
    * both as one aggregate producing per-value replication counts + a
    * generator that re-expands them — counts shuffle, never row copies,
    * the same collapse-then-expand shape a 100 TB multiset op needs. */
  def setIntersectAll(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).select(col("o_custkey").as("k"))
    val b = Tables.customer(s, d).where(col("c_acctbal") > 0)
      .select(col("c_custkey").as("k"))
    a.intersectAll(b)
  }

  def setExceptAll(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).select(col("o_custkey").as("k"))
    val b = Tables.customer(s, d).select(col("c_custkey").as("k"))
    a.exceptAll(b)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_global" -> sortGlobal _,
    "limit" -> limitOp _,
    "topk" -> topk _,
    "sort_partition" -> sortPartition _,
    "set_union_all" -> setUnionAll _,
    "set_union_distinct" -> setUnionDistinct _,
    "set_intersect" -> setIntersect _,
    "set_except" -> setExcept _,
    "set_intersect_all" -> setIntersectAll _,
    "set_except_all" -> setExceptAll _
  )

  def oracle: Map[String, String] = Map(
    "sort_global" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "topk" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin,
    // sort_partition: partition-dependent order → rows-only check
    "set_union_all" ->
      """SELECT k FROM (
        |  SELECT o_custkey AS k FROM orders
        |  UNION ALL
        |  SELECT c_custkey AS k FROM customer)""".stripMargin,
    "set_union_distinct" ->
      """SELECT k FROM (
        |  SELECT o_custkey AS k FROM orders
        |  UNION
        |  SELECT c_custkey AS k FROM customer)""".stripMargin,
    "set_intersect" ->
      """SELECT k FROM (
        |  SELECT o_custkey AS k FROM orders
        |  INTERSECT
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0)""".stripMargin,
    "set_except" ->
      """SELECT k FROM (
        |  SELECT c_custkey AS k FROM customer
        |  EXCEPT
        |  SELECT o_custkey AS k FROM orders)""".stripMargin,
    "set_intersect_all" ->
      """SELECT k FROM (
        |  SELECT o_custkey AS k FROM orders
        |  INTERSECT ALL
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0)""".stripMargin,
    "set_except_all" ->
      """SELECT k FROM (
        |  SELECT o_custkey AS k FROM orders
        |  EXCEPT ALL
        |  SELECT c_custkey AS k FROM customer)""".stripMargin
  )
}
