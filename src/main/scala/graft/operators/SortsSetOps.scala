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


  /** OFFSET pagination (ORDER BY … LIMIT k OFFSET n — the page-2+
    * query): Spark plans a GlobalLimit(offset+k) over the ordered
    * stream and drops the first n at the driver, so the cost is the
    * same top-(n+k) heap as `topk`, NOT a full sort — but cost grows
    * with the offset (page 10 000 pays a 100 030-row heap), which is
    * why production pagination keysets ("WHERE key > last_seen ORDER BY
    * key LIMIT k", the limit plan at ANY page depth). The total order
    * key makes the page deterministic. */
  def sortOffset(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(30)
      .limit(20)

  /** Spark 4 SQL sugar — GROUP BY ALL (group on every non-aggregate
    * select item), ORDER BY ALL (total order over the full select
    * list), and `SELECT * EXCEPT (…)` (schema-evolution-safe wide
    * projection: name what you DROP, inherit everything else). All
    * three compile to the identical Catalyst plan as their explicit
    * spellings — the test is that the sugar round-trips the semantics,
    * and DuckDB shares all three spellings. */
  def sqlSugar(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_sugar_orders")
    s.sql(
      """SELECT * EXCEPT (gross) FROM (
        |  SELECT o_orderstatus, o_orderpriority,
        |    count(*) AS n_orders,
        |    CAST(round(sum(o_totalprice)) AS BIGINT) AS gross,
        |    CAST(round(max(o_totalprice)) AS BIGINT) AS top_price
        |  FROM graft_sugar_orders
        |  GROUP BY ALL)
        |ORDER BY ALL""".stripMargin)
  }


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
    "sort_offset" -> sortOffset _,
    "sql_sugar" -> sqlSugar _,
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
    "sort_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 30""".stripMargin,
    "sql_sugar" ->
      """SELECT * EXCLUDE (gross) FROM (
        |  SELECT o_orderstatus, o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(round(sum(o_totalprice)) AS BIGINT) AS gross,
        |    CAST(round(max(o_totalprice)) AS BIGINT) AS top_price
        |  FROM orders
        |  GROUP BY ALL)
        |ORDER BY ALL""".stripMargin,
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
