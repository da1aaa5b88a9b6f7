package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Source / sink operators (SURVEY.md §2.1).
  *
  * At-scale notes: parquet scans go through Spark's vectorized columnar
  * reader; projection and predicates are pushed into the footer/row-group
  * level by Catalyst (`scan_projected` has a plan-shape test asserting the
  * pushed filter). CSV/JSON demonstrate schema-explicit text ingestion —
  * at 100 TB these formats are splittable per-file, so ingestion
  * parallelism = file count; the roundtrip here keeps the data tiny but the
  * code path identical. Sinks write through the Hadoop committer, which is
  * the cluster-safe (task-retry-tolerant) commit protocol.
  */
object Scans extends OpModule {

  /** Per-JVM scratch dir — concurrent Verify/Bench runs must not share
    * roundtrip paths (a fixed /tmp path corrupts under two sessions). */
  private lazy val ioDir: String =
    java.nio.file.Files.createTempDirectory("graft_io").toString

  /** Full columnar scan. Deliberately sort-free: a scan is a bag, and at
    * 100 TB a trailing range-partitioned total sort would dominate the
    * operator; row-order canonicalization is the verifier's job. */
  def scanParquet(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)

  /** Scan with projection + predicate — both must reach the parquet reader
    * (Catalyst ColumnPruning + PushDownPredicates; asserted in ScansSpec). */
  def scanProjected(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_quantity") < 10)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  /** CSV roundtrip: write a projection of `part` as CSV, read it back with
    * an explicit schema (no inference job at scale). Doubles excluded —
    * text roundtrip of binary floats is not oracle-exact. */
  def scanCsv(s: SparkSession, d: String): DataFrame = {
    val path = s"$ioDir/part_csv"
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_size", IntegerType)))
    s.read.option("header", "true").schema(schema).csv(path)
  }

  /** JSON-lines roundtrip on `nation` (ints + strings only). */
  def scanJson(s: SparkSession, d: String): DataFrame = {
    val path = s"$ioDir/nation_json"
    Tables.nation(s, d).write.mode(SaveMode.Overwrite).json(path)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    s.read.schema(schema).json(path)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))
  }

  /** Materialize-then-rescan: the write path Verify itself exercises, made
    * an explicit operator (write agg → parquet → read back). */
  def sinkParquet(s: SparkSession, d: String): DataFrame = {
    val path = s"$ioDir/sink_parquet"
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 4).as("sum_price"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    s.read.parquet(path).orderBy(col("o_orderstatus"))
  }

  /** ORC roundtrip on `supplier` — the second first-class columnar
    * format. Unlike the CSV roundtrip, binary floating point survives
    * exactly, so a double column is included deliberately. At scale ORC
    * gets the same vectorized reader + predicate pushdown treatment as
    * parquet. */
  def scanOrc(s: SparkSession, d: String): DataFrame = {
    val path = s"$ioDir/supplier_orc"
    Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
      .write.mode(SaveMode.Overwrite).orc(path)
    s.read.orc(path)
  }

  /** Hive-style partitioned dataset, staged once per (JVM, sfDir). At
    * 100 TB, partitioning on a low-cardinality pruning column is the
    * first line of defense: a predicate on it never touches excluded
    * directories. */
  private val partitionedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def partitionedOrders(s: SparkSession, d: String): String =
    partitionedDirs.computeIfAbsent(d, { dir =>
      val path = s"$ioDir/orders_part_${math.abs(dir.hashCode)}"
      Tables.orders(s, dir).write.mode(SaveMode.Overwrite)
        .partitionBy("o_orderpriority").parquet(path)
      path
    })

  /** Static partition pruning: the literal predicate on the partition
    * column must eliminate directories at planning time (PartitionFilters
    * in the scan — asserted in ScansSpec), so only ~2/5 of the data is
    * read. */
  def scanPartitioned(s: SparkSession, d: String): DataFrame =
    s.read.parquet(partitionedOrders(s, d))
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 4).as("sum_price"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_partitioned" -> scanPartitioned _,
    "scan_parquet" -> scanParquet _,
    "scan_projected" -> scanProjected _,
    "scan_csv" -> scanCsv _,
    "scan_orc" -> scanOrc _,
    "scan_json" -> scanJson _,
    "sink_parquet" -> sinkParquet _
  )

  def oracle: Map[String, String] = Map(
    "scan_partitioned" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        | round(sum(o_totalprice), 4) AS sum_price
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority""".stripMargin,
    "scan_parquet" -> "SELECT * FROM orders",
    "scan_projected" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_quantity < 10""".stripMargin,
    "scan_csv" ->
      "SELECT p_partkey, p_name, p_brand, p_size FROM part",
    "scan_orc" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    "scan_json" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "sink_parquet" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | round(sum(o_totalprice), 4) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
