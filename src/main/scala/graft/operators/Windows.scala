package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window functions (SURVEY.md §2.5).
  *
  * At-scale notes: a window over `partitionBy(k)` shuffles once on k and
  * sorts within each partition — the same single-exchange shape as a
  * group-by, so it scales as long as no single key's partition is huge
  * (user_id / custkey here are high-cardinality, well-spread keys; a
  * low-cardinality partition key would need pre-aggregation or salting).
  * No window here is keyless: an empty partitionBy would pull the whole
  * table through one task and is the #1 window-function scale bug.
  *
  * Oracle-determinism: every window order includes a unique tiebreaker
  * (event_id / o_orderkey / c_custkey) so rank/lag/frames are reproducible
  * bit-for-bit across engines (SURVEY.md §5.4.1).
  */
object Windows extends OpModule {

  /** Shared oracle preamble: events.ts is ns in parquet but µs in Spark
    * (see Tables.events) — the oracle mirrors the truncation exactly. */
  private val eventsCte =
    """WITH ev AS (
      |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |         user_id, event_type, value, props
      |  FROM events)""".stripMargin

  /** Ranking family: row_number / rank / dense_rank / ntile per market
    * segment ordered by account balance. Two window specs on purpose:
    * row_number/ntile need a unique tiebreaker for determinism, while
    * rank/dense_rank order by the value alone — a tiebreaker there would
    * destroy the tie semantics they exist for (peers are already
    * deterministic: equal values get equal ranks). */
  def winRank(s: SparkSession, d: String): DataFrame = {
    val wTie = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wVal = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc)
    Tables.customer(s, d).select(
      col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
      row_number().over(wTie).as("rn"),
      rank().over(wVal).as("rnk"),
      dense_rank().over(wVal).as("drnk"),
      ntile(4).over(wTie).as("quartile"),
      round(percent_rank().over(wVal), 4).as("pct_rank"),
      round(cume_dist().over(wVal), 4).as("cume"))
  }

  /** Analytic family: lag / lead / first / last per user over event time.
    * first/last use an explicit full frame — the default frame stops at
    * CURRENT ROW, which silently turns last() into "current". */
  def winAnalytic(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d).select(
      col("user_id"), col("event_id"), col("value"),
      lag(col("value"), 1).over(w).as("prev_value"),
      lead(col("value"), 1).over(w).as("next_value"),
      first(col("value")).over(full).as("first_value"),
      last(col("value")).over(full).as("last_value"))
  }

  /** Running aggregate, ROWS frame: cumulative order value per customer. */
  def winFrameRows(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      round(sum(col("o_totalprice")).over(w), 4).as("running_total"),
      count(lit(1)).over(w).as("running_n"))
  }

  /** Value-based RANGE frame: 7-day trailing event-value sum per user.
    * Spark range frames need a numeric order key → order by epoch seconds;
    * the oracle uses RANGE BETWEEN INTERVAL on the timestamp directly. */
  def winFrameRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-7L * 86400, 0)
    Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      round(sum(col("value")).over(w), 4).as("sum_7d"),
      count(lit(1)).over(w).as("n_7d"))
  }

  /** INTERVAL range frame — the time-native spelling of the trailing
    * window (win_frame_range casts ts to epoch seconds and frames in
    * numbers; production SQL frames in `INTERVAL`): per event, the
    * count and value-mass of the SAME USER's events in the trailing
    * hour, `RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW`
    * ordered by the raw timestamp — microsecond-exact on both engines
    * (no epoch truncation: a cast-to-seconds frame misplaces events on
    * the same second's boundary, the subtle drift this op exists to
    * avoid). Restricting users BEFORE the window is safe (frames never
    * cross partitions) and keeps the readout bounded. At 100 TB this
    * is the per-entity sliding feature every realtime feature store
    * materializes; the shuffle is one hash-partition on user_id and
    * each partition sorts once — WindowExec reuses the sort across
    * both aggregates. */
  def winFrameInterval(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .where(col("user_id") < 100)
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("""count(*) OVER (PARTITION BY user_id ORDER BY ts
               |RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               |""".stripMargin).as("n_1h"),
        expr("""sum(CAST(round(value * 100) AS BIGINT)) OVER (
               |PARTITION BY user_id ORDER BY ts
               |RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               |""".stripMargin).as("cents_1h"))
      .drop("ts")
  }

  /** Top-k per group: 3 biggest orders per customer — the canonical
    * window-filter composition (also the final stage of similarity top-k). */
  def winTopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .where(col("rn") <= 3)
  }

  /** Gaps-and-islands: longest run of CONSECUTIVE active days per user —
    * the canonical streak computation (daily-active streaks, SLA runs).
    * day − row_number is constant within a consecutive run, so one
    * window pass + two aggregates find every island without a self-join;
    * day arithmetic stays in exact integer days. */
  def winStreak(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    Tables.events(s, d)
      .select(col("user_id"), expr("cast(ts as long) div 86400").as("day"))
      .distinct()
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("streak_len"), min(col("day")).as("start_day"))
      .groupBy(col("user_id"))
      .agg(max(col("streak_len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
  }

  /** The same top-3-per-customer as win_topk_pergroup, but through the
    * CUSTOM whole-operator path (graft.plans.TopKPerGroupPlan →
    * TopKPerGroupStrategy → partial/final TopKPerGroupExec): the partial
    * stage caps every (group, partition) at k rows BEFORE the exchange,
    * so the shuffle carries ≤ k·partitions rows per group instead of the
    * whole table — the window formulation above shuffles everything.
    * Same oracle as the window twin; plan shape asserted in
    * CustomSurfaceSpec. */
  def topkPergroupNative(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    graft.plans.TopKPerGroup.topK(
      base, Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
  }

  /** IGNORE NULLS window navigation — the sparse-series forward-fill
    * idiom (sensor feeds, slowly-changing attributes, tick data: most
    * rows carry no observation and each row needs "the latest value
    * that existed"): `view` events' values are masked to NULL to stage
    * sparsity, then one ordered window per user computes the
    * forward-fill (last non-null so far), the previous distinct
    * observation (lag IGNORE NULLS), and the series' first observation
    * (first_value IGNORE NULLS over the full frame). This is the
    * O(1)-state streaming-friendly alternative to a self-join against
    * "the most recent non-null row" — at 100 TB the window runs inside
    * one per-user sort partition, no join, no second scan. */
  def winIgnoreNulls(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.events(s, d)
      .withColumn("obs",
        when(col("event_type") =!= "view", round(col("value"), 4)))
      .select(
        col("event_id"), col("user_id"),
        col("obs"),
        last(col("obs"), ignoreNulls = true).over(run).as("filled"),
        lag(col("obs"), 1, null, ignoreNulls = true).over(w).as("prev_obs"),
        first(col("obs"), ignoreNulls = true).over(full).as("first_obs"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_ignore_nulls" -> winIgnoreNulls _,
    "win_streak" -> winStreak _,
    "topk_pergroup_native" -> topkPergroupNative _,
    "win_rank" -> winRank _,
    "win_analytic" -> winAnalytic _,
    "win_frame_rows" -> winFrameRows _,
    "win_frame_range" -> winFrameRange _,
    "win_frame_interval" -> winFrameInterval _,
    "win_topk_pergroup" -> winTopkPerGroup _
  )

  def oracle: Map[String, String] = Map(
    // the identical INTERVAL frame; ts normalized to microseconds the
    // same way the fixture reader does
    "win_frame_interval" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 100)
        |SELECT user_id, event_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""
        .stripMargin,
    // DuckDB spells the modifier inside the window function call
    // (lag(x, 1 IGNORE NULLS)); same fill/prev/first semantics
    "win_ignore_nulls" -> (
      """WITH ev AS (
        |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |         user_id, event_type, value
        |  FROM events),
        |m AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN event_type <> 'view' THEN round(value, 4) END AS obs
        |  FROM ev)
        |SELECT event_id, user_id, obs,
        |  last_value(obs IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  lag(obs, 1 IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_obs,
        |  first_value(obs IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS first_obs
        |FROM m""".stripMargin),
    "win_streak" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    (epoch_ns(ts) // 1000000000) // 86400 AS day
        |  FROM events),
        |runs AS (
        |  SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS grp
        |  FROM days),
        |islands AS (
        |  SELECT user_id, grp, count(*) AS streak_len
        |  FROM runs GROUP BY user_id, grp)
        |SELECT user_id, max(streak_len) AS longest_streak,
        |       count(*) AS n_streaks
        |FROM islands GROUP BY user_id""".stripMargin,
    "win_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        | row_number() OVER wt AS rn,
        | rank() OVER wv AS rnk,
        | dense_rank() OVER wv AS drnk,
        | ntile(4) OVER wt AS quartile,
        | round(percent_rank() OVER wv, 4) AS pct_rank,
        | round(cume_dist() OVER wv, 4) AS cume
        |FROM customer
        |WINDOW wt AS (PARTITION BY c_mktsegment
        |              ORDER BY c_acctbal DESC, c_custkey),
        |       wv AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)""".stripMargin,
    "win_analytic" -> (eventsCte +
      """
        |SELECT user_id, event_id, value,
        | lag(value, 1) OVER w AS prev_value,
        | lead(value, 1) OVER w AS next_value,
        | first_value(value) OVER wf AS first_value,
        | last_value(value) OVER wf AS last_value
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |       wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin),
    "win_frame_rows" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER w, 4) AS running_total,
        | count(*) OVER w AS running_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    // numeric frame over epoch seconds, not INTERVAL over raw ts: Spark's
    // cast-to-long order key floors to seconds, so the oracle must compare
    // at the same granularity or sub-second timestamps diverge at the edge
    "win_frame_range" -> (eventsCte +
      """
        |SELECT user_id, event_id,
        | round(sum(value) OVER w, 4) AS sum_7d,
        | count(*) OVER w AS n_7d
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY (epoch_ns(ts) // 1000000000)
        |             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)""".stripMargin),
    "win_topk_pergroup" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | row_number() OVER (PARTITION BY o_custkey
        |                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders
        |QUALIFY rn <= 3""".stripMargin,
    "topk_pergroup_native" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | row_number() OVER (PARTITION BY o_custkey
        |                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders
        |QUALIFY rn <= 3""".stripMargin
  )
}
