package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Join matrix (SURVEY.md §2.3).
  *
  * At-scale strategy per variant:
  *  - equi joins (inner/outer/semi/anti) shuffle both sides on the key —
  *    Catalyst picks SortMergeJoin or ShuffledHashJoin; AQE converts to
  *    broadcast at runtime when a side turns out small, and splits skewed
  *    partitions (skew-join handling is free with AQE on).
  *  - dimension joins (`join_broadcast`) pin `broadcast()` explicitly: at
  *    100 TB the fact side never shuffles, each executor hash-probes an
  *    in-memory dim table (nation=25, region=5 rows — trivially small).
  *  - `join_theta`'s equi conjunct keeps it a hash/merge join with a
  *    residual filter — never a nested-loop; a pure theta join would be
  *    BroadcastNestedLoopJoin and is only safe when one side is tiny
  *    (`join_cross` is exactly that, 5×25 rows).
  *  - `join_range` maps each probe row to a band via a broadcast interval
  *    table; at scale the same shape works with interval bucketing (split
  *    intervals into aligned buckets, equi-join on bucket id) — here bands
  *    are few, broadcast suffices.
  *
  * Null-ordering discipline: outer-join sort keys are wrapped in
  * `coalesce(k, -1)` in BOTH engines — Spark default is NULLS FIRST,
  * DuckDB's is NULLS LAST, so raw null keys would silently reorder rows.
  */
object Joins extends OpModule {

  def joinInnerHash(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
        col("o_totalprice"))
  }

  /** Star-schema dim enrichment: both dims broadcast (plan-shape tested). */
  def joinBroadcast(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
  }

  /** Large-large equi join forced to sort-merge via hint. */
  def joinSortMerge(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d).hint("merge")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_quantity")), 4).as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  def joinLeft(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  def joinRight(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"), "right")
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  /** Full outer over two derived key sets that each miss some keys. */
  def joinFull(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val f = o.where(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("f_key")).distinct()
    val op = o.where(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("o_key")).distinct()
    f.join(op, col("f_key") === col("o_key"), "full")
      .select(
        coalesce(col("f_key"), col("o_key")).as("custkey"),
        when(col("f_key").isNotNull, 1).otherwise(0).as("has_f"),
        when(col("o_key").isNotNull, 1).otherwise(0).as("has_o"))
  }

  def joinLeftSemi(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  def joinLeftAnti(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Equi conjunct + non-equi residual: stays a hash/merge join. */
  def joinTheta(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey")
        && li("l_extendedprice") > o("o_totalprice") * 0.5)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("o_totalprice"))
  }

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the join you
    * need when the key itself is nullable and NULL means a real
    * category ("unassigned") that must MATCH its counterpart rather
    * than silently drop (plain `=` evaluates NULL=NULL to NULL and the
    * row vanishes — the classic missing-rows bug in dimension joins).
    * Keys are staged nullable with nullif, each side pre-aggregates to
    * one row per key (the null class would otherwise cross-multiply),
    * and the output proves the semantics: the NULL key row survives
    * with both sides' counts and is flagged nullsafe_only.
    *
    * At-scale: EqualNullSafe keys still plan as a shuffled hash join
    * (nulls hash like any value — one bucket, no BNLJ fallback), so the
    * null-safe form costs the same as `=`. A skewed giant null class is
    * the same salting problem as any hot key (join_salted). */
  def joinNullSafe(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .withColumn("k", nullif(col("c_nationkey"), lit(13)))
      .groupBy(col("k")).agg(count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, d)
      .withColumn("k2", nullif(col("s_nationkey"), lit(13)))
      .groupBy(col("k2")).agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("k") <=> col("k2"))
      .select(
        coalesce(col("k"), lit(-1L)).as("key_or_sentinel"),
        col("k").isNull.as("nullsafe_only"),
        col("n_cust"), col("n_supp"),
        (col("n_cust") * col("n_supp")).as("pair_mass"))
  }

  /** LATERAL correlated subquery join (Spark 4 SQL surface): for each
    * qualifying customer, the per-customer "top 2 orders by price" —
    * the correlated ORDER BY … LIMIT shape that LATERAL exists for.
    * Catalyst DECORRELATES it: the plan is one window-ranked orders
    * scan equi-joined back to customers (verify with explain — no
    * per-customer re-execution, no nested loop), so the lateral form
    * is exactly as scalable as the hand-written win_topk_pergroup
    * composition while reading as the intent. */
  def joinLateral(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("graft_lat_cust")
    Tables.orders(s, d).createOrReplaceTempView("graft_lat_orders")
    s.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM graft_lat_cust c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM graft_lat_orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin)
  }

  def joinCross(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  /** Band/range join: events.value against a broadcast interval table. */
  def joinRange(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      (0, 0.0, 20.0), (1, 20.0, 40.0), (2, 40.0, 60.0),
      (3, 60.0, 80.0), (4, 80.0, 1e9)
    ).toDF("band_id", "lo", "hi")
    Tables.events(s, d)
      .join(broadcast(bands),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("band_id"))
  }

  /** As-of join: for each click, the latest purchase by the same user at
    * or before the click's timestamp (the canonical stream-enrichment
    * join; DuckDB has it native as ASOF JOIN).
    *
    * Spark has no native as-of, and the naive composition — join on user
    * with ts <= ts, then keep rank 1 — explodes quadratically per user.
    * This implementation is the scalable one: union both sides tagged,
    * single shuffle on user_id, one ordered window pass carrying the most
    * recent purchase forward via last(ignoreNulls). O(n log n) per user,
    * no intermediate blowup — the same merge-scan shape a native as-of
    * operator would run. At equal timestamps the purchase sorts before
    * the click (is_left ascending), so ts-equal matches are included. */
  def joinAsof(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click").select(
      col("user_id"), col("ts"), lit(1).as("is_left"),
      col("event_id"),
      lit(null).cast("long").as("p_event"),
      lit(null).cast("double").as("p_value"))
    val purchases = ev.where(col("event_type") === "purchase").select(
      col("user_id"), col("ts"), lit(0).as("is_left"),
      col("event_id"),
      col("event_id").as("p_event"),
      col("value").as("p_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_left"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.union(purchases)
      .select(
        col("user_id"), col("ts"), col("is_left"), col("event_id"),
        last(col("p_event"), ignoreNulls = true).over(w).as("matched_purchase"),
        last(col("p_value"), ignoreNulls = true).over(w).as("purchase_value"))
      .where(col("is_left") === 1)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("matched_purchase"), col("purchase_value"))
  }

  /** FORWARD as-of join — the other time direction (pandas
    * merge_asof(direction='forward')): each click matched to the NEXT
    * purchase at-or-after it — the time-to-conversion / next-reading
    * shape backward as-of cannot express. Same single ordered
    * union+window pass (no per-row probe, no range join): the frame
    * flips to (currentRow, unboundedFollowing) with first() instead of
    * last(), and the tiebreak flips with it (clicks sort BEFORE
    * purchases at equal ts so a same-instant purchase is inside the
    * following frame — the at-or-after contract). At 100 TB this is
    * one shuffle on user_id and one sort, identical to join_asof. */
  def joinAsofForward(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click").select(
      col("user_id"), col("ts"), lit(1).as("is_left"),
      col("event_id"),
      lit(null).cast("long").as("p_event"),
      lit(null).cast("double").as("p_value"))
    val purchases = ev.where(col("event_type") === "purchase").select(
      col("user_id"), col("ts"), lit(0).as("is_left"),
      col("event_id"),
      col("event_id").as("p_event"),
      col("value").as("p_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_left").desc, col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    clicks.union(purchases)
      .select(
        col("user_id"), col("ts"), col("is_left"), col("event_id"),
        first(col("p_event"), ignoreNulls = true).over(w)
          .as("next_purchase"),
        first(col("p_value"), ignoreNulls = true).over(w)
          .as("next_value"))
      .where(col("is_left") === 1)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("next_purchase"), col("next_value"))
  }

  /** As-of join WITH TOLERANCE — the production variant of join_asof
    * (pandas `merge_asof(tolerance=...)`, kdb `wj`): a match older than
    * the window is WORSE than no match (sensor fusion joining a reading
    * from last week, attribution crediting a month-old touchpoint), so
    * each click keeps its most-recent preceding purchase ONLY if it
    * landed within 24 h, else reports unmatched. Same single ordered
    * union+window pass as join_asof (no per-row probe, no range BNLJ —
    * the tolerance is a post-match filter on the exact µs gap, NOT a
    * join predicate, so the plan is untouched); exact integer µs
    * arithmetic, stale matches null out but the row survives (LEFT
    * semantics — the unmatched count is the metric attribution teams
    * watch). */
  def joinAsofTolerance(s: SparkSession, d: String): DataFrame = {
    val tolUs = 86400000000L // 24 h in µs
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click").select(
      col("user_id"), col("ts"), lit(1).as("is_left"),
      col("event_id"),
      lit(null).cast("long").as("p_event"),
      lit(null).cast("timestamp").as("p_ts"))
    val purchases = ev.where(col("event_type") === "purchase").select(
      col("user_id"), col("ts"), lit(0).as("is_left"),
      col("event_id"),
      col("event_id").as("p_event"),
      col("ts").as("p_ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_left"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.union(purchases)
      .select(
        col("user_id"), col("ts"), col("is_left"), col("event_id"),
        last(col("p_event"), ignoreNulls = true).over(w).as("mp"),
        last(col("p_ts"), ignoreNulls = true).over(w).as("mts"))
      .where(col("is_left") === 1)
      .withColumn("gap_us",
        expr("unix_micros(ts) - unix_micros(mts)"))
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("gap_us") <= tolUs, col("mp")).as("matched_purchase"),
        when(col("gap_us") <= tolUs, col("gap_us")).as("gap_us"),
        coalesce(col("gap_us") <= tolUs, lit(false)).as("within_tol"))
  }

  /** Bucketed co-located join: both tables pre-bucketed on the join key
    * into the same bucket count, so the join needs NO exchange on either
    * side — each task reads matching buckets and merges. This is THE
    * 100 TB pattern for repeated large-large joins: pay one bucketed
    * write, then every subsequent join on that key is shuffle-free
    * (asserted plan-shape in JoinsSpec). Bucket sort order is declared
    * too, eliminating the sort before the merge join. */
  private val bucketedTables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  def joinBucketed(s: SparkSession, d: String): DataFrame = {
    // staged once per sfDir per JVM; the suffix is derived from the full
    // path (not hashCode) so distinct sfDirs can never collide in the
    // catalog, and the temp dir is only created when staging actually runs
    val (liTbl, oTbl) = bucketedTables.computeIfAbsent(d, { _ =>
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val li = s"graft_li_$sfx"
      val o = s"graft_o_$sfx"
      if (!s.catalog.tableExists(li)) {
        val base = java.nio.file.Files.createTempDirectory("graft_buckets").toString
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$base/$li").saveAsTable(li)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$base/$o").saveAsTable(o)
      }
      (li, o)
    })
    // merge hint: at fixture scale AQE would broadcast the small side,
    // which bypasses buckets entirely — the point here is the
    // co-located merge path a real large-large join takes
    s.table(liTbl).hint("merge")
      .join(s.table(oTbl), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Dynamic partition pruning: the fact side is partitioned on the join
    * key; the dim side's filter is only known at runtime, so Catalyst
    * injects a dynamic pruning subquery into the fact scan (reusing the
    * broadcast) — the fact reads only the partitions the filtered dim
    * actually joins to. At 100 TB this is how a star-schema query avoids
    * scanning the fact table for dimension-filtered slices. */
  private val dppDim = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def joinDpp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val factPath = Scans.partitionedOrders(s, d)
    // the dim must be a real datasource relation: a literal Seq folds to
    // a LocalRelation at optimization time and its filter constant-folds
    // away, so DPP sees no selective predicate and never fires
    // predicate shape matters too: DPP's isLikelySelective matcher wants
    // a comparison/IN/LIKE — a bare boolean attribute (or urgent = true,
    // which BooleanSimplification reduces to one) does not qualify
    val dimPath = dppDim.computeIfAbsent(d, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft_dpp").toString + "/dim"
      Seq(
        ("1-URGENT", "urgent"), ("2-HIGH", "urgent"), ("3-MEDIUM", "normal"),
        ("4-NOT SPECIFIED", "normal"), ("5-LOW", "normal")
      ).toDF("priority", "svc_class").write.parquet(p)
      p
    })
    s.read.parquet(factPath)
      .join(broadcast(s.read.parquet(dimPath)
          .where(col("svc_class") === "urgent")),
        col("o_orderpriority") === col("priority"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(avg(col("o_totalprice")), 4).as("avg_price"))
  }

  /** Manual skew salting: the fact's hot low-cardinality key (5 event
    * types over 100k+ rows) is joined through a composite (key, salt)
    * with the dim exploded across all salts — each hot key spreads over
    * 8 shuffle partitions instead of 1. AQE's skew-join split covers
    * sort-merge joins automatically; explicit salting is the portable
    * fallback (works for any keyed op, incl. streaming state). */
  /** AQE runtime skew-join split — the AUTOMATIC half of the skew story
    * joinSalted hand-writes: a planted hot key (orderkey 1 replicated
    * ×20 000 in-plane via sequence-explode — no join, so the lint's
    * Cartesian gate is untouched) concentrates one shuffle partition;
    * with skew-join enabled and fixture-scale thresholds the AQE
    * re-planner SPLITS that partition across tasks at runtime
    * (OptimizeSkewedJoin marks the sort-merge join isSkewJoin=true —
    * spec-asserted on the executed adaptive plan) while the other side's
    * matching partition is duplicated. Results are identical with the
    * optimization on or off — that's the point: at 100 TB a hot key
    * melts ONE task, and AQE absorbs it with zero query changes.
    * Thresholds are session-scoped (derived session): production keeps
    * the 256 MB default; the fixture's hot partition is ~1-14 MB, so the
    * demo lowers them to make the same machinery fire. Broadcast is
    * disabled (both thresholds) because a broadcast join would dissolve
    * the shuffle the split acts on. sum(l_quantity) is integer-valued
    * double → exact in 64-bit float, CAST to BIGINT on both engines. */
  def joinSkewAqe(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      s0.conf.get("spark.sql.shuffle.partitions"))
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "65536")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"))
    // the replica index rides as a DISTINCT payload: skew detection
    // reads COMPRESSED map-output sizes, and 20 000 identical rows
    // lz4-collapse below any threshold — a varying column keeps the hot
    // partition's bytes honest (and sums deterministically on both
    // engines: Σ i·1000003 mod p is plain integer arithmetic)
    val hot = li.where(col("l_orderkey") === 1)
      .withColumn("__i", explode(expr("sequence(1, 20000)")))
      .withColumn("pay", col("__i") * lit(1000003L) % lit(1000000007L))
      .drop("__i")
      // the skew split regroups MAP outputs: a reduce partition fed by
      // ONE map task cannot split (measured — the single-task explode
      // left createSkewPartitionSpecs with nothing to regroup). At
      // 100 TB a hot key's rows arrive from thousands of maps; the
      // round-robin spread reproduces that shape at fixture scale
      .repartition(32)
    val fact = li.where(col("l_orderkey") =!= 1)
      .withColumn("pay", lit(0L)).unionByName(hot)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"))
    fact.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("bigint").as("sum_qty"),
        sum(col("pay")).as("sum_pay"))
  }

  /** AQE RUNTIME JOIN DEMOTION — the third leg of the adaptive trio
    * (join_skew_aqe splits the too-big partition, agg_aqe_coalesce
    * merges the too-many): a join planned sort-merge from STATIC
    * estimates is re-planned to broadcast-hash at RUNTIME once the
    * build side's actual materialized size comes in under the
    * threshold. The build side here is an AGGREGATE of customer — its
    * pre-aggregation stats look join-sized, and with ordinary
    * broadcast estimation disabled for the demo (autoBroadcastJoinThreshold
    * = -1, the "planner guessed wrong" stand-in) the static plan is a
    * shuffle join; AQE's adaptive threshold then reads the REAL
    * map-output bytes (a few KB of per-nation rows) and demotes. At
    * 100 TB this is the difference between shuffling a petabyte fact
    * table because a dimension's pre-filter stats were stale, and
    * broadcasting the actual 2 MB that materialized — stats go stale
    * weekly, runtime sizes never do. JoinsSpec asserts static-off plan
    * = SMJ, adaptive final plan = BroadcastHashJoin, rows identical. */
  def joinBroadcastAqe(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      s0.conf.get("spark.sql.shuffle.partitions"))
    s.conf.set("spark.sql.adaptive.enabled", "true")
    // the stale-stats stand-in: static planning must NOT broadcast...
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // ...while the runtime re-planner may, from actual sizes
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    val custByNation = Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("bal_cents"))
    Tables.orders(s, d)
      .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(custByNation, "c_nationkey")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("n_cust")).as("n_cust"),
        max(col("bal_cents")).as("bal_cents"))
  }

  /** PK-FK JOIN ELIMINATION demonstrator — the query shape every BI
    * tool / semantic layer / view stack generates: the fact table
    * joined to a dimension the final projection never reads (here the
    * join rides in from a reusable view definition; the aggregate only
    * wants fact columns). With the constraint pair declared (c_custkey
    * unique, o_custkey referential — the `RELY` contract, spec-verified
    * to hold in the data), `plans/JoinEliminationRewrite` removes the
    * join and injects `IsNotNull(o_custkey)` to preserve inner-join
    * null semantics: the plan drops from scan+scan+join to ONE scan.
    * At 100 TB that is a corpus-sized broadcast probe (or shuffle)
    * bought for nothing on every dashboard refresh. Exactness is
    * gate-proven: the oracle REPLAYS THE JOIN. CustomSurfaceSpec pins
    * plan shape (no join, one scan), rule-off row equality, the
    * dim-column-referenced bail, and idempotence. */
  def joinEliminateAutorewrite(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      s0.conf.get("spark.sql.shuffle.partitions"))
    graft.GraftExtensions.installOptimizations(s)
    s.conf.set(graft.plans.JoinEliminationRewrite.Flag, "true")
    s.conf.set(graft.plans.JoinEliminationRewrite.DimConf, "customer.parquet")
    s.conf.set(graft.plans.JoinEliminationRewrite.PkConf, "c_custkey")
    s.conf.set(graft.plans.JoinEliminationRewrite.FkConf, "o_custkey")
    s.conf.set(graft.plans.JoinEliminationRewrite.FactConf, "orders.parquet")
    joinEliminateQuery(s, d)
  }

  /** DISTINCT ELIMINATION demonstrator — the uniqueness declaration's
    * other payoff: `SELECT DISTINCT c_custkey, c_nationkey FROM
    * customer` is duplicate-free BY CONSTRAINT (c_custkey unique), so
    * the de-duplicating aggregate — a full shuffle of the projection —
    * is dropped to a plain pruned scan. BI tools emit this shape for
    * every dimension picker / filter dropdown; at 100 TB each is a
    * needless table-wide exchange. Same conf surface, same RELY trust
    * model, oracle replays the DISTINCT verbatim. */
  def aggDistinctAutorewrite(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      s0.conf.get("spark.sql.shuffle.partitions"))
    graft.GraftExtensions.installOptimizations(s)
    s.conf.set(graft.plans.JoinEliminationRewrite.Flag, "true")
    s.conf.set(graft.plans.JoinEliminationRewrite.DimConf, "customer.parquet")
    s.conf.set(graft.plans.JoinEliminationRewrite.PkConf, "c_custkey")
    s.conf.set(graft.plans.JoinEliminationRewrite.FkConf, "o_custkey")
    s.conf.set(graft.plans.JoinEliminationRewrite.FactConf, "orders.parquet")
    aggDistinctQuery(s, d)
  }

  private[graft] def aggDistinctQuery(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey")).distinct()

  /** EAGER AGGREGATION demonstrator — partial-aggregate pushdown below
    * the join (plans/AggPushdownRewrite; Yan–Larson group-by pushdown):
    * revenue-by-nation spelled the naive way — join every order to its
    * customer, then collapse — re-plans with the fact side
    * pre-aggregated by o_custkey, so the join probes |customers|
    * partial rows instead of |orders| facts (~10× here, often 1000× on
    * clickstream→user shapes; at 100 TB the difference between
    * shuffling the corpus and shuffling its key space). Sound
    * unconditionally for sum/count/min/max — and since r15 avg
    * (Σ partial_sum / Σ partial_count: the join multiplicity cancels in
    * the ratio) — on any inner equi-join, or a CHAIN of two (the rule
    * descends one level, grouping the partial by both collected fact
    * keys); no RELY declaration needed, unlike the elimination twin.
    * The spec pins the plan shape (an aggregate BELOW the join/chain)
    * and rule-off-equal results; the oracle replays the naive join. */
  def joinAggpushAutorewrite(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      s0.conf.get("spark.sql.shuffle.partitions"))
    graft.GraftExtensions.installOptimizations(s)
    s.conf.set(graft.plans.AggPushdownRewrite.Flag, "true")
    joinAggpushQuery(s, d)
  }

  /** The naive spelling (the spec runs it rule-off for the control):
    * the cents projection sits below the join so the aggregate inputs
    * are plain fact-side attributes. */
  private[graft] def joinAggpushQuery(s: SparkSession,
                                      d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents_sum"),
        min(col("cents")).as("cents_min"), max(col("cents")).as("cents_max"),
        // avg decomposes as Σpartial_sum/Σpartial_count (r15) — exact on
        // the integral cents, so the oracle's sum/count division
        // hash-matches the rewritten ratio bit-for-bit
        avg(col("cents")).as("cents_avg"))

  /** The naive spelling, on whatever session it is given (the spec
    * runs it rule-off for the control). */
  private[graft] def joinEliminateQuery(s: SparkSession,
                                        d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))

  /** EXCHANGE REUSE — the physical-plan dedup that makes DAG-shaped
    * queries affordable: two segment branches (frequent buyers by
    * order count, big spenders by lifetime cents) both read the SAME
    * per-customer aggregate, and Spark's ReuseExchange rule plans the
    * underlying shuffle ONCE — the second branch consumes the first's
    * materialized map outputs as a `ReusedExchange` (under AQE, a
    * reused query stage). At 100 TB the aggregate below the fork is a
    * corpus scan + corpus shuffle; without reuse every additional
    * segment re-pays both, with it each marginal segment costs only
    * its filter. This is the optimizer-given half of what
    * agg_mv_autorewrite buys across queries — WITHIN one query, reuse
    * is free and automatic, PROVIDED the branches are plan-identical
    * (a single flipped column order below the fork forfeits it, which
    * is why the spec pins the plan shape, not just the rows).
    * JoinsSpec asserts exactly one real shuffle materializes beneath
    * the union and the other side is a reuse node. */
  def joinExchangeReuse(s: SparkSession, d: String): DataFrame = {
    val t = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val frequent = t.where(col("n") >= 10)
      .select(col("o_custkey"), lit("frequent").as("segment"),
        col("n"), col("cents"))
    val big = t.where(col("cents") >= 500000000L)
      .select(col("o_custkey"), lit("big").as("segment"),
        col("n"), col("cents"))
    frequent.unionByName(big)
  }

  def joinSalted(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val salts = 8
    val dim = Seq(
      ("click", 1.0), ("view", 0.5), ("purchase", 10.0),
      ("signup", 5.0), ("error", 0.0)
    ).toDF("etype", "weight")
      .withColumn("salt", explode(lit((0 until salts).toArray)))
    val fact = Tables.events(s, d)
      .withColumn("salt", (col("event_id") % salts).cast("int"))
    fact.hint("shuffle_hash")
      .join(dim, fact("event_type") === dim("etype")
        && fact("salt") === dim("salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value") * col("weight")), 4).as("weighted_value"))
  }

  /** Blocked fuzzy join (entity resolution): probe records are
    * deterministic 1-char mutations of every 200th part name; candidates
    * pair ONLY within a blocking key (chars 2-11, invariant under the
    * mutation), then an edit-distance verify keeps pairs at
    * levenshtein ≤ 2. The 100 TB shape: blocking turns an all-pairs
    * string comparison into an equi-join on a short key, and the O(n·m)
    * distance computation runs only on in-block candidates — same
    * block-then-verify discipline as the MinHash/SimHash dedup family,
    * applied to string identity instead of set similarity. */
  def joinFuzzy(s: SparkSession, d: String): DataFrame = {
    // custom optimizer rule: levenshtein <= k predicates get an implied
    // abs(length diff) <= k pre-filter (graft.plans.LevenshteinGuard)
    graft.GraftExtensions.installOptimizations(s)
    val parts = Tables.part(s, d).select(col("p_partkey"), col("p_name"))
    val probes = parts.where(pmod(col("p_partkey"), lit(200)) === 0)
      .select((col("p_partkey") + 1000000L).as("probe_id"),
        concat(lit("x"), expr("substring(p_name, 2)")).as("probe_name"))
    parts.withColumn("bk", substring(col("p_name"), 2, 10))
      .join(probes.withColumn("bk", substring(col("probe_name"), 2, 10)), "bk")
      .where(levenshtein(col("p_name"), col("probe_name")) <= 2)
      .select(col("probe_id"), col("p_partkey"), col("p_name"),
        levenshtein(col("p_name"), col("probe_name")).cast("long").as("dist"))
  }

  /** Macro query (TPC-H Q5 shape): local-supplier revenue per nation —
    * 6-table star join with selective filters, exercising the whole
    * stack in one plan. Shape at scale: lineitem⋈orders⋈customer are the
    * big shuffles (AQE-planned); supplier/nation/region are explicit
    * broadcasts; the region + date filters push into the scans; the
    * final aggregate is 25 rows. The c_nationkey = s_nationkey equality
    * ("local supplier") is a residual condition on the supplier probe. */
  def q5StarJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1998-01-01"))
    val c = Tables.customer(s, d)
    val su = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).where(col("r_name").isin("ASIA", "EUROPE"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(su), li("l_suppkey") === su("s_suppkey")
        && c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Macro query (TPC-H Q3 shape): unshipped-order revenue priority —
    * segment-filtered customers ⋈ open orders ⋈ late-shipping lineitems,
    * top-10 orders by revenue. The ranking key is EXACT-INTEGER CENTS
    * (round(price·100) · (100 − round(disc·100)) summed as BIGINT), so
    * the top-10 cut is the same row set in both engines — ranking on a
    * float sum is exactly where cross-engine accumulation drift flips
    * adjacent ranks (SURVEY §5.4). Scale shape: both selective filters
    * push to their scans; customer⋈orders shuffles on custkey, the
    * result ⋈lineitem on orderkey (AQE picks broadcast at fixture sizes,
    * shuffle at 100 TB where no side fits); the top-10 runs as
    * TakeOrderedAndProject — per-partition heaps, K rows to the driver,
    * never a global sort. */
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cents =
      (expr("cast(round(l_extendedprice * 100) as bigint)")
        * (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
    val c = Tables.customer(s, d)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = Tables.lineitem(s, d)
      .where(col("l_shipdate") > lit("1998-01-01"))
      .select(col("l_orderkey"), cents.as("cents"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("cents")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey").asc)
      .limit(10)
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        col("revenue_cents"),
        round(col("revenue_cents") / lit(10000.0), 4).as("revenue"))
  }

  /** Macro query (TPC-H Q10 shape): customers ranked by revenue lost to
    * returned items in one order-year — lineitem(R) ⋈ orders(window) ⋈
    * customer ⋈ nation, top-20 customers. Same exact-cents ranking rule
    * as q3; nation broadcasts (25 rows at any scale), the fact joins
    * shuffle on orderkey then custkey. The output carries the raw
    * c_acctbal group key untouched — group keys never accumulate, so
    * floats are safe there. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame = {
    val cents =
      (expr("cast(round(l_extendedprice * 100) as bigint)")
        * (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
    val li = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
      .select(col("l_orderkey"), cents.as("cents"))
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1997-01-01")
        && col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_acctbal"))
      .agg(sum(col("cents")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey").asc)
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_acctbal"), col("revenue_cents"),
        round(col("revenue_cents") / lit(10000.0), 4).as("revenue"))
  }

  /** Macro query (TPC-H Q18 shape): large-volume orders — the
    * AGGREGATE-THEN-JOIN pattern q3/q5/q10 don't exercise: lineitem
    * first collapses to per-order quantity totals (map-side partial
    * aggregation does most of the work before the one shuffle), the
    * selective HAVING (> 300) leaves a tiny key set, and AQE observes
    * that at runtime and flips the orders/customer probes to broadcast
    * joins — the plan adapts to the aggregate's selectivity, which no
    * static planner knows in advance. Quantities are integer-valued
    * doubles; their sum is exact in IEEE double at any accumulation
    * order, and the BIGINT cast makes ranking engine-identical. */
  def q18BigOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
      .where(col("total_qty") > 300)
    big.join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .orderBy(col("total_qty").desc, col("o_orderkey").asc)
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty"))
  }

  /** Macro query (TPC-H Q7 shape): bilateral shipping volume between
    * two nations by year — the SELF-JOINED DIMENSION pattern the other
    * headliners don't exercise: nation joins the pipeline TWICE (once
    * through supplier, once through customer), and the disjunctive
    * nation-pair predicate can only be evaluated after both arms are
    * bound. Plan shape that matters at 100 TB: the l_shipdate range is
    * the only fact-side filter and must reach the parquet scan; both
    * nation arms broadcast (25 rows each — the classic tiny-dim ×2);
    * supplier broadcasts too; the real shuffle is lineitem⋈orders.
    * Revenue stays exact BIGINT cents·(100−disc) like q3/q10, and the
    * year bucket is integer year(l_shipdate) — both engines bucket and
    * sum identically, no float crosses a row boundary. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val (na, nb) = ("NATION_3", "NATION_7")
    val cents =
      (expr("cast(round(l_extendedprice * 100) as bigint)")
        * (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
    val li = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"), cents.as("cents"))
    // each arm pre-filters to the two nations (implied by the pair
    // disjunction, so output-invariant): ~92% of suppliers drop before
    // the fact join, so the lineitem⋈orders shuffle carries only
    // candidate rows — the final disjunction then only rejects the
    // same-nation combinations
    val pair = Tables.nation(s, d).where(col("n_name").isin(na, nb))
    val sn = Tables.supplier(s, d)
      .join(broadcast(pair), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cn = Tables.customer(s, d)
      .join(broadcast(pair), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    li.join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cn, col("o_custkey") === col("c_custkey"))
      .where((col("supp_nation") === na && col("cust_nation") === nb)
        || (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("revenue_cents"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        col("n_lines"), col("revenue_cents"),
        round(col("revenue_cents") / lit(10000.0), 4).as("revenue"))
  }

  /** Macro query (TPC-H Q19 shape): discounted revenue under a
    * DISJUNCTION OF CONJUNCTIONS spanning both join sides — the
    * predicate shape the other headliners don't exercise: each OR arm
    * constrains part attributes (brand, size) AND a lineitem attribute
    * (quantity), so no single-table filter implies the whole predicate
    * and the residual OR can only evaluate after the join binds both
    * sides. The plan move that matters at 100 TB: the per-arm ranges
    * have a computable HULL (brand ∈ {1,2,3}, size ≤ 15, qty ≤ 30 —
    * each implied by the disjunction, so output-invariant), and pushing
    * those hulls to the scans manually shrinks both join inputs ~20×
    * before a single row crosses the shuffle — Catalyst's CNF
    * conversion extracts single-side conjuncts but not cross-column
    * range hulls, so the hull is written explicitly (the same move a
    * CBO makes from column stats). The filtered part side is dim-sized
    * and broadcasts; revenue stays exact BIGINT cents·(100−disc). */
  def q19Disjunctive(s: SparkSession, d: String): DataFrame = {
    val cents =
      (expr("cast(round(l_extendedprice * 100) as bigint)")
        * (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
    val li = Tables.lineitem(s, d)
      .where(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select(col("l_partkey"), col("l_quantity"), cents.as("cents"))
    val p = Tables.part(s, d)
      .where(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        && col("p_size").between(1, 15))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11))
        || (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
          && col("l_quantity").between(10, 20))
        || (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
          && col("l_quantity").between(20, 30)))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("revenue_cents"))
      .select(col("p_brand"), col("n_lines"), col("revenue_cents"),
        round(col("revenue_cents") / lit(10000.0), 4).as("revenue"))
  }

  /** INTERVAL-OVERLAP join — the two-interval-set pattern the matrix
    * still lacked (join_range probes a POINT into intervals, join_pit a
    * point into versioned history; here BOTH sides are intervals):
    * user activity sessions (the ts_sessionize build) against daily
    * 08:00–12:00 maintenance windows derived from the event span,
    * overlapping when ws ≤ se AND ss < we, scored by exact overlap
    * seconds. The naive plan is a BNLJ over sessions × windows; the
    * scale plan — used here and plan-asserted — is DAY BUCKETING: each
    * session explodes into the calendar days it spans (sessions are
    * gap-bounded, so the fan-out is 1–2 rows), windows key by their
    * day, and the join is an EQUI-join on the day bucket with the
    * overlap predicate as a residual filter. Each true pair is found
    * exactly once (a window lives in one bucket). Per day: overlap
    * count, distinct users, exact overlap-second mass.
    *
    * At 100 TB the bucket key keeps the shuffle keyed and skew-safe
    * (day buckets ≈ uniform under steady traffic); wider intervals
    * bucket at coarser granularity with the identical shape. */
  def joinIntervalOverlap(s: SparkSession, d: String): DataFrame = {
    val sessions = Analytics.tsSessionize(s, d)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("ss"),
        unix_micros(col("session_end")).as("se"))
    val span = Tables.events(s, d).agg(
      date_trunc("DAY", min(col("ts"))).as("d0"),
      date_trunc("DAY", max(col("ts"))).as("d1"))
    val wins = span
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .select(col("day"),
        (unix_micros(col("day")) + lit(8L * 3600 * 1000000L)).as("ws"),
        (unix_micros(col("day")) + lit(12L * 3600 * 1000000L)).as("we"))
    val sd = sessions.withColumn("day", explode(expr(
      """sequence(date_trunc('DAY', timestamp_micros(ss)),
        |         date_trunc('DAY', timestamp_micros(se)),
        |         interval 1 day)""".stripMargin)))
    sd.join(wins, "day")
      .where(col("ws") <= col("se") && col("ss") < col("we"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_overlaps"),
        countDistinct(col("user_id")).as("n_users"),
        sum(expr("(least(se, we) - greatest(ss, ws)) div 1000000"))
          .as("overlap_sec_mass"),
        min(col("user_id")).as("example_user"))
  }

  /** Runtime bloom-filter injection (InjectRuntimeFilter): a selective
    * dim-side predicate is turned into a bloom filter evaluated on the
    * FACT side's scan, discarding non-joining fact rows before the
    * shuffle — at 100 TB this is the difference between shuffling the
    * whole fact table and shuffling the joining fraction. Spark only
    * injects for shuffle joins over scans past a size threshold, so the
    * query runs on a derived session with the application-side threshold
    * dropped and auto-broadcast off (fixtures are MBs, production
    * defaults are GBs — InjectRuntimeFilter only benefits joins it
    * predicts will shuffle, and a fixture-sized dim is always
    * broadcastable). Plan-asserted in JoinsSpec (`might_contain` on the
    * fact scan's filter). */
  def joinRuntimeFilter(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dim = Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    Tables.lineitem(s, d)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"))
  }

  /** Point-in-time (SCD-2 lookup) join — the warehouse temporal macro
    * shape: each fact row joins the dimension VERSION that was valid at
    * the fact's own timestamp (equi-key + half-open validity-interval
    * residual). Here orders probe the SCD-2 dimension built from the
    * same change stream (Analytics.dimScd2's window build), which gives
    * the audit sharp invariants: intervals per customer partition the
    * timeline from the first change (half-open [from, to), zero-width
    * for same-date duplicates, NULL-open current), so EVERY fact matches
    * exactly one version, and a fact whose matched version is its own
    * change row is detectable by key equality. All audit columns are
    * exact integers (cents before the sum).
    *
    * Scale shape: a plain hash/sort-merge join on the dimension KEY with
    * the interval predicate as a residual filter — never a range-only
    * BNLJ; at 100 TB the dimension persists bucketed by key (dim_scd2's
    * documented layout) so probes are shuffle-free on the fact side's
    * co-partitioning, and hot keys are the same skew the salted-join
    * pattern handles. The window build is one pass (no self-join). */
  def joinPit(s: SparkSession, d: String): DataFrame = {
    val dim = Analytics.dimScd2(s, d)
      .select(col("o_custkey"), col("version"),
        col("o_orderkey").as("ver_key"), col("attr_price"),
        col("valid_from"), col("valid_to"))
    val facts = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    facts.join(dim, Seq("o_custkey"))
      .where(col("o_orderdate") >= col("valid_from") &&
        (col("valid_to").isNull || col("o_orderdate") < col("valid_to")))
      .agg(
        count(lit(1)).as("n_matched"),
        countDistinct(col("o_orderkey")).as("n_facts_matched"),
        sum(when(col("ver_key") === col("o_orderkey"), 1L).otherwise(0L))
          .as("n_self_version"),
        countDistinct(col("o_custkey"), col("version"))
          .as("n_versions_used"),
        sum(round(col("attr_price") * 100, 0).cast("long")).as("attr_cents"))
  }

  /** A point-in-interval join written the way a USER writes it — plain
    * BETWEEN, no bucketing discipline — and rescued by
    * [[graft.plans.RangeBucketRewrite]] (the exact sibling of the LSH
    * rescues): with the opt-in flag the optimizer explodes the interval
    * side into its covered bucket ids and injects the `x div W = bucket`
    * equi key, keeping the original range predicate as the residual
    * filter, so the registered plan is the bucketed equi-join
    * join_interval_overlap hand-writes — same rows, exactly (the
    * rewrite loses nothing: truncating division is monotone, so every
    * qualifying pair meets in the bucket containing x). Intervals are a
    * ~1 % order slice carrying a 400-wide id window each; points are
    * the event ids. Derived session for the same isolation reason as
    * lshAutoRewrite (the flag + rule must not leak into other ops'
    * plans). CustomSurfaceSpec asserts the rescued plan (equi-join +
    * explode, no BNLJ) and flag-on/flag-off row equivalence. */
  def joinRangeAutorewrite(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      s0.conf.get("spark.sql.shuffle.partitions"))
    graft.GraftExtensions.installOptimizations(s)
    s.conf.set(graft.plans.RangeBucketRewrite.Flag, "true")
    s.conf.set(graft.plans.RangeBucketRewrite.WidthConf, "256")
    val pts = Tables.events(s, d).select(col("event_id"), col("user_id"))
    val iv = Tables.orders(s, d).where(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"),
        (col("o_orderkey") * 3 % 9000).as("lo"),
        (col("o_orderkey") * 3 % 9000 + 400).as("hi"))
    pts.join(iv,
        col("event_id") >= col("lo") && col("event_id") <= col("hi"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("event_id")).cast("bigint").as("id_sum"))
  }

  /** Grid-bucketed SPATIAL radius self-join — the distributed spatial
    * primitive (geo neighbor search, embedding-2D-projection blocking,
    * collision detection): all point pairs within distance R, found by
    * cell binning instead of the O(N²) distance cross join. Points live
    * on a deterministic 10⁴×10⁴ integer lattice derived from customer
    * keys (two coprime multipliers mod 10⁴ — replayable in any engine,
    * no trig/floats anywhere); cell = (x div R, y div R), so any pair
    * within R is at most one cell apart per axis. The LEFT side
    * explodes each point into its 3×3 cell neighborhood, the RIGHT side
    * keys on its OWN cell — every qualifying pair meets exactly once
    * (the right point's cell is unique), so no dedup step exists; the
    * exact dx²+dy² ≤ R² residual filters inside the equi-join. This is
    * the standard spatial-bin join every distributed geo engine
    * (Sedona/PostGIS-on-Spark) plans: shuffle is keyed on cells (~9×
    * point mass, never pairs), per-cell work is local density², and a
    * skewed hot cell would AQE-split like any hash join. Output: per
    * point its neighbor count and exact squared-distance checksum —
    * bounded by point count. */
  /** Shared (id, rid, d2) within-R candidate pairs for the spatial
    * family (radius audit + kNN): the 3×3 cell-neighborhood explode
    * keying an equi-join, exact residual inside. */
  /** The deterministic 10⁴×10⁴ integer point lattice shared by the
    * spatial family: salted multiply-xor-shift mix (murmur-style
    * finalizer, exact in BIGINT: 2³²·1540483477 < 2⁶³) — a plain
    * LCG-mod lattice is NOT uniform enough here (its short lattice
    * vectors cluster points on lines and inflate close pairs ~100×,
    * measured); coordinates must scatter for the cell-density argument
    * to hold. */
  private def spatialPoints(s: SparkSession, d: String): DataFrame = {
    def coord(salt: Int): Column = {
      val h0 = s"(c_custkey * 2654435761 + $salt) % 4294967296"
      val h1 = s"(($h0) ^ shiftright($h0, 16))"
      val h2 = s"(($h1) * 1540483477) % 4294967296"
      expr(s"(($h2) ^ shiftright($h2, 13)) % 10000")
    }
    Tables.customer(s, d).select(
      col("c_custkey").as("id"), coord(17).as("x"), coord(91).as("y"))
  }

  private def spatialPairs(s: SparkSession, d: String): DataFrame = {
    val R = 200
    val pts = spatialPoints(s, d)
    val right = pts.select(
      col("id").as("rid"), col("x").as("rx"), col("y").as("ry"),
      concat_ws(":", expr(s"x DIV $R"), expr(s"y DIV $R")).as("cell"))
    val left9 = pts
      .withColumn("dxy", explode(lit((for (dx <- -1 to 1; dy <- -1 to 1)
        yield s"$dx:$dy").toArray)))
      .select(col("id"), col("x"), col("y"),
        concat_ws(":",
          expr(s"x DIV $R") + split(col("dxy"), ":")(0).cast("long"),
          expr(s"y DIV $R") + split(col("dxy"), ":")(1).cast("long"))
          .as("cell"))
    left9.join(right, "cell")
      .where(col("id") =!= col("rid") &&
        (col("x") - col("rx")) * (col("x") - col("rx"))
          + (col("y") - col("ry")) * (col("y") - col("ry")) <= lit(R * R))
      .select(col("id"), col("rid"),
        ((col("x") - col("rx")) * (col("x") - col("rx"))
          + (col("y") - col("ry")) * (col("y") - col("ry"))).as("d2"))
  }

  def joinSpatialRadius(s: SparkSession, d: String): DataFrame =
    spatialPairs(s, d)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_nb"),
        sum(col("d2")).cast("bigint").as("sum_d2"),
        min(col("rid")).cast("bigint").as("min_nb_id"))

  /** k-NEAREST-NEIGHBORS within radius R per point — the retrieval face
    * of the spatial family (nearest stores/sensors/neighbors queries):
    * rank the cell-binned candidate pairs per point by (distance, id)
    * and keep the top 3. The rank-≤-k window over the id-partitioned
    * pair set plans as WindowGroupLimit (k rows kept per map task
    * BEFORE the shuffle), so the exchange carries ≤ k·partitions rows
    * per point — candidate generation stays the radius join's
    * cell-density-bounded equi-join, never an all-pairs kNN. Points
    * with no neighbor inside R simply emit no rows (production pairs
    * this with an expanding-ring retry for isolated points). */
  def joinSpatialKnn(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("d2").asc, col("rid").asc)
    spatialPairs(s, d)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("id"), col("rank"), col("rid").as("nb_id"), col("d2"))
  }

  /** The NAIVE spelling of the radius join — a theta self-join on the
    * squared-distance predicate, exactly what a user writes before
    * learning grid binning — rescued by [[graft.plans.SpatialGridRewrite]]
    * into the 3×3 cell equi-join `joinSpatialRadius` hand-writes. The
    * rewrite is EXACT (floor-division cells + the original predicate as
    * residual), so this registers against the same naive-predicate
    * oracle; CustomSurfaceSpec asserts the rewritten plan carries no
    * CartesianProduct/BNLJ and row-matches the hand-written op. Runs on
    * a derived session so the opt-in flag never leaks to other ops. */
  def joinSpatialAutorewrite(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      s0.conf.get("spark.sql.shuffle.partitions"))
    graft.GraftExtensions.installOptimizations(s)
    s.conf.set(graft.plans.SpatialGridRewrite.Flag, "true")
    val pts = spatialPoints(s, d)
    val b = pts.select(col("id").as("rid"), col("x").as("rx"),
      col("y").as("ry"))
    val d2 = (col("x") - col("rx")) * (col("x") - col("rx")) +
      (col("y") - col("ry")) * (col("y") - col("ry"))
    pts.join(b, col("id") =!= col("rid") && d2 <= lit(40000L))
      .select(col("id"), col("rid"), d2.as("d2"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_nb"),
        sum(col("d2")).cast("bigint").as("sum_d2"),
        min(col("rid")).cast("bigint").as("min_nb_id"))
  }

  /** COST-BASED join reordering — the optimizer decision the whole
    * stats machinery exists to feed: the query is WRITTEN in the worst
    * order (fact ⋈ fact first: lineitem ⋈ orders builds the big-big
    * intermediate, then meets the 99-customer dimension), and with the
    * tables ANALYZEd (row counts + column min/max/NDV in the catalog)
    * and `spark.sql.cbo.joinReorder.enabled=true` Catalyst re-derives
    * the star order — filtered customers first, pruning orders to ~1 %
    * before the fact table is touched. Syntactic order is what users
    * write; at 100 TB the difference is a corpus-sized shuffle vs a
    * broadcast. Catalog tables are EXTERNAL (LOCATION = the read-only
    * fixture parquet; stats live in the in-memory catalog, no FS
    * writes), staged once per (dir) under a lock. CustomSurfaceSpec
    * asserts the innermost join with CBO on is orders ⋈ customer (and
    * lineitem ⋈ orders with it off) with identical rows either way.
    * Reorder changes plan shape, never results: plain-SQL oracle. */
  def joinCboReorder(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      s0.conf.get("spark.sql.shuffle.partitions"))
    val sfx = d.replaceAll("[^A-Za-z0-9]", "_") + "_" + math.abs(d.hashCode)
    val (li, ord, cust) =
      (s"graft_cbo_li_$sfx", s"graft_cbo_ord_$sfx", s"graft_cbo_cust_$sfx")
    // the catalog is SharedState-wide: stage once per (JVM, dir)
    cboLock.synchronized {
      if (!s.catalog.tableExists(li)) {
        s.sql(s"CREATE TABLE $li USING parquet LOCATION '$d/lineitem.parquet'")
        s.sql(s"CREATE TABLE $ord USING parquet LOCATION '$d/orders.parquet'")
        s.sql(
          s"CREATE TABLE $cust USING parquet LOCATION '$d/customer.parquet'")
        s.sql(s"ANALYZE TABLE $li COMPUTE STATISTICS FOR COLUMNS l_orderkey")
        s.sql(s"ANALYZE TABLE $ord COMPUTE STATISTICS " +
          "FOR COLUMNS o_orderkey, o_custkey")
        s.sql(s"ANALYZE TABLE $cust COMPUTE STATISTICS FOR COLUMNS c_custkey")
      }
    }
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.sql(
      s"""SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         |  round(sum(l.l_extendedprice), 4) AS revenue
         |FROM $li l
         |JOIN $ord o ON l.l_orderkey = o.o_orderkey
         |JOIN $cust c ON o.o_custkey = c.c_custkey
         |WHERE c.c_custkey < 100
         |GROUP BY o.o_orderpriority""".stripMargin)
  }
  private val cboLock = new Object

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_cbo_reorder" -> joinCboReorder _,
    "join_aggpush_autorewrite" -> joinAggpushAutorewrite _,
    "join_spatial_radius" -> joinSpatialRadius _,
    "join_spatial_autorewrite" -> joinSpatialAutorewrite _,
    "join_spatial_knn" -> joinSpatialKnn _,
    "join_range_autorewrite" -> joinRangeAutorewrite _,
    "join_pit" -> joinPit _,
    "join_runtime_filter" -> joinRuntimeFilter _,
    "q5_star_join" -> q5StarJoin _,
    "q3_shipping_priority" -> q3ShippingPriority _,
    "q7_volume_shipping" -> q7VolumeShipping _,
    "q19_disjunctive" -> q19Disjunctive _,
    "join_interval_overlap" -> joinIntervalOverlap _,
    "q10_returned_items" -> q10ReturnedItems _,
    "q18_big_orders" -> q18BigOrders _,
    "join_fuzzy" -> joinFuzzy _,
    "join_dpp" -> joinDpp _,
    "join_salted" -> joinSalted _,
    "join_skew_aqe" -> joinSkewAqe _,
    "join_exchange_reuse" -> joinExchangeReuse _,
    "join_broadcast_aqe" -> joinBroadcastAqe _,
    "join_eliminate_autorewrite" -> joinEliminateAutorewrite _,
    "agg_distinct_autorewrite" -> aggDistinctAutorewrite _,
    "join_bucketed" -> joinBucketed _,
    "join_asof" -> joinAsof _,
    "join_asof_forward" -> joinAsofForward _,
    "join_asof_tolerance" -> joinAsofTolerance _,
    "join_inner_hash" -> joinInnerHash _,
    "join_broadcast" -> joinBroadcast _,
    "join_sort_merge" -> joinSortMerge _,
    "join_left" -> joinLeft _,
    "join_right" -> joinRight _,
    "join_full" -> joinFull _,
    "join_left_semi" -> joinLeftSemi _,
    "join_left_anti" -> joinLeftAnti _,
    "join_theta" -> joinTheta _,
    "join_nullsafe" -> joinNullSafe _,
    "join_lateral" -> joinLateral _,
    "join_cross" -> joinCross _,
    "join_range" -> joinRange _
  )

  /** Shared by join_spatial_radius and its autorewrite rescue: both
    * compute the identical result, one by hand-written binning, one by
    * the optimizer rule over the naive spelling. */
  private val spatialRadiusOracleSql: String =
    """WITH h0 AS (
      |  SELECT c_custkey AS id,
      |    (c_custkey * 2654435761 + 17) % 4294967296 AS hx,
      |    (c_custkey * 2654435761 + 91) % 4294967296 AS hy
      |  FROM customer),
      |h1 AS (
      |  SELECT id, xor(hx, hx >> 16) AS hx, xor(hy, hy >> 16) AS hy
      |  FROM h0),
      |h2 AS (
      |  SELECT id, (hx * 1540483477) % 4294967296 AS hx,
      |    (hy * 1540483477) % 4294967296 AS hy
      |  FROM h1),
      |pts AS (
      |  SELECT id, xor(hx, hx >> 13) % 10000 AS x,
      |    xor(hy, hy >> 13) % 10000 AS y
      |  FROM h2)
      |SELECT a.id, CAST(count(*) AS BIGINT) AS n_nb,
      |  CAST(sum((a.x - b.x) * (a.x - b.x)
      |         + (a.y - b.y) * (a.y - b.y)) AS BIGINT) AS sum_d2,
      |  CAST(min(b.id) AS BIGINT) AS min_nb_id
      |FROM pts a JOIN pts b
      |  ON b.x BETWEEN a.x - 200 AND a.x + 200
      | AND b.y BETWEEN a.y - 200 AND a.y + 200
      | AND a.id != b.id
      | AND (a.x - b.x) * (a.x - b.x)
      |   + (a.y - b.y) * (a.y - b.y) <= 40000
      |GROUP BY a.id""".stripMargin

  def oracle: Map[String, String] = Map(
    // reorder changes plan shape, never results
    "join_aggpush_autorewrite" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents_min,
        |  CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents_max,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT))::DOUBLE
        |    / count(*)::DOUBLE AS cents_avg
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin,
    "join_cbo_reorder" ->
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l.l_extendedprice), 4) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey < 100
        |GROUP BY o.o_orderpriority""".stripMargin,
    // same naive-predicate replay, ranked per point by (d2, id)
    "join_spatial_knn" ->
      """WITH h0 AS (
        |  SELECT c_custkey AS id,
        |    (c_custkey * 2654435761 + 17) % 4294967296 AS hx,
        |    (c_custkey * 2654435761 + 91) % 4294967296 AS hy
        |  FROM customer),
        |h1 AS (
        |  SELECT id, xor(hx, hx >> 16) AS hx, xor(hy, hy >> 16) AS hy
        |  FROM h0),
        |h2 AS (
        |  SELECT id, (hx * 1540483477) % 4294967296 AS hx,
        |    (hy * 1540483477) % 4294967296 AS hy
        |  FROM h1),
        |pts AS (
        |  SELECT id, xor(hx, hx >> 13) % 10000 AS x,
        |    xor(hy, hy >> 13) % 10000 AS y
        |  FROM h2),
        |pr AS (
        |  SELECT a.id, b.id AS nb_id,
        |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        |  FROM pts a JOIN pts b
        |    ON b.x BETWEEN a.x - 200 AND a.x + 200
        |   AND b.y BETWEEN a.y - 200 AND a.y + 200
        |   AND a.id != b.id
        |   AND (a.x - b.x) * (a.x - b.x)
        |     + (a.y - b.y) * (a.y - b.y) <= 40000)
        |SELECT id, rank, nb_id, d2 FROM (
        |  SELECT id, nb_id, d2,
        |    row_number() OVER (PARTITION BY id
        |      ORDER BY d2 ASC, nb_id ASC) AS rank
        |  FROM pr) WHERE rank <= 3""".stripMargin,
    // the grid rescue is exact: same naive-predicate oracle as the
    // hand-written binned op it rewrites into
    "join_spatial_autorewrite" -> spatialRadiusOracleSql,
    // the binning reshapes cost, never results: the oracle is the naive
    // distance predicate itself (DuckDB plans the cell-band condition
    // as its native IEJoin); integer lattice, no floats
    "join_spatial_radius" -> spatialRadiusOracleSql,
    // the rewrite reshapes cost, never results: the oracle is the naive
    // range join itself (DuckDB plans it as its native IEJoin)
    "join_range_autorewrite" ->
      """WITH iv AS (
        |  SELECT o_orderkey,
        |    (o_orderkey * 3) % 9000 AS lo,
        |    (o_orderkey * 3) % 9000 + 400 AS hi
        |  FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT iv.o_orderkey,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(e.event_id) AS BIGINT) AS id_sum
        |FROM events e JOIN iv
        |  ON e.event_id >= iv.lo AND e.event_id <= iv.hi
        |GROUP BY iv.o_orderkey""".stripMargin,
    // same window build as dim_scd2, then the equi+interval join and an
    // exact-integer audit
    "join_pit" ->
      """WITH dim AS (
        |  SELECT o_custkey, row_number() OVER w AS version,
        |         o_orderkey AS ver_key, o_totalprice AS attr_price,
        |         o_orderdate AS valid_from,
        |         lead(o_orderdate, 1) OVER w AS valid_to
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey)),
        |j AS (
        |  SELECT f.o_orderkey, f.o_custkey, d.version, d.ver_key,
        |         d.attr_price
        |  FROM orders f JOIN dim d
        |    ON d.o_custkey = f.o_custkey
        |   AND f.o_orderdate >= d.valid_from
        |   AND (d.valid_to IS NULL OR f.o_orderdate < d.valid_to))
        |SELECT CAST(count(*) AS BIGINT) AS n_matched,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_facts_matched,
        |  CAST(sum(CASE WHEN ver_key = o_orderkey THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_self_version,
        |  CAST(count(DISTINCT (o_custkey, version)) AS BIGINT)
        |    AS n_versions_used,
        |  CAST(sum(CAST(round(attr_price * 100) AS BIGINT)) AS BIGINT)
        |    AS attr_cents
        |FROM j""".stripMargin,
    "join_fuzzy" ->
      """WITH parts AS (SELECT p_partkey, p_name FROM part),
        |probes AS (
        |  SELECT p_partkey + 1000000 AS probe_id,
        |         'x' || substring(p_name, 2) AS probe_name
        |  FROM parts WHERE p_partkey % 200 = 0)
        |SELECT probe_id, p_partkey, p_name,
        |       levenshtein(p_name, probe_name) AS dist
        |FROM parts JOIN probes
        |  ON substring(p_name, 2, 10) = substring(probe_name, 2, 10)
        |WHERE levenshtein(p_name, probe_name) <= 2""".stripMargin,
    "join_runtime_filter" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        | round(sum(l_extendedprice), 4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority""".stripMargin,
    "q7_volume_shipping" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    year(l_shipdate) AS l_year,
        |    CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'),
        |sn AS (
        |  SELECT s_suppkey, n_name AS supp_nation
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_3', 'NATION_7')),
        |cn AS (
        |  SELECT c_custkey, n_name AS cust_nation
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_3', 'NATION_7'))
        |SELECT supp_nation, cust_nation, l_year,
        |  count(*) AS n_lines,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents,
        |  round(CAST(sum(cents) AS BIGINT) / 10000.0, 4) AS revenue
        |FROM li
        |JOIN sn ON li.l_suppkey = sn.s_suppkey
        |JOIN orders ON li.l_orderkey = o_orderkey
        |JOIN cn ON o_custkey = cn.c_custkey
        |WHERE (supp_nation = 'NATION_3' AND cust_nation = 'NATION_7')
        |   OR (supp_nation = 'NATION_7' AND cust_nation = 'NATION_3')
        |GROUP BY supp_nation, cust_nation, l_year""".stripMargin,
    // sessionize build shared with the ts_sessionize oracle; day
    // buckets replayed declaratively; date_trunc pinned ::TIMESTAMP
    // (DuckDB's day-trunc yields DATE, Spark's TIMESTAMP)
    "join_interval_overlap" ->
      """WITH ev AS (
        |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |         user_id, event_type, value
        |  FROM events),
        |se AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus,
        |         CASE WHEN lag(tus0) OVER w IS NULL
        |                OR tus0 - lag(tus0) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM (SELECT *, epoch_us(ts) AS tus0 FROM ev)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sid AS (
        |  SELECT user_id, tus,
        |         sum(brk) OVER (PARTITION BY user_id
        |                        ORDER BY tus, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND CURRENT ROW) AS session_id
        |  FROM se),
        |sess AS (
        |  SELECT user_id, min(tus) AS ss, max(tus) AS se
        |  FROM sid GROUP BY user_id, session_id),
        |span AS (
        |  SELECT date_trunc('day', min(ts))::TIMESTAMP AS d0,
        |         date_trunc('day', max(ts))::TIMESTAMP AS d1
        |  FROM ev),
        |wins AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |  FROM span),
        |wb AS (
        |  SELECT day, epoch_us(day) + 28800000000 AS ws,
        |         epoch_us(day) + 43200000000 AS we
        |  FROM wins),
        |sd AS (
        |  SELECT user_id, ss, se,
        |    unnest(generate_series(
        |      date_trunc('day', make_timestamp(ss))::TIMESTAMP,
        |      date_trunc('day', make_timestamp(se))::TIMESTAMP,
        |      INTERVAL 1 DAY)) AS day
        |  FROM sess),
        |j AS (
        |  SELECT wb.day, sd.user_id,
        |    (least(se, we) - greatest(ss, ws)) // 1000000 AS osec
        |  FROM sd JOIN wb ON sd.day = wb.day
        |  WHERE ws <= se AND ss < we)
        |SELECT day, CAST(count(*) AS BIGINT) AS n_overlaps,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(osec) AS BIGINT) AS overlap_sec_mass,
        |  CAST(min(user_id) AS BIGINT) AS example_user
        |FROM j GROUP BY day""".stripMargin,
    "q19_disjunctive" ->
      """SELECT p_brand,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS revenue_cents,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS BIGINT) / 10000.0, 4) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY p_brand""".stripMargin,
    "q3_shipping_priority" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS cents
        |  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01')
        |SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents,
        |  round(CAST(sum(cents) AS BIGINT) / 10000.0, 4) AS revenue
        |FROM li
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_cents DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q10_returned_items" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS cents
        |  FROM lineitem WHERE l_returnflag = 'R')
        |SELECT c_custkey, c_name, n_name, c_acctbal,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents,
        |  round(CAST(sum(cents) AS BIGINT) / 10000.0, 4) AS revenue
        |FROM li
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue_cents DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(l_quantity) AS BIGINT) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
        |FROM big
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,
    "q5_star_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND r_name IN ('ASIA', 'EUROPE')
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "join_dpp" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        | round(avg(o_totalprice), 4) AS avg_price
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority""".stripMargin,
    "join_salted" ->
      """WITH ev AS (
        |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |         user_id, event_type, value
        |  FROM events),
        |dim(etype, weight) AS (VALUES
        |  ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
        |  ('signup', 5.0), ('error', 0.0))
        |SELECT event_type, count(*) AS n_events,
        |       round(sum(value * weight), 4) AS weighted_value
        |FROM ev JOIN dim ON event_type = etype
        |GROUP BY event_type""".stripMargin,
    // the AQE skew split changes the PLAN, never the rows: the oracle
    // replays the planted ×20000 hot-key replication and the plain join
    "join_skew_aqe" ->
      """WITH r AS (SELECT unnest(range(1, 20001)) AS i),
        |hot AS (
        |  SELECT l.l_orderkey, l.l_quantity,
        |    (r.i * 1000003) % 1000000007 AS pay
        |  FROM lineitem l, r WHERE l.l_orderkey = 1),
        |f AS (
        |  SELECT l_orderkey, l_quantity, 0::BIGINT AS pay
        |  FROM lineitem WHERE l_orderkey != 1
        |  UNION ALL SELECT * FROM hot)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(pay) AS BIGINT) AS sum_pay
        |FROM f JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin,
    // the de-dup the rule drops was a no-op by constraint — the oracle
    // replays the DISTINCT verbatim
    "agg_distinct_autorewrite" ->
      "SELECT DISTINCT c_custkey, c_nationkey FROM customer",
    // elimination is exact under the declared (and here actual)
    // constraints — the oracle REPLAYS THE JOIN the rule removed
    "join_eliminate_autorewrite" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    // runtime demotion changes the PLAN, never the rows: the plain
    // three-way join + rollup
    "join_broadcast_aqe" ->
      """WITH cbn AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |      AS bal_cents
        |  FROM customer GROUP BY 1)
        |SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(max(cbn.n_cust) AS BIGINT) AS n_cust,
        |  CAST(max(cbn.bal_cents) AS BIGINT) AS bal_cents
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN cbn ON c.c_nationkey = cbn.c_nationkey
        |GROUP BY 1""".stripMargin,
    // exchange reuse changes the PLAN (one shuffle, two consumers),
    // never the rows: the oracle replays both segment branches plainly
    "join_exchange_reuse" ->
      """WITH t AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1)
        |SELECT o_custkey, 'frequent' AS segment, n, cents FROM t
        |WHERE n >= 10
        |UNION ALL
        |SELECT o_custkey, 'big', n, cents FROM t
        |WHERE cents >= 500000000""".stripMargin,
    "join_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        | round(sum(l_extendedprice), 4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_asof" ->
      """WITH ev AS (
        |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |         user_id, event_type, value
        |  FROM events),
        |c AS (SELECT * FROM ev WHERE event_type = 'click'),
        |p AS (SELECT * FROM ev WHERE event_type = 'purchase')
        |SELECT c.user_id, c.event_id, c.ts,
        |       p.event_id AS matched_purchase,
        |       p.value AS purchase_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    // DuckDB's native ASOF with the inequality flipped — smallest
    // p.ts ≥ c.ts, the forward direction. ASOF pins the matched
    // TIMESTAMP deterministically but its row pick among same-µs
    // purchases is implementation-arbitrary (the join_asof_tolerance
    // precedent), so the matched event re-derives as MIN(event_id) at
    // that timestamp — the Spark following-frame first() rule (the
    // backward ops pin max; the forward tiebreak is ascending)
    "join_asof_forward" ->
      """WITH ev AS (
        |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |         user_id, event_type, value
        |  FROM events),
        |c AS (SELECT * FROM ev WHERE event_type = 'click'),
        |p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
        |m0 AS (
        |  SELECT c.user_id, c.event_id, c.ts, p.ts AS mts
        |  FROM c ASOF LEFT JOIN p
        |    ON c.user_id = p.user_id AND c.ts <= p.ts)
        |SELECT m0.user_id, m0.event_id, m0.ts,
        |       min(p2.event_id) AS next_purchase,
        |       min_by(p2.value, p2.event_id) AS next_value
        |FROM m0 LEFT JOIN p p2
        |  ON p2.user_id = m0.user_id AND p2.ts = m0.mts
        |GROUP BY m0.user_id, m0.event_id, m0.ts""".stripMargin,
    // DuckDB's native ASOF join + the exact µs gap filter — a stale
    // match nulls out but the click row survives (LEFT semantics).
    // ASOF pins the matched TIMESTAMP deterministically but its row
    // pick among same-µs purchases is implementation-arbitrary, so the
    // matched EVENT re-derives as max(event_id) at that timestamp —
    // the Spark window's (ts, is_left, event_id)-ordered last() rule
    "join_asof_tolerance" ->
      """WITH ev AS (
        |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |         user_id, event_type, value
        |  FROM events),
        |c AS (SELECT * FROM ev WHERE event_type = 'click'),
        |p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
        |m0 AS (
        |  SELECT c.user_id, c.event_id, c.ts, p.ts AS mts
        |  FROM c ASOF LEFT JOIN p
        |    ON c.user_id = p.user_id AND c.ts >= p.ts),
        |m AS (
        |  SELECT m0.user_id, m0.event_id, m0.ts, m0.mts,
        |         max(p2.event_id) AS mp
        |  FROM m0 LEFT JOIN p p2
        |    ON p2.user_id = m0.user_id AND p2.ts = m0.mts
        |  GROUP BY m0.user_id, m0.event_id, m0.ts, m0.mts),
        |g AS (
        |  SELECT *, CAST(epoch_us(ts) - epoch_us(mts) AS BIGINT) AS gap,
        |    (epoch_us(ts) - epoch_us(mts)) <= 86400000000 AS ok
        |  FROM m)
        |SELECT user_id, event_id, ts,
        |  CASE WHEN ok THEN mp END AS matched_purchase,
        |  CASE WHEN ok THEN gap END AS gap_us,
        |  coalesce(ok, false) AS within_tol
        |FROM g""".stripMargin,
    "join_inner_hash" ->
      """SELECT l_orderkey, l_linenumber, o_custkey, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "join_broadcast" ->
      """SELECT c_custkey, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "join_sort_merge" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
        | round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "join_left" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey""".stripMargin,
    "join_right" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "join_full" ->
      """WITH f AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
        |     o AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
        |SELECT coalesce(f.k, o.k) AS custkey,
        |       CASE WHEN f.k IS NOT NULL THEN 1 ELSE 0 END AS has_f,
        |       CASE WHEN o.k IS NOT NULL THEN 1 ELSE 0 END AS has_o
        |FROM f FULL JOIN o ON f.k = o.k""".stripMargin,
    "join_left_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "join_theta" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, o_totalprice
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_extendedprice > o_totalprice * 0.5""".stripMargin,
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "join_nullsafe" ->
      """WITH c AS (
        |  SELECT nullif(c_nationkey, 13) AS k, count(*) AS n_cust
        |  FROM customer GROUP BY 1),
        |s AS (
        |  SELECT nullif(s_nationkey, 13) AS k2, count(*) AS n_supp
        |  FROM supplier GROUP BY 1)
        |SELECT CAST(coalesce(k, -1) AS BIGINT) AS key_or_sentinel,
        |  k IS NULL AS nullsafe_only,
        |  CAST(n_cust AS BIGINT) AS n_cust,
        |  CAST(n_supp AS BIGINT) AS n_supp,
        |  CAST(n_cust * n_supp AS BIGINT) AS pair_mass
        |FROM c JOIN s ON k IS NOT DISTINCT FROM k2""".stripMargin,
    "join_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin,
    "join_range" ->
      """WITH bands(band_id, lo, hi) AS (VALUES
        |  (0, 0.0, 20.0), (1, 20.0, 40.0), (2, 40.0, 60.0),
        |  (3, 60.0, 80.0), (4, 80.0, 1e9))
        |SELECT band_id, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin
  )
}
