package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables

/** Event-time streaming operators (SURVEY.md §2.9), written as transforms
  * over a DataFrame so the SAME function runs in batch (on the `events`
  * fixture — DuckDB-checkable) and in Structured Streaming (MemoryStream
  * replay in StreamingSpec asserts the incremental/watermark behavior the
  * batch oracle cannot see). This is Structured Streaming's unified-model
  * guarantee: a streaming query's final result equals the batch query over
  * the stream's complete data.
  *
  * At-scale notes: every windowed aggregation here is keyed by
  * (window, event_type) or (session, user_id) — state is hash-partitioned
  * across executors by key, partial-aggregated map-side, and (in streaming
  * mode) bounded by the watermark: state for windows older than
  * watermark is evicted, so state size is O(active windows × keys), not
  * O(stream length). user_id is high-cardinality and well-spread; no
  * salting needed.
  */
object Streaming extends OpModule {

  /** Event row for typed stateful ops; ts is µs (see Tables.events). */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Per-user running aggregate carried in the state store. */
  case class UserAgg(n: Long, sum: Double, lastTs: Long)
  case class UserSummary(user_id: Long, n_events: Long, sum_value: Double,
                         last_epoch_s: Long)

  /** Boot the driver-side StateStoreCoordinator RPC endpoint before a
    * BATCH transformWithState runs. A streaming query creates it as part
    * of query startup, but batch TWS does not — RocksDB's async
    * snapshot-upload report then dies on
    * `RpcEndpointNotFoundException(StateStoreCoordinator)` and fails the
    * load (CANNOT_LOAD_STATE_STORE) in any session where no streaming
    * query happened to run first. forDriver is idempotent: it registers
    * the endpoint or returns a ref to the existing one. Every batch TWS
    * entry point calls this — correctness must not depend on registry
    * iteration order having scheduled a streaming op earlier. */
  private def ensureStateStoreCoordinator(spark: SparkSession): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get,
        spark.sessionState.conf)

  // ── transforms (batch ≡ streaming) ────────────────────────────────────

  /** Count-Min sketch over the LIVE stream (the streaming face of
    * agg_cms_freq): every event folds into one of d=4 × w=1024 cells
    * keyed by the affine-hashed user id, and because cell counts are
    * ADDITIVE the same groupBy is a valid streaming aggregation — cells
    * merge across micro-batches exactly as they merge across partitions
    * (StreamingSpec drives the real multi-batch stream and asserts the
    * final cells equal the batch cells over the union; that equality IS
    * the mergeability property that makes CMS the standard streaming
    * frequency summary: state is ≤4096 rows forever, never
    * O(distinct users)). The registered query adds the point-estimate
    * probe over the top-20 exact users — verification only; a
    * production consumer probes arbitrary ids against the live cells. */
  private val CmsP = 1000000007L
  private val CmsW = 1024L
  private val CmsA = Seq(920419823L, 658812311L, 500000003L, 193877777L)
  private val CmsB = Seq(7L, 13L, 31L, 71L)

  private def cmsBuckets(h: org.apache.spark.sql.Column) =
    array(CmsA.indices.map(j =>
      (((h % lit(CmsP)) * lit(CmsA(j)) + lit(CmsB(j))) % lit(CmsP))
        % lit(CmsW)): _*)

  /** The streaming-executable half: cells only (pure additive agg). */
  def cmsCells(ev: DataFrame): DataFrame =
    ev.select(posexplode(cmsBuckets(col("user_id"))).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("c"))

  /** Cells + the verification probe (batch; runs on the final cells). */
  def cmsEstimates(ev: DataFrame): DataFrame = {
    val cells = cmsCells(ev)
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id")).limit(20)
    exact.select(col("user_id"), col("exact_cnt"),
        posexplode(cmsBuckets(col("user_id"))).as(Seq("j", "bucket")))
      .join(broadcast(cells), Seq("j", "bucket"))
      .groupBy(col("user_id"), col("exact_cnt"))
      .agg(min(col("c")).as("est_cnt"))
  }

  /** Streaming quantiles under BOUNDED state — the streaming face of
    * agg_quantile_bucketed, as stream_cms is of agg_cms_freq: exact
    * order statistics need the data (the batch op's pass 2 re-reads the
    * target bucket), which a stream cannot re-read, so the streaming
    * answer is the bucket-resolution estimate from a fixed 512-cell
    * histogram (bounds fixed A PRIORI — a stream cannot pre-scan for
    * min/max; values clamp into the edge cells). The histogram is a
    * pure additive aggregate: micro-batch partials merge exactly
    * (complete-mode parity with the batch build is spec-asserted), and
    * state is ≤512 rows no matter how many events pass — the property
    * that makes a p99-latency dashboard safe to leave running for
    * months. Rank convention matches agg_quantile_bucketed
    * (k = ceil(q·n), quantile_disc's cume_dist rule), so the located
    * cell brackets the exact discrete quantile: v(k) ∈ [bucket,
    * bucket+1). */
  def quantileCells(ev: DataFrame): DataFrame =
    ev.groupBy(least(greatest(floor(col("value")), lit(0.0)), lit(511.0))
        .cast("int").as("b"))
      .agg(count(lit(1)).as("c"))

  /** Cells + rank location (batch; runs on the final cells). The
    * cumulative window is keyless but its input is the ≤512-row bucket
    * DOMAIN, never the stream (lint-allowlisted); the 1-row total rides
    * the standard global-aggregate broadcast. */
  def quantileEstimates(ev: DataFrame): DataFrame = {
    val cells = quantileCells(ev)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    cells.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(cells.agg(sum(col("c")).cast("long").as("n"))))
      .withColumn("q_pct", explode(array(lit(50), lit(90), lit(99))))
      .withColumn("k_rank",
        expr("CAST((q_pct * n + 99) DIV 100 AS BIGINT)"))
      .where(col("cum") >= col("k_rank"))
      .groupBy(col("q_pct"), col("n"), col("k_rank"))
      .agg(min(col("b")).as("bucket"))
  }

  /** 1-hour tumbling windows per event type. */
  def tumbling(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** 1-hour windows sliding every 15 minutes (each event lands in 4). */
  def sliding(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Session windows: 30-minute inactivity gap per user. */
  def session(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** CHAINED multi-stateful query (Spark 4): watermarked
    * dropDuplicatesWithinWatermark feeding a tumbling window aggregation
    * in ONE streaming query — one checkpoint, two state stores. This is
    * the real 100 TB topology shape (dedup → sessionize/window → enrich
    * in a single query) that pre-Spark-3.5 engines forced into separate
    * queries glued by an intermediate topic, paying a full
    * serialize/replay per stage. Both operators' state is
    * watermark-bounded: the dedup store evicts keys once the watermark
    * passes event time + delay, the window store evicts finalized
    * windows — StreamingSpec asserts BOTH stores report bounded
    * numRowsTotal across batches. Only composable on a STREAMING frame
    * (Spark rejects dropDuplicatesWithinWatermark in batch), so the
    * correctness gate replays distinct → window in the oracle instead
    * of a batch twin. Cents are exact BIGINT (the dedup must be
    * result-invisible to the sum — a float fold could mask a lost or
    * doubled event in rounding). */
  def chainedStateful(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("cents"))

  /** The join→agg chain topology (shared by StreamIO's registered op
    * and the StreamingSpec observability run): stream-stream inner join
    * (purchases within 30 minutes before each click, per user, both
    * sides watermarked) rolled into hourly pair counts + cents — three
    * state stores (two join sides + window state) in one query. */
  def chainedJoinAgg(ev: DataFrame): DataFrame = {
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") - expr("INTERVAL 30 MINUTES") &&
          col("p_ts") <= col("c_ts"))
      .groupBy(window(col("c_ts"), "1 hour"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("CAST(round(p_value * 100) AS BIGINT)")).as("cents"))
      .select(col("window.start").as("window_start"), col("n_pairs"),
        col("cents"))
  }

  /** Exactly-once by key: duplicates (here: a replayed copy of the whole
    * stream) collapse to one row per event_id. */
  def dedup(ev: DataFrame): DataFrame =
    ev.union(ev)
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Watermarked daily counts. In batch the watermark is a no-op by
    * design (complete data); StreamingSpec asserts the streaming side
    * actually drops late rows and bounds state. */
  def watermarked(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("day_start"), col("event_type"),
        col("n_events"))

  /** Late-data policy boundary made observable: the rows a 10-minute
    * watermark would still be holding open at end-of-stream (ts within
    * 10 minutes of the stream's max). */
  def lateData(ev: DataFrame): DataFrame = {
    val cutoff = ev.agg((max(col("ts")).cast("long") - 600).as("cut"))
    ev.crossJoin(broadcast(cutoff))
      .where(col("ts").cast("long") > col("cut"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_tail_events"))
  }

  /** Arbitrary keyed state: per-user running (count, sum, last-seen),
    * the ECS "system with Resource state" analog. flatMapGroupsWithState
    * runs identically in batch (one invocation per key, empty init state)
    * and streaming (state persisted per key in the state store,
    * watermark-bounded via EventTimeTimeout). */
  def statefulSummary(spark: SparkSession, ev: DataFrame): DataFrame = {
    import spark.implicits._
    val fn = (uid: Long, rows: Iterator[Event], state: GroupState[UserAgg]) => {
      var agg = state.getOption.getOrElse(UserAgg(0L, 0.0, Long.MinValue))
      rows.foreach { e =>
        agg = UserAgg(agg.n + 1, agg.sum + e.value,
          math.max(agg.lastTs, e.ts.getTime / 1000))
      }
      state.update(agg)
      Iterator(UserSummary(uid, agg.n, agg.sum, agg.lastTs))
    }
    ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
      .toDF()
      // round outside the stateful fn so both engines use SQL round()
      .select(col("user_id"), col("n_events"),
        round(col("sum_value"), 4).as("sum_value"), col("last_epoch_s"))
  }

  /** Spark 4's successor API for arbitrary state: transformWithState
    * with a StatefulProcessor owning typed ValueState. Same batch ≡
    * streaming contract as flatMapGroupsWithState, but state is
    * schema-evolvable, TTL-able, and multiple state variables per key
    * are first-class. Emits per-user (count, max value) summaries. */
  class UserPeakProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserPeak] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var st: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("peak",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserPeak] = {
      var (n, mx) = if (st.exists()) st.get() else (0L, Double.MinValue)
      rows.foreach { e => n += 1; mx = math.max(mx, e.value) }
      st.update((n, mx))
      Iterator(UserPeak(key, n, mx))
    }
  }
  case class UserPeak(user_id: Long, n_events: Long, max_value: Double)

  /** Event-time TIMERS + state eviction: a session-close processor. Each
    * key keeps (n_events, last_event_ms) and re-arms a timer at
    * last + 30 min; when the WATERMARK passes that expiry the timer
    * fires, the closed session is emitted, and the key's state is
    * cleared — the state store never accumulates dead sessions. Stale
    * timers from earlier batches are ignored by re-checking the live
    * state's expiry. This is the idiomatic 100 TB session shape: state
    * per ACTIVE key only, eviction driven by event time, not a scan. */
  case class SessionClosed(user_id: Long, n_events: Long, last_ms: Long)

  class SessionCloseProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, SessionClosed] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    private val GapMs = 30L * 60 * 1000
    @transient private var st: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("sess",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionClosed] = {
      var (n, last) = if (st.exists()) st.get() else (0L, 0L)
      rows.foreach { e => n += 1; last = math.max(last, e.ts.getTime) }
      st.update((n, last))
      getHandle.registerTimer(last + GapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionClosed] = {
      if (!st.exists()) Iterator.empty
      else {
        val (n, last) = st.get()
        // a stale timer (re-armed since) fires early: ignore it
        if (expired.getExpiryTimeInMs() < last + GapMs) Iterator.empty
        else {
          st.clear()
          Iterator(SessionClosed(key, n, last))
        }
      }
    }
  }

  /** ListState with BOUNDED contents — the production discipline for
    * list-shaped state: the per-user top-3 event values are kept as a
    * ≤3-element ListState (merge new values, truncate, put back), NOT
    * an append-only log of the whole stream, so state is O(keys·3) at
    * any stream length. A second state variable (ValueState count)
    * demonstrates multiple named state vars per key — the
    * transformWithState surface flatMapGroupsWithState lacks. Emits the
    * current (user_id, n_events, top1..top3) snapshot per batch; the
    * batch twin is a per-user ordered-prefix aggregate. */
  case class UserTop3(user_id: Long, n_events: Long,
                      top1: Double, top2: Double, top3: Double)

  class TopValuesProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserTop3] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var top: ListState[Double] = _
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      top = getHandle.getListState[Double]("top3",
        Encoders.scalaDouble, TTLConfig.NONE)
      cnt = getHandle.getValueState[Long]("n",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTop3] = {
      var n = if (cnt.exists()) cnt.get() else 0L
      // bounded FOLD, not a batch sort: a hot key's micro-batch may carry
      // millions of rows — each offers into the 3-slot array in O(1)
      val best = Array.fill(3)(Double.NegativeInfinity)
      def offer(v: Double): Unit = if (v > best(2)) {
        best(2) = v
        if (best(2) > best(1)) { val t = best(1); best(1) = best(2); best(2) = t }
        if (best(1) > best(0)) { val t = best(0); best(0) = best(1); best(1) = t }
      }
      if (top.exists()) top.get().foreach(offer)
      rows.foreach { e => n += 1; offer(e.value) }
      top.put(best.filter(_ > Double.NegativeInfinity))
      cnt.update(n)
      // -inf sentinel pads missing slots; the caller projects NULLs via nullif
      Iterator(UserTop3(key, n, best(0), best(1), best(2)))
    }
  }

  /** Streaming min-hash reservoir — the streaming face of
    * llm_sample_reservoir, and the third bounded-state face beside
    * stream_cms (frequency) and stream_quantile (rank): sample exactly
    * K events per type from an unbounded firehose, reproducibly. The
    * reservoir invariant is "the K smallest knuth32(event_id) seen so
    * far" — set-algebraic, so it merges across micro-batches and across
    * engines: any retry, replay order, or batch split converges to the
    * SAME K rows (a rand()-based reservoir guarantees none of that).
    * State is a K-entry ListState per key FOREVER; each incoming row
    * folds in O(K) with no sort of the batch. Each emission carries
    * n_seen so the final reservoir is the max-n_seen row set per key.
    * Upstream exactly-once (stream_dedup) keeps event_ids unique —
    * a replayed id would occupy two slots. */
  case class ReservoirRow(event_type: String, n_seen: Long, rk: Int,
                          event_id: Long, h: Long)

  class ReservoirProcessor(k: Int = 10)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, Event, ReservoirRow] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var res: ListState[(Long, Long)] = _ // (h, event_id)
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      res = getHandle.getListState[(Long, Long)]("res",
        Encoders.product[(Long, Long)], TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** (id·2654435761) mod 2³² via 16-bit split — LlmCuration.knuth32's
      * arithmetic exactly, so the oracle's SQL twin replays it. */
    private def knuth(id: Long): Long = {
      val K = 2654435761L
      val lo = (id & 65535L) * K
      val hi = ((id >> 16) & 65535L) * K % 65536L
      Math.floorMod(lo + hi * 65536L, 4294967296L)
    }

    override def handleInputRows(
        key: String, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[ReservoirRow] = {
      var n = if (seen.exists()) seen.get() else 0L
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      if (res.exists()) buf ++= res.get()
      val ord = Ordering[(Long, Long)]
      rows.foreach { e =>
        n += 1
        val hv = (knuth(e.event_id), e.event_id)
        if (buf.size < k) buf += hv
        else {
          // bounded O(K) offer: replace the current worst if hv beats it
          var wi = 0
          var i = 1
          while (i < buf.size) { if (ord.gt(buf(i), buf(wi))) wi = i; i += 1 }
          if (ord.lt(hv, buf(wi))) buf(wi) = hv
        }
      }
      val sorted = buf.sorted(ord).take(k)
      res.put(sorted.toArray)
      seen.update(n)
      sorted.iterator.zipWithIndex.map { case ((h, id), i) =>
        ReservoirRow(key, n, i + 1, id, h)
      }
    }
  }

  def streamReservoir(spark: SparkSession, ev: DataFrame): DataFrame = {
    ensureStateStoreCoordinator(spark)
    import spark.implicits._
    ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event]
      .groupByKey(_.event_type)
      .transformWithState(new ReservoirProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }

  def statefulTop3(spark: SparkSession, ev: DataFrame): DataFrame = {
    ensureStateStoreCoordinator(spark)
    import spark.implicits._
    ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new TopValuesProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
      .toDF()
      // sentinel → NULL, and round OUTSIDE the processor so both engines
      // apply SQL round() to the identical selected doubles
      .select(col("user_id"), col("n_events"),
        round(nullif(col("top1"), lit(Double.NegativeInfinity)), 4).as("top1"),
        round(nullif(col("top2"), lit(Double.NegativeInfinity)), 4).as("top2"),
        round(nullif(col("top3"), lit(Double.NegativeInfinity)), 4).as("top3"))
  }

  /** MapState — keyed sub-maps in the state store: per user, a
    * (event_type → count) map updated point-wise (containsKey/getValue/
    * updateValue — no full-map rewrite per row), emitted as one row per
    * map entry. State is O(keys · |types|); at 100 TB the map iterator
    * only walks each user's own types, and updates are per-entry store
    * puts, which is exactly why MapState exists instead of a ValueState
    * holding a serialized Map (which would rewrite the whole map every
    * row). Batch twin: count(*) grouped by (user_id, event_type). */
  case class UserTypeCount(user_id: Long, event_type: String, n_events: Long)

  class TypeCountsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserTypeCount] {
    import org.apache.spark.sql.streaming.{MapState, TimeMode, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var m: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      m = getHandle.getMapState[String, Long]("bytype",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTypeCount] = {
      // pre-aggregate the batch in a local map so the state store sees
      // |types touched| point updates per key per batch, not 2 reads +
      // 1 write per ROW (a hot key's micro-batch stays O(rows) local
      // work + O(types) store ops)
      val local = scala.collection.mutable.Map.empty[String, Long]
      rows.foreach { e =>
        local.update(e.event_type, local.getOrElse(e.event_type, 0L) + 1)
      }
      local.foreach { case (t, c) =>
        val cur = if (m.containsKey(t)) m.getValue(t) else 0L
        m.updateValue(t, cur + c)
      }
      m.iterator().map { case (t, n) => UserTypeCount(key, t, n) }
    }
  }

  def statefulTypeCounts(spark: SparkSession, ev: DataFrame): DataFrame = {
    ensureStateStoreCoordinator(spark)
    import spark.implicits._
    ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }

  /** State TTL — the knob that bounds state for keys that just stop
    * arriving (abandoned users, dead sessions the watermark can't see
    * because no event-time contract exists): ValueState with a
    * processing-time TTL of 1 hour. Values written more than TTL ago
    * read as absent and their store entries are vacuumed by the
    * maintenance pass — at 100 TB this is what keeps the RocksDB state
    * store sized to ACTIVE keys rather than all keys ever seen. Within
    * one batch (and in the fixture replay) nothing expires, so the
    * batch twin is the plain per-user (count, min) aggregate; the
    * streaming suite asserts the expiry behavior clock-wise. */
  case class UserFloor(user_id: Long, n_events: Long, min_value: Double)

  class TtlFloorProcessor(ttl: java.time.Duration = java.time.Duration.ofHours(1))
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserFloor] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var st: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("floor",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig(ttl))

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserFloor] = {
      var (n, mn) = if (st.exists()) st.get() else (0L, Double.MaxValue)
      rows.foreach { e => n += 1; mn = math.min(mn, e.value) }
      st.update((n, mn))
      Iterator(UserFloor(key, n, mn))
    }
  }

  def statefulTtlFloor(spark: SparkSession, ev: DataFrame): DataFrame = {
    ensureStateStoreCoordinator(spark)
    import spark.implicits._
    ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new TtlFloorProcessor(),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
      .toDF()
      .select(col("user_id"), col("n_events"),
        round(col("min_value"), 4).as("min_value"))
  }

  def sessionClose(spark: SparkSession, ev: DataFrame): DataFrame = {
    ensureStateStoreCoordinator(spark)
    import spark.implicits._
    ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event]
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionCloseProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
      .toDF()
  }

  def statefulPeak(spark: SparkSession, ev: DataFrame): DataFrame = {
    ensureStateStoreCoordinator(spark)
    import spark.implicits._
    ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new UserPeakProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }

  // ── registry: batch twins on the events fixture ───────────────────────

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_cms" -> ((s, d) => cmsEstimates(ev(s, d))),
    "stream_quantile" -> ((s, d) => quantileEstimates(ev(s, d))),
    "stream_reservoir" -> ((s, d) => streamReservoir(s, ev(s, d))),
    "stream_tumbling" -> ((s, d) => tumbling(ev(s, d))),
    "stream_sliding" -> ((s, d) => sliding(ev(s, d))),
    "stream_session" -> ((s, d) => session(ev(s, d))),
    "stream_dedup" -> ((s, d) => dedup(ev(s, d))),
    "stream_watermark" -> ((s, d) => watermarked(ev(s, d))),
    "stream_late_data" -> ((s, d) => lateData(ev(s, d))),
    "stream_stateful_map" -> ((s, d) => statefulSummary(s, ev(s, d))),
    "stream_stateful_tws" -> ((s, d) => statefulPeak(s, ev(s, d))),
    "stream_tws_list" -> ((s, d) => statefulTop3(s, ev(s, d))),
    "stream_tws_map" -> ((s, d) => statefulTypeCounts(s, ev(s, d))),
    "stream_tws_ttl" -> ((s, d) => statefulTtlFloor(s, ev(s, d)))
  )

  private val evCte =
    """WITH ev AS (
      |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |         user_id, event_type, value
      |  FROM events)""".stripMargin

  def oracle: Map[String, String] = Map(
    // the reservoir invariant IS a SQL query: the K smallest split-
    // multiply Knuth hashes per type (identical gate arithmetic)
    "stream_reservoir" -> (evCte +
      """,
        |h AS (
        |  SELECT event_type, event_id,
        |    (((event_id & 65535) * 2654435761)
        |     + ((((event_id >> 16) & 65535) * 2654435761) % 65536)
        |       * 65536) % 4294967296 AS h,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_seen
        |  FROM ev),
        |r AS (
        |  SELECT event_type, n_seen, event_id, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h, event_id)
        |      AS rk
        |  FROM h)
        |SELECT event_type, n_seen, CAST(rk AS INT) AS rk, event_id, h
        |FROM r WHERE rk <= 10""".stripMargin),
    // identical clamp/bucket/rank integer math on the fixed 512-cell grid
    "stream_quantile" -> (evCte +
      """,
        |cells AS (
        |  SELECT least(greatest(CAST(floor(value) AS BIGINT), 0), 511) AS b,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        |cum AS (
        |  SELECT b, sum(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM cells),
        |t AS (SELECT unnest([50, 90, 99]) AS q_pct),
        |k AS (
        |  SELECT t.q_pct, n.n, (t.q_pct * n.n + 99) // 100 AS k_rank
        |  FROM t CROSS JOIN n)
        |SELECT k.q_pct, k.n, CAST(k.k_rank AS BIGINT) AS k_rank,
        |  CAST(min(c2.b) AS BIGINT) AS bucket
        |FROM k JOIN cum c2 ON c2.cum >= k.k_rank
        |GROUP BY k.q_pct, k.n, k.k_rank""".stripMargin),
    // exact sketch replay (same affine arithmetic), like agg_cms_freq
    "stream_cms" -> (evCte +
      """,
        |hv AS (SELECT user_id, user_id % 1000000007 AS h FROM ev),
        |cells AS (
        |  SELECT j,
        |    ((h * [920419823,658812311,500000003,193877777][j+1]::BIGINT
        |      + [7,13,31,71][j+1]::BIGINT) % 1000000007) % 1024 AS bucket,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM hv, (SELECT unnest([0,1,2,3]) AS j) js
        |  GROUP BY 1, 2),
        |ex AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM ev GROUP BY user_id
        |  ORDER BY exact_cnt DESC, user_id LIMIT 20),
        |pe AS (
        |  SELECT user_id, exact_cnt, j,
        |    (((user_id % 1000000007)
        |      * [920419823,658812311,500000003,193877777][j+1]::BIGINT
        |      + [7,13,31,71][j+1]::BIGINT) % 1000000007) % 1024 AS bucket
        |  FROM ex, (SELECT unnest([0,1,2,3]) AS j) js)
        |SELECT pe.user_id, pe.exact_cnt,
        |  CAST(min(cells.c) AS BIGINT) AS est_cnt
        |FROM pe JOIN cells ON cells.j = pe.j AND cells.bucket = pe.bucket
        |GROUP BY pe.user_id, pe.exact_cnt""".stripMargin),
    "stream_tumbling" -> (evCte +
      """
        |SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM ev GROUP BY 1, 2""".stripMargin),
    // each event belongs to the 4 hour-long windows starting at the
    // 15-minute marks in (ts - 1h, ts]
    "stream_sliding" -> (evCte +
      """
        |SELECT time_bucket(INTERVAL 15 MINUTES, ts)
        |         - o * INTERVAL 15 MINUTES AS window_start,
        |       event_type, count(*) AS n_events,
        |       round(sum(value), 4) AS sum_value
        |FROM ev CROSS JOIN (VALUES (0), (1), (2), (3)) offsets(o)
        |GROUP BY 1, 2""".stripMargin),
    // gaps-and-islands: new session when the gap from the previous event
    // of the same user is >= 30 minutes (Spark merges only strictly
    // closer events); session_end = last event + gap
    "stream_session" -> (evCte +
      """
        |, flagged AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTES AS session_end,
        |       user_id, count(*) AS n_events,
        |       round(sum(value), 4) AS sum_value
        |FROM numbered GROUP BY user_id, sid""".stripMargin),
    "stream_dedup" ->
      """SELECT event_type, count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "stream_watermark" -> (evCte +
      """
        |SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, event_type,
        |       count(*) AS n_events
        |FROM ev GROUP BY 1, 2""".stripMargin),
    "stream_late_data" -> (evCte +
      """
        |SELECT event_type, count(*) AS n_tail_events
        |FROM ev
        |WHERE epoch_ns(ts) // 1000000000 >
        |      (SELECT max(epoch_ns(ts) // 1000000000) - 600 FROM ev)
        |GROUP BY event_type""".stripMargin),
    "stream_stateful_map" -> (evCte +
      """
        |SELECT user_id, count(*) AS n_events,
        |       round(sum(value), 4) AS sum_value,
        |       max(epoch_ns(ts) // 1000000000) AS last_epoch_s
        |FROM ev GROUP BY user_id""".stripMargin),
    "stream_stateful_tws" ->
      """SELECT user_id, count(*) AS n_events, max(value) AS max_value
        |FROM events GROUP BY user_id""".stripMargin,
    // list indexing past length is NULL in DuckDB, matching the
    // sentinel->nullif padding on the Spark side
    "stream_tws_list" ->
      """WITH s AS (
        |  SELECT user_id, count(*) AS n_events,
        |         list_sort(list(value), 'DESC') AS vs
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |       round(vs[1], 4) AS top1, round(vs[2], 4) AS top2,
        |       round(vs[3], 4) AS top3
        |FROM s""".stripMargin,
    "stream_tws_map" ->
      """SELECT user_id, event_type, count(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_tws_ttl" ->
      """SELECT user_id, count(*) AS n_events,
        |       round(min(value), 4) AS min_value
        |FROM events GROUP BY user_id""".stripMargin
  )
}
