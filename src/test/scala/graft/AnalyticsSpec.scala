package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("graph_label_propagation: communities partition the graph, modularity reconciles") {
    val out = Analytics.graphLabelProp(spark, sf).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty)
      // the communities partition the node set: sizes sum to |V|,
      // id checksums sum to the total id mass
      val adjNodes = graft.Tables.lineitem(spark, sf)
        .groupBy($"l_orderkey")
        .agg(array_distinct(collect_list($"l_suppkey")).as("sups"))
        .select(explode($"sups").as("src"), $"sups")
        .select($"src", explode($"sups").as("dst"))
        .where($"src" =!= $"dst")
        .groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
        .where($"w" >= 2)
        .select($"src").distinct().collect().map(_.getLong(0))
      assert(rows.map(_.getAs[Long]("n_nodes")).sum == adjNodes.length)
      assert(rows.map(_.getAs[Long]("id_sum")).sum == adjNodes.sum)
      // intra-community edges never exceed the community's degree mass / 2
      rows.foreach { r =>
        assert(r.getAs[Long]("e_c") * 2 <= r.getAs[Long]("d_c"))
        assert(r.getAs[Double]("q_c") <= 1.0 + 1e-9)
      }
      // modularity is bounded: Q = Σ q_c ∈ [-0.5, 1]
      val q = rows.map(_.getAs[Double]("q_c")).sum
      assert(q >= -0.5 - 1e-9 && q <= 1.0 + 1e-9, s"Q out of range: $q")
    } finally out.unpersist()
  }

  test("lpa core separates a planted barbell into its two cliques") {
    // two triangles {1,2,3} and {4,5,6} bridged by 3-4: deterministic
    // synchronous min-tie LPA converges to communities led by 1 and 3
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val edges = (e ++ e.map(_.swap)).toDF("src", "dst")
    val labels = Analytics.lpaRounds(edges, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == labels(2L) && labels(2L) == labels(3L))
    assert(labels(4L) == labels(5L) && labels(5L) == labels(6L))
    assert(labels(1L) != labels(4L), "bridge merged the cliques")
  }

  test("dq_referential: real FK edges are clean, the partial-load audit fires") {
    val out = Analytics.dqReferential(spark, sf).collect()
    assert(out.length == 4)
    val byFk = out.map(r => r.getAs[String]("fk") -> r).toMap
    // the three real FK edges of the star schema hold
    Seq("lineitem.l_orderkey->orders", "orders.o_custkey->customer",
      "lineitem.l_partkey->part").foreach { fk =>
      val r = byFk(fk)
      assert(r.getAs[Long]("n_orphans") == 0L, s"$fk has orphans")
      assert(r.isNullAt(r.fieldIndex("orphan_key_min")), s"$fk repro not null")
    }
    // the planted partial dim load produces orphans whose keys all end in 3
    val p = byFk("orders.o_custkey->customer@partial_load")
    assert(p.getAs[Long]("n_orphans") > 0L, "planted audit did not fire")
    assert(p.getAs[Long]("orphan_key_min") % 10 == 3)
    // orphan rows never exceed child rows; key count never exceeds rows
    out.foreach { r =>
      assert(r.getAs[Long]("n_orphans") <= r.getAs[Long]("n_child"))
      assert(r.getAs[Long]("n_orphan_keys") <= r.getAs[Long]("n_orphans"))
    }
  }

  test("ts_entropy: bounded by ln(active hours), peak share consistent, exact terms") {
    val out = Analytics.tsEntropy(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val active = r.getAs[Long]("active_hours")
      assert(h >= -1e-6, s"entropy negative: $h")
      assert(h <= math.log(active.toDouble) + 1e-6,
        s"entropy $h exceeds ln($active)")
      val peakBp = r.getAs[Long]("peak_bp")
      // peak share is at least the uniform share and at most 100 %
      assert(peakBp >= 10000 / active && peakBp <= 10000)
      assert(r.getAs[Long]("peak_hour") >= 0 && r.getAs[Long]("peak_hour") <= 23)
    }
    // a type active in exactly one hour would have entropy 0; uniform
    // activity maximizes it — cross-check one row against a direct fold
    val ev = graft.Tables.events(spark, sf)
      .groupBy($"event_type", hour($"ts").as("hod"))
      .agg(count(lit(1)).as("c"))
      .groupBy($"event_type")
      .agg(collect_list($"c").as("cs"))
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[scala.collection.Seq[Long]]("cs")).toMap
    out.foreach { r =>
      val cs = ev(r.getAs[String]("event_type"))
      val n = cs.sum.toDouble
      // HALF_UP like Spark's round (math.round half-to-+inf differs on
      // negative halves — measure-zero here, but match exactly anyway)
      val want = -cs.map(c => BigDecimal(c * math.log(c / n) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      assert(r.getAs[Long]("ent_fp") == want,
        s"${r.getAs[String]("event_type")}: ent_fp drifted from direct fold")
    }
  }

  test("ts_gapfill: spine is dense per type, gaps zero-filled, sums forward-filled") {
    val out = Analytics.tsGapfill(spark, sf).cache()
    try {
      // dense: per type, row count == hours between min and max inclusive
      val spans = out.groupBy($"event_type")
        .agg(count(lit(1)).as("rows"),
          ((unix_timestamp(max($"h")) - unix_timestamp(min($"h"))) / 3600 + 1)
            .cast("long").as("hours"))
        .collect()
      spans.foreach(r => assert(r.getAs[Long]("rows") == r.getAs[Long]("hours"),
        s"${r.getString(0)}: spine has holes"))
      // sf0.001 is sparse enough to contain real gaps
      val gaps = out.where($"is_gap").count()
      assert(gaps > 0, "fixture at sf0.001 must contain hour gaps")
      // gap rows have n=0 and a forward-filled (non-null after first obs) sum
      assert(out.where($"is_gap" && $"n" =!= 0).count() == 0)
    } finally out.unpersist()
  }

  test("mv_incremental: partial merge equals full recompute, delta-only events scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val out = Analytics.mvIncremental(spark, sf)
    // monoid equality: snapshot partials + delta partials re-aggregated
    // must equal a from-scratch recompute of the view
    val full = graft.Tables.events(spark, sf)
      .groupBy($"event_type", pmod($"user_id", lit(64)).as("seg"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round($"value" * 100, 0).cast("long")) / 100.0).as("total"))
    val got = out.select($"event_type", $"seg", $"n_events", $"total")
      .collect().map(_.toSeq).toSet
    val want = full.collect().map(_.toSeq).toSet
    assert(got == want, "merged view diverges from full recompute")
    // refresh cost is O(delta): the merged plan reads the events log
    // exactly once (the delta side, carrying the cutoff predicate); the
    // snapshot side reads only the staged view partials
    val scans = collectFinal(out) { case s: FileSourceScanExec =>
      s.relation.location.rootPaths.mkString(",")
    }
    assert(scans.count(_.contains("events.parquet")) == 1,
      s"expected exactly one events scan, got:\n${scans.mkString("\n")}")
    // groups spanning the cutoff exist and are flagged
    assert(out.where($"provenance" === "both").count() > 0)
    // staging is per-(dir, version): a second call reuses the artifact
    val (v1, _) = Analytics.stagedMv(spark, sf)
    val (v2, _) = Analytics.stagedMv(spark, sf)
    assert(v1.inputFiles.sorted.sameElements(v2.inputFiles.sorted))
  }

  test("ts_sessionize: partitions the log, dense ids, one shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // the scale claim first, against the UNCACHED plan: ONE shuffle —
    // the (user_id, session_id) group-by is satisfied by the window's
    // user_id hash partitioning
    val shuffles = collectFinal(Analytics.tsSessionize(spark, sf)
      .select($"user_id", $"n_events")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1,
      s"sessionize must be a one-shuffle pipeline, got ${shuffles.size}")
    val out = Analytics.tsSessionize(spark, sf).cache()
    try {
      // sessions PARTITION the event log: every event lands in exactly
      // one session
      val nEvents = graft.Tables.events(spark, sf).count()
      assert(out.agg(sum($"n_events")).head.getLong(0) == nEvents)
      // per user, session ids are dense 1..k (running sum of breaks
      // starting from a forced first-row break)
      val ragged = out.groupBy($"user_id")
        .agg(min($"session_id").as("lo"), max($"session_id").as("hi"),
          count(lit(1)).as("k"))
        .where($"lo" =!= 1 || $"hi" =!= $"k")
      assert(ragged.isEmpty, "session ids must be dense per user")
      // fixture is non-degenerate in both directions
      assert(out.where($"n_events" > 1).count() > 0, "no multi-event session")
      assert(out.groupBy($"user_id").count().where($"count" > 1).count() > 0,
        "no user with a session break")
      // within a session the bounding gap can't exceed (n-1) full gaps
      assert(out.where($"duration_sec" > ($"n_events" - 1) * 1800).count() == 0,
        "a session spans longer than its events could allow")
    } finally out.unpersist()
  }

  test("dim_scd2_incremental: carried ∪ rebuilt equals the from-scratch build") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // refresh cost is O(delta + touched), asserted on the UNCACHED plan:
    // every orders scan sits under the cutoff filter (2 delta-sized
    // reads); the carried/replay paths read the STAGED dimension parquet,
    // never the orders log
    val scans = collectFinal(Analytics.dimScd2Incremental(spark, sf)) {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.mkString(",")
    }
    assert(scans.count(_.contains("orders.parquet")) == 2,
      s"expected two delta-slice orders scans, got:\n${scans.mkString("\n")}")
    assert(scans.exists(s => s.contains("graft_stage") && s.contains("scd2_")),
      "carried path must read the staged dimension")
    val out = Analytics.dimScd2Incremental(spark, sf).cache()
    try {
      // equality with the full window over all orders, column for column
      val want = Analytics.dimScd2(spark, sf).collect().map(_.toSeq).toSet
      val got = out.drop("provenance").collect().map(_.toSeq).toSet
      assert(got == want, "incremental dimension diverges from recompute")
      // provenance marks exactly the delta-touched customers
      val byProv = out.groupBy($"provenance").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byProv.getOrElse("carried", 0L) > 0 &&
        byProv.getOrElse("rebuilt", 0L) > 0, s"degenerate split: $byProv")
      // staging is per-(dir, version): a second call reuses the artifact
      val (d1, _) = Analytics.stagedScd2(spark, sf)
      val (d2, _) = Analytics.stagedScd2(spark, sf)
      assert(d1.inputFiles.sorted.sameElements(d2.inputFiles.sorted))
    } finally out.unpersist()
  }

  test("dq_drift: PSI exactly zero on identical windows, flags a shifted one") {
    // identical distributions → p_pm == q_pm in every bucket → the
    // integer PSI sum is exactly 0, not epsilon
    val same = Seq.tabulate(200)(i => ("a", "ref", (i % 50).toLong)) ++
      Seq.tabulate(200)(i => ("a", "cur", (i % 50).toLong))
    val r0 = Analytics.psiDrift(same.toDF("event_type", "win", "vc"))
      .collect().head
    assert(r0.getAs[Double]("psi") == 0.0 && !r0.getAs[Boolean]("is_drift"))
    // a hard location shift concentrates the windows in disjoint buckets
    val shifted = Seq.tabulate(200)(i => ("a", "ref", (i % 50).toLong)) ++
      Seq.tabulate(200)(i => ("a", "cur", 900L + (i % 50)))
    val r1 = Analytics.psiDrift(shifted.toDF("event_type", "win", "vc"))
      .collect().head
    assert(r1.getAs[Boolean]("is_drift") && r1.getAs[Double]("psi") > 1.0,
      s"shifted distribution must flag, psi=${r1.getAs[Double]("psi")}")
    // fixture wiring: the two windows partition the event log
    val out = Analytics.dqDrift(spark, sf).collect()
    val n = graft.Tables.events(spark, sf).count()
    assert(out.map(r => r.getAs[Long]("ref_n") + r.getAs[Long]("cur_n")).sum == n)
    assert(out.forall(r => r.getAs[Long]("ref_n") > 0 && r.getAs[Long]("cur_n") > 0),
      "both windows must be populated per type")
  }

  test("ts_ewma: window dot product matches a reference recurrence fold") {
    val out = Analytics.tsEwma(spark, sf)
      .orderBy($"event_type", $"h").collect()
    assert(out.nonEmpty)
    val wts = Array.tabulate(8)(j =>
      math.pow(3, j).toLong * math.pow(4, 7 - j).toLong)
    // recompute every row's ewma from the collected series in plain Scala
    out.groupBy(_.getString(0)).foreach { case (tpe, rows) =>
      val vcs = rows.map(r => math.round(r.getAs[Double]("value") * 100))
      rows.zipWithIndex.foreach { case (r, i) =>
        val taps = (0 until 8).filter(j => i - j >= 0)
        val num = taps.map(j => wts(j) * vcs(i - j)).sum
        val den = taps.map(wts).sum
        val want = math.floor(num.toDouble / den).toLong / 100.0
        assert(r.getAs[Double]("ewma") == want,
          s"$tpe row $i: ewma ${r.getAs[Double]("ewma")} != $want")
      }
      // series head: a single tap means ewma == value exactly
      assert(rows.head.getAs[Double]("ewma") == rows.head.getAs[Double]("value"))
    }
  }

  test("dq_observe: metrics ride the pipeline pass and equal direct aggregation") {
    val out = Analytics.dqObserve(spark, sf).collect().head
    val li = graft.Tables.lineitem(spark, sf)
    assert(out.getAs[Long]("n_in") == li.count())
    assert(out.getAs[Long]("null_qty") ==
      li.where($"l_quantity".isNull).count())
    val filtered = li.where($"l_discount" > 0.05)
    assert(out.getAs[Long]("n_out") == filtered.count())
    val cents = filtered
      .select(round($"l_extendedprice" * 100, 0).cast("long").as("c"))
      .agg(sum($"c")).head().getLong(0)
    assert(out.getAs[Double]("revenue") == cents / 100.0)
  }

  test("dq_skew: audit equals a direct frequency-table fold") {
    val r = Analytics.dqSkew(spark, sf).collect().head
    val freqs = graft.Tables.lineitem(spark, sf)
      .groupBy($"l_suppkey").count()
      .collect().map(x => x.getLong(0) -> x.getLong(1))
    assert(r.getAs[Long]("n_rows") == freqs.map(_._2).sum)
    assert(r.getAs[Long]("n_keys") == freqs.length)
    val mx = freqs.map(_._2).max
    assert(r.getAs[Long]("max_freq") == mx)
    assert(r.getAs[Long]("hot_key") ==
      freqs.filter(_._2 == mx).map(_._1).min)
    val mean = freqs.map(_._2).sum.toDouble / freqs.length
    assert(r.getAs[Double]("skew_ratio") ==
      math.rint(mx / mean * 10000) / 10000)
  }

  test("ts_changepoint: window identity equals the literal clamped recurrence") {
    val out = Analytics.tsChangepoint(spark, sf).collect()
    assert(out.nonEmpty)
    // re-derive the hourly series exactly as the op does, then walk the
    // literal recurrence S_t = max(0, S_{t-1} + d_t) in plain Scala —
    // the spec pins the prefix-minus-running-min identity to the
    // textbook definition it claims to equal
    val hourly = graft.Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(round(sum($"value") * 100, 0).cast("long").as("vc"))
      .orderBy($"event_type", $"h")
      .collect()
    val byType = hourly.groupBy(_.getString(0))
    out.foreach { r =>
      val tpe = r.getString(0)
      val vcs = byType(tpe).map(_.getAs[Long]("vc"))
      val n = vcs.length.toLong
      val sx = vcs.sum
      val slack = sx / 20 // nonneg, so / == div == //
      var sup = 0L; var sdn = 0L
      var nUp = 0L; var nDn = 0L
      var maxUp = 0L; var maxDn = 0L
      var firstUp = -1; var firstDn = -1
      vcs.zipWithIndex.foreach { case (vc, i) =>
        sup = math.max(0L, sup + (n * vc - sx - slack))
        sdn = math.max(0L, sdn + (sx - n * vc - slack))
        maxUp = math.max(maxUp, sup); maxDn = math.max(maxDn, sdn)
        if (sup * 4 > sx) { nUp += 1; if (firstUp < 0) firstUp = i }
        if (sdn * 4 > sx) { nDn += 1; if (firstDn < 0) firstDn = i }
      }
      assert(r.getAs[Long]("n_hours") == n, s"$tpe n_hours")
      assert(r.getAs[Long]("n_alarm_up") == nUp, s"$tpe n_alarm_up")
      assert(r.getAs[Long]("n_alarm_dn") == nDn, s"$tpe n_alarm_dn")
      assert(r.getAs[Double]("max_cusum_up") == (maxUp / n) / 100.0, s"$tpe up")
      assert(r.getAs[Double]("max_cusum_dn") == (maxDn / n) / 100.0, s"$tpe dn")
      val hs = byType(tpe).map(_.getAs[java.sql.Timestamp]("h"))
      def at(i: Int): java.sql.Timestamp = if (i < 0) null else hs(i)
      assert(r.getAs[java.sql.Timestamp]("first_alarm_up") == at(firstUp))
      assert(r.getAs[java.sql.Timestamp]("first_alarm_dn") == at(firstDn))
    }
  }

  test("ts_changepoint: planted step shift alarms after the shift, flat series never") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cusum").toString
    val hours = 200
    val shiftAt = 100
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    val rows = (0 until hours).flatMap { i =>
      val ts = java.sql.Timestamp.from(base.plusSeconds(i * 3600L))
      Seq(
        (i.toLong * 2, ts, 1L, "step",
          if (i < shiftAt) 10.0 else 20.0, "{}"),
        (i.toLong * 2 + 1, ts, 2L, "flat", 15.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Analytics.tsChangepoint(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val shiftTs = java.sql.Timestamp.from(base.plusSeconds(shiftAt * 3600L))
    val step = out("step")
    // up-shift detected at or after the planted change point, never before
    assert(step.getAs[Long]("n_alarm_up") > 0)
    assert(!step.getAs[java.sql.Timestamp]("first_alarm_up").before(shiftTs))
    // the retrospective down side (pre-shift mean below the global mean)
    // alarms strictly before the shift — CUSUM localizes both directions
    assert(step.getAs[Long]("n_alarm_dn") > 0)
    assert(step.getAs[java.sql.Timestamp]("first_alarm_dn").before(shiftTs))
    // a flat series accumulates nothing: slack alone keeps S at zero
    val flat = out("flat")
    assert(flat.getAs[Long]("n_alarm_up") == 0 &&
      flat.getAs[Long]("n_alarm_dn") == 0)
    assert(flat.getAs[Double]("max_cusum_up") == 0.0 &&
      flat.getAs[Double]("max_cusum_dn") == 0.0)
    assert(flat.getAs[java.sql.Timestamp]("first_alarm_up") == null)
  }

  test("graph_bfs: seeds at hop 0, contiguous hops, reachability = components") {
    val out = Analytics.graphBfs(spark, sf).collect()
    val hops = out.map(_.getAs[Int]("hop"))
    // seeds: the 5 smallest node ids sit at hop 0
    val nodeIds = Analytics.adjacencyProbe(spark, sf)
      .select($"id").as[Long].collect().sorted
    val h0 = out.find(_.getAs[Int]("hop") == 0).get
    assert(h0.getAs[Long]("n_nodes") == 5L)
    assert(h0.getAs[Long]("id_sum") == nodeIds.take(5).sum)
    // a total audit: hop rows partition the node set
    assert(out.map(_.getAs[Long]("n_nodes")).sum == nodeIds.length)
    // frontier expansion leaves no hop gaps
    val pos = hops.filter(_ >= 0).sorted
    assert(pos.toSeq == (0 to pos.max).toSeq, s"hop gaps: ${pos.mkString(",")}")
    // reachable ⇔ same component as a seed (BFS agrees with the closure)
    val cc = Analytics.componentLabels(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seedCcs = nodeIds.take(5).map(cc).toSet
    val nReachable = nodeIds.count(id => seedCcs.contains(cc(id)))
    assert(out.filter(_.getAs[Int]("hop") >= 0)
      .map(_.getAs[Long]("n_nodes")).sum == nReachable)
  }

  test("funnel: stages are monotonically shrinking and rates consistent") {
    val rows = Analytics.funnel(spark, sf).orderBy($"stage").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val ns = rows.map(_.getLong(1))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), "funnel must narrow")
    assert(rows(0).getDouble(2) == 1.0)
    assert(rows(2).getDouble(2) <= rows(1).getDouble(2))
  }

  test("merge_upsert: action accounting matches the update-set construction") {
    val out = Analytics.mergeUpsert(spark, sf).cache()
    try {
      val byAction = out.groupBy($"action").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val base = Tables.orders(spark, sf)
      val nBase = base.count()
      val nDiv10 = base.where(pmod($"o_orderkey", lit(10)) === 0).count()
      assert(byAction("inserted") == 5L)
      assert(byAction("updated") == nDiv10)
      assert(byAction.getOrElse("kept", 0L) == nBase - nDiv10)
      // updated rows carry the exact-cents reprice and the U status
      val u = out.where($"action" === "updated")
      assert(u.where($"status" =!= "U").count() == 0)
    } finally out.unpersist()
  }

  test("retention: offset-0 retention is 1.0 and rates never exceed 1") {
    val rows = Analytics.retention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("retention")
      assert(rate > 0.0 && rate <= 1.0)
      if (r.getAs[Long]("week_offset") == 0L)
        assert(rate == 1.0, "every cohort member is active in its signup week")
    }
  }

  test("graph_jaccard: scores bounded, common never exceeds either degree") {
    val rows = Analytics.graphJaccard(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val (c, u) = (r.getAs[Long]("common"), r.getAs[Long]("union_n"))
      assert(c >= 2 && c <= u, "intersection bounded by union")
      val j = r.getAs[Long]("jaccard_fp")
      assert(j >= 0L && j <= 1000000L, s"jaccard_fp $j out of [0, 10^6]")
    }
    val js = rows.map(_.getAs[Long]("jaccard_fp")).toSeq
    assert(js == js.sorted.reverse, "ranked by jaccard desc")
  }

  test("ts_interpolate: anchors exact, gap values inside the bracket range") {
    val out = Analytics.tsInterpolate(spark, sf).cache()
    try {
      assert(out.where($"value".isNull).count() == 0, "no unfilled hours")
      // non-gap rows reproduce the hourly sum in cents
      val hourly = Tables.events(spark, sf)
        .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
        .agg((round(sum($"value") * 100, 0).cast("long") / 100.0).as("expect"))
      val mism = out.where(!$"is_gap")
        .join(hourly, Seq("event_type", "h"))
        .where($"value" =!= $"expect").count()
      assert(mism == 0, "anchor hours must carry the exact observed value")
    } finally out.unpersist()
  }

  test("ts_seasonal: residual reconstructs value, seasonal constant per hour-of-day") {
    import org.apache.spark.sql.functions._
    val out = Analytics.tsSeasonal(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (v, s, res) = (r.getAs[Double]("value"),
        r.getAs[Double]("seasonal"), r.getAs[Double]("residual"))
      // exact: all three derive from the same integer cents
      assert(math.abs((s + res) - v) < 1e-9, s"decomposition broke: $v != $s + $res")
    }
    // seasonal is a function of (event_type, hour-of-day) only
    val perHod = out.groupBy(r => (r.getAs[String]("event_type"),
      r.getAs[java.sql.Timestamp]("h").toLocalDateTime.getHour))
    perHod.foreach { case (k, rows) =>
      assert(rows.map(_.getAs[Double]("seasonal")).distinct.length == 1,
        s"seasonal must be constant within $k")
    }
  }

  test("win_pattern: journey length matches event count, flags match regexes") {
    val rows = Analytics.winPattern(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val journey = r.getAs[String]("journey")
      assert(journey.length.toLong == r.getAs[Long]("n_events"),
        "one initial per event")
      assert(journey.forall("cepsv".contains(_)), "only known initials")
      assert(r.getAs[Boolean]("converted") ==
        "s.*c.*p".r.findFirstIn(journey).isDefined)
      assert(r.getAs[Long]("n_quick_buys") ==
        "cp".r.findAllIn(journey).length.toLong)
    }
  }

  test("triangles: per-node counts sum to 3T and coefficient is bounded") {
    val out = Analytics.graphTriangles(spark, sf).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty)
      // each triangle contributes to exactly 3 nodes
      val total = rows.map(_.getAs[Long]("triangles")).sum
      assert(total % 3 == 0, s"per-node triangle sum $total not divisible by 3")
      // clustering coefficient is a ratio in [0, 1] at fp scale 10^6
      rows.foreach { r =>
        val c = r.getAs[Long]("coeff_fp")
        assert(c >= 0L && c <= 1000000L, s"coeff_fp $c out of [0, 10^6]")
        // a node with triangles must have degree >= 2
        if (r.getAs[Long]("triangles") > 0) assert(r.getAs[Long]("deg") >= 2)
      }
    } finally out.unpersist()
  }

  test("ts_ohlc: open/close from the (ts, event_id) total order, low <= high") {
    val out = Analytics.tsOhlc(spark, sf).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"))
        assert(l <= h)
        assert(o >= l && o <= h, "open inside [low, high]")
        assert(c >= l && c <= h, "close inside [low, high]")
      }
      // single-event bars have open == close == high == low
      val single = rows.filter(_.getAs[Long]("n_trades") == 1L)
      single.foreach { r =>
        assert(r.getAs[Double]("open") == r.getAs[Double]("close"))
        assert(r.getAs[Double]("high") == r.getAs[Double]("low"))
      }
    } finally out.unpersist()
  }

  test("anomaly_iqr: quartiles ordered, outliers outside the fences") {
    val rows = Analytics.anomalyIqr(spark, sf).collect()
    assert(rows.length == 5, "one row per order priority")
    rows.foreach { r =>
      val (q1, q3) = (r.getAs[Double]("q1"), r.getAs[Double]("q3"))
      assert(q1 <= q3)
      val nOut = r.getAs[Long]("n_outliers")
      if (nOut > 0) {
        val iqr = q3 - q1
        val (lo, hi) = (q1 - 1.5 * iqr, q3 + 1.5 * iqr)
        // detected extremes must sit strictly outside the fences
        val mx = r.getAs[Double]("max_outlier")
        val mn = r.getAs[Double]("min_outlier")
        assert(mx > hi || mn < lo - 1e-9,
          s"outlier range [$mn, $mx] inside fences [$lo, $hi]")
      }
    }
  }

  test("pagerank: covers every connected supplier, conserves fixed-point mass") {
    val Scale = 1000000000000L
    val out = Analytics.graphPagerank(spark, sf).collect()
    val os = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_suppkey").distinct()
    val nNodes = os.as("a").join(os.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_suppkey" =!= $"b.l_suppkey")
      .groupBy($"a.l_suppkey", $"b.l_suppkey").count()
      .where($"count" >= 2) // mirror the operator's weight pruning
      .select($"a.l_suppkey").distinct().count()
    assert(out.length.toLong == nNodes, "one rank per connected supplier")
    assert(out.forall(_.getAs[Long]("rank_fp") > 0))
    // every floor division loses < 1 unit per term; after 3 rounds the
    // total stays within a small truncation envelope of the full mass
    val mass = out.map(_.getAs[Long]("rank_fp")).sum
    assert(mass <= Scale, s"mass $mass exceeds the fixed-point scale")
    assert(mass >= Scale - 20L * nNodes * (out.length + 20), // loose envelope
      s"mass $mass lost more than the truncation envelope")
    val again = Analytics.graphPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(again == out.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      "integer pagerank must be deterministic")
  }

  test("ppr: mass stays on the seed neighborhood, seeds dominate, deterministic") {
    val Scale = 1000000000000L
    val out = Analytics.graphPpr(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nConnected = Analytics.graphPagerank(spark, sf).count()
    // locality: the 3-round walk reaches a subset of the graph, and
    // never more nodes than pagerank ranks
    assert(out.nonEmpty && out.size <= nConnected.toInt)
    // restart mass pins every seed: each of the 5 lowest connected ids
    // holds at least its teleport share 3/20 · Scale/5
    val seeds = Analytics.graphPagerank(spark, sf)
      .select($"s_suppkey").orderBy($"s_suppkey").limit(5)
      .collect().map(_.getLong(0))
    seeds.foreach { id =>
      assert(out.getOrElse(id, 0L) >= 3L * Scale / 100L, s"seed $id mass")
    }
    // seed mass dominates any non-seed (3 damped hops can't overtake
    // the restart anchor on this fixture)
    val minSeed = seeds.map(out).min
    val maxOther = (out -- seeds).values.foldLeft(0L)(math.max)
    assert(minSeed > maxOther, s"seed floor $minSeed vs non-seed $maxOther")
    // total mass bounded by the unit of mass injected
    assert(out.values.sum <= Scale)
    val again = Analytics.graphPpr(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out, "integer PPR must be deterministic")
  }

  test("graph plan guard: wedge materialization cannot silently return") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{
      CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
    // triangles: the merge kernel is in the plan, no shuffle-side join or
    // cross join ever touches the edge set, and shuffles stay bounded at
    // the two aggregates (never Σdeg² wedge rows through an exchange)
    val tri = Analytics.graphTriangles(spark, sf)
    assert(tri.queryExecution.executedPlan.toString
        .contains("sorted_intersect_count"),
      "graph_triangles lost the sorted-adjacency intersection kernel")
    val triBad = collectFinal(tri) {
      case p: SortMergeJoinExec    => p
      case p: ShuffledHashJoinExec => p
      case p: CartesianProductExec => p
    }
    assert(triBad.isEmpty,
      s"graph_triangles must only broadcast-join the adjacency, found: $triBad")
    val triShuffles = collectFinal(tri) { case p: ShuffleExchangeExec => p }
    assert(triShuffles.size <= 3,
      s"graph_triangles shuffle count grew to ${triShuffles.size}")
    // jaccard pair scoring: the kernel must sit in the PROJECTION, never
    // in the join condition — Catalyst folding `common >= 2` into the
    // nested-loop condition re-runs the merge per candidate (the 2×-eval
    // regression this guard pins)
    val scored = Analytics.graphJaccardScored(spark, sf)
    val lines = scored.queryExecution.executedPlan.toString.linesIterator.toSeq
    assert(lines.exists(_.contains("sorted_intersect_count")),
      "graph_jaccard lost the sorted-adjacency intersection kernel")
    lines.filter(_.contains("NestedLoopJoin")).foreach { l =>
      assert(!l.contains("sorted_intersect_count"),
        s"merge kernel leaked into the join condition: $l")
    }
    // the public query runs the scoring behind a checkpoint barrier: its
    // own plan is filter + top-k only, no joins at all
    val jac = Analytics.graphJaccard(spark, sf)
    val jacJoins = collectFinal(jac) {
      case p: SortMergeJoinExec    => p
      case p: ShuffledHashJoinExec => p
      case p: CartesianProductExec => p
    }
    assert(jacJoins.isEmpty, "graph_jaccard tail must be filter + top-k only")
  }

  test("graph_jaccard regimes: sparse + blocked candidates match dense") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    // force each candidate generator on the same fixture and compare the
    // FILTERED pair sets: generation differs (prefix postings / cc-block
    // equi-join / range-pruned NLJ) but every pair with common >= 2 must
    // survive all three with identical exact counts — sparse by the
    // overlap-2 prefix theorem, blocked because a pair sharing a witness
    // is in one component
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .where($"common" >= 2)
      .collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("common"), r.getAs[Long]("du"), r.getAs[Long]("dv")))
      .sorted.toSeq
    val dense = keyed(Analytics.graphJaccardScoredVariant(spark, sf, "dense"))
    assert(dense.nonEmpty, "fixture must exercise the candidate space")
    Seq("sparse", "blocked").foreach { regime =>
      val df = Analytics.graphJaccardScoredVariant(spark, sf, regime)
      assert(keyed(df) == dense,
        s"$regime candidates must replay the dense pair set exactly")
      // plan shape past the gate: the pair space comes from EQUI joins
      // on witness / component / node keys — a broadcast NLJ here is
      // the quadratic regime this guard pins out
      val bnlj = collectFinal(df) { case p: BroadcastNestedLoopJoinExec => p }
      assert(bnlj.isEmpty, s"$regime jaccard fell back to a nested loop")
      assert(df.queryExecution.executedPlan.toString
          .contains("sorted_intersect_count"),
        s"$regime jaccard lost the exact intersection kernel")
    }
    // the public selector must route this heavy fixture (sumdeg2 >> n^2)
    // to the BLOCKED generator once n exceeds the gate
    val routed = Analytics.graphJaccardScoredGated(spark, sf, 0L)
    val bnljR = collectFinal(routed) { case p: BroadcastNestedLoopJoinExec => p }
    assert(bnljR.isEmpty,
      "selector must not pick the NLJ once the active set exceeds the gate")
  }

  test("graph_components: edges never cross labels, cc is the member minimum") {
    // the fixture graph is one dense component — every edge endpoint
    // shares the label and the audit reduces to one row
    val labels = Analytics.componentLabels(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cc")).toMap
    assert(labels.nonEmpty)
    labels.groupBy(_._2).foreach { case (cc, members) =>
      assert(cc == members.keys.min,
        s"component label $cc must be its minimum member id")
    }
    val audit = Analytics.graphComponents(spark, sf).collect()
    assert(audit.map(_.getAs[Long]("n_nodes")).sum == labels.size)
    audit.foreach { r =>
      // a connected component on n nodes carries at least n-1 edges
      assert(r.getAs[Long]("n_edges") >= r.getAs[Long]("n_nodes") - 1)
      assert(labels.values.count(_ == r.getAs[Long]("cc")).toLong
        == r.getAs[Long]("n_nodes"))
    }
    // DISJOINT cliques must yield distinct labels: synthesize a lineitem
    // dir with two 3-supplier cliques (each order pair-covers one clique
    // twice so the w >= 2 co-occurrence gate keeps every edge)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_spec").toString
    val rows = for {
      (base, orders) <- Seq((100L, 1000L), (200L, 2000L))
      o <- orders to (orders + 1) // two orders per clique => w = 2
      sup <- base to (base + 2)
      ln <- Seq(1, 2) // two lines per (order, supplier) — harmless dups
    } yield (o, sup, ln)
    rows.toDF("l_orderkey", "l_suppkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val two = Analytics.graphComponents(spark, dir).collect()
      .map(r => r.getAs[Long]("cc") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"))).toMap
    assert(two == Map(100L -> ((3L, 3L)), 200L -> ((3L, 3L))),
      s"two disjoint 3-cliques must yield two components: $two")
  }

  test("ts_anomaly_mad: robust gate agrees with an independent recompute") {
    import spark.implicits._
    val out = Analytics.tsAnomalyMad(spark, sf).collect()
    val hourly = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(round(sum($"value") * 100, 0).cast("long").as("vc"))
      .as[(String, java.sql.Timestamp, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    def med2(xs: Seq[Long]): Long = { // 2× the median of an integer seq
      val n = xs.length
      if (n % 2 == 1) 2 * xs(n / 2) else xs(n / 2 - 1) + xs(n / 2)
    }
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = hourly(t)
      assert(r.getAs[Long]("n_hours") == xs.length)
      val m2 = med2(xs)
      val devs = xs.map(v => math.abs(2 * v - m2)).sorted
      val mad4 = med2(devs)
      val nAnom = devs.count(d => 2 * d > 3 * mad4).toLong
      assert(r.getAs[Long]("n_anom") == nAnom,
        s"$t: anomaly count ${r.getAs[Long]("n_anom")} != recomputed $nAnom")
      assert((r.getAs[Long]("n_anom") == 0)
        == (r.getAs[java.sql.Timestamp]("first_anom") == null))
    }
  }

  test("ts_rolling_corr: bounded coefficient, window never exceeds 24 rows") {
    import spark.implicits._
    val out = Analytics.tsRollingCorr(spark, sf)
    val nHourly = Tables.events(spark, sf)
      .select($"event_type", date_trunc("hour", $"ts")).distinct().count()
    assert(out.count() == nHourly, "one output row per (type, hour)")
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("nw") >= 1 && r.getAs[Long]("nw") <= 24)
      if (!r.isNullAt(r.fieldIndex("corr_24h"))) {
        val c = r.getAs[Double]("corr_24h")
        assert(c >= -1.0000001 && c <= 1.0000001, s"corr out of range: $c")
      }
    }
    // the fixture's hourly series must actually produce defined correlations
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("corr_24h"))))
  }

  test("graph_degree_dist: handshake identity over the adjacency") {
    val out = Analytics.graphDegreeDist(spark, sf).collect()
    val nodes = Analytics.adjacencyProbe(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_nodes")).sum == nodes)
    val degSum = out.map(r => r.getAs[Long]("deg") * r.getAs[Long]("n_nodes")).sum
    assert(degSum % 2 == 0, "sum of degrees must be even (handshake lemma)")
  }

  test("graph_2hop: seed-bounded, flags agree with the adjacency") {
    import spark.implicits._
    val out = Analytics.graph2hop(spark, sf).collect()
    assert(out.nonEmpty)
    val adj = Analytics.adjacencyProbe(spark, sf)
      .select($"id", $"nbrs").as[(Long, Seq[Long])].collect().toMap
    val seeds = adj.keySet.toSeq.sorted.take(10).toSet
    val perSrc = out.groupBy(_.getAs[Long]("src"))
    assert(perSrc.keySet.subsetOf(seeds), "source outside the seed set")
    perSrc.foreach { case (src, rs) =>
      assert(rs.length <= 5)
      rs.foreach { r =>
        val cand = r.getAs[Long]("cand")
        assert(cand != src)
        assert(r.getAs[Boolean]("is_direct") == adj(src).contains(cand))
        // n_common can never exceed either endpoint's degree
        assert(r.getAs[Long]("n_common") <= adj(src).length)
        assert(r.getAs[Long]("n_common") <= adj(cand).length)
      }
    }
  }

  test("dq_freshness: zero-lag type is the global maximum, volumes reconcile") {
    import spark.implicits._
    val out = Analytics.dqFreshness(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_events")).sum
      == Tables.events(spark, sf).count())
    // exactly the type carrying the global max has lag 0, and stale
    // is the documented 6 h threshold everywhere
    assert(out.count(_.getAs[Long]("lag_sec") == 0L) >= 1)
    out.foreach { r =>
      assert(r.getAs[Boolean]("stale") == (r.getAs[Long]("lag_sec") > 21600L))
      assert(r.getAs[Long]("n_last24h") <= r.getAs[Long]("n_events"))
    }
  }

  test("graph_assortativity: NULL on regular graphs, in [-1,1] otherwise") {
    val r = Analytics.graphAssortativity(spark, sf).head()
    assert(r.getAs[Long]("n_edges") > 0)
    if (!r.isNullAt(r.fieldIndex("assortativity"))) {
      val a = r.getAs[Double]("assortativity")
      assert(a >= -1.0000001 && a <= 1.0000001)
    }
    // independent recompute from the adjacency
    import spark.implicits._
    val adj = Analytics.adjacencyProbe(spark, sf)
      .select($"id", $"nbrs", $"deg").as[(Long, Seq[Long], Long)].collect()
    val degOf = adj.map(a => a._1 -> a._3).toMap
    val es = adj.flatMap(a => a._2.map(v => (a._3, degOf(v))))
    val m = es.length.toLong
    val sx = es.map(_._1).sum
    val sxy = es.map(e => e._1 * e._2).sum
    val sxx = es.map(e => e._1 * e._1).sum
    assert(r.getAs[Long]("n_edges") == m / 2)
    val den = m * sxx - sx * sx
    if (den > 0) {
      val want = BigDecimal((m * sxy - sx * sx).toDouble / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("assortativity") - want) < 1e-9)
    } else assert(r.isNullAt(r.fieldIndex("assortativity")))
  }

  test("dq_completeness: profile reconciles with direct counts") {
    import spark.implicits._
    val out = Analytics.dqCompleteness(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("n_nonnull"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("completeness_bp"))).toMap
    assert(out.keySet ==
      Set("event_id", "user_id", "event_type", "value", "props"))
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    assert(out("event_id") == ((n, n, 10000L)), "event_id must be a dense key")
    val ndType = ev.select($"event_type").distinct().count()
    assert(out("event_type")._2 == ndType)
    out.values.foreach { case (nn, nd, bp) =>
      assert(nd <= nn && bp == nn * 10000 / n)
    }
  }

  test("ts_lttb: endpoints kept, per-bucket argmax matches a local replay") {
    import spark.implicits._
    val out = Analytics.tsLttb(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket")) ->
        (r.getTimestamp(2), r.getAs[Long]("cents"), r.getAs[Long]("area2")))
      .toMap
    val hourly = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(round(sum($"value") * 100, 0).cast("long").as("vc"))
      .as[(String, java.sql.Timestamp, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime)).toMap
    hourly.foreach { case (t, pts) =>
      val n = pts.length
      // endpoints always kept
      assert(out((t, -1L))._1 == pts.head._2)
      assert(out((t, 20L))._1 == pts.last._2)
      // interior: per-bucket argmax of the fixed-neighbor triangle area
      val scored = pts.zipWithIndex.drop(1).dropRight(1).map {
        case ((_, h, y), i) =>
          val (yp, yn) = (pts(i - 1)._3, pts(i + 1)._3)
          val area2 = math.abs(-2 * (y - yp) + (yn - yp))
          val bucket = (i.toLong - 1) * 20 / math.max(n - 2, 1)
          (bucket, h, y, area2)
      }
      scored.groupBy(_._1).foreach { case (b, cand) =>
        val best = cand.minBy(c => (-c._4, c._2.getTime))
        assert(out((t, b)) == ((best._2, best._3, best._4)),
          s"type $t bucket $b")
      }
    }
  }

  test("ts_backtest: matches a local 24h-shift replay of the hourly series") {
    import spark.implicits._
    val out = Analytics.tsBacktest(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_forecasts"), r.getAs[Long]("mae_cents"),
          r.getAs[Long]("bias_cents"))).toMap
    val hourly = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(round(sum($"value") * 100, 0).cast("long").as("vc"))
      .as[(String, java.sql.Timestamp, Long)].collect()
    val byKey = hourly.map { case (t, h, v) => (t, h.getTime) -> v }.toMap
    val want = hourly.flatMap { case (t, h, v) =>
      byKey.get((t, h.getTime - 24L * 3600 * 1000)).map(fc => t -> (v, fc))
    }.groupBy(_._1).map { case (t, rows) =>
      val aes = rows.map { case (_, (v, fc)) => math.abs(v - fc) }
      t -> ((rows.length.toLong, aes.sum / rows.length,
        rows.map { case (_, (v, fc)) => v - fc }.sum))
    }
    assert(out == want, s"got $out\nwant $want")
    assert(out.values.map(_._1).sum > 0, "series must overlap at 24h lag")
  }

  test("dq_dp_release: noise matches the Laplace inverse CDF, counts reconcile") {
    import spark.implicits._
    val out = Analytics.dqDpRelease(spark, sf).collect()
    val trueCounts = Tables.events(spark, sf)
      .groupBy($"event_type").count().as[(String, Long)].collect().toMap
    assert(out.length == trueCounts.size)
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("debug_n_true") == trueCounts(t))
      // replay the hash → uniform → inverse-CDF chain locally
      val h = t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
      assert(r.getAs[Long]("debug_h") == h)
      val u = (h + 0.5) / 1000000007.0
      val noise =
        if (u >= 0.5) -2.0 * math.log(2.0 - 2.0 * u)
        else 2.0 * math.log(2.0 * u)
      assert(r.getAs[Long]("debug_noise_fp") == math.round(noise * 1e6).toLong)
      assert(r.getAs[Long]("released_fp")
        == r.getAs[Long]("debug_n_true") * 1000000L + r.getAs[Long]("debug_noise_fp"))
    }
  }

  test("dq_k_anonymity: reconciles with the QI class-size distribution") {
    import spark.implicits._
    val r = Analytics.dqKAnonymity(spark, sf).collect().head
    val sizes = Tables.customer(spark, sf)
      .groupBy($"c_mktsegment", $"c_nationkey")
      .agg(count(lit(1)).as("g")).collect().map(_.getAs[Long]("g"))
    assert(r.getAs[Long]("n_classes") == sizes.length)
    assert(r.getAs[Long]("n_rows") == sizes.sum)
    assert(r.getAs[Long]("k_effective") == sizes.min)
    assert(r.getAs[Long]("rows_below_k2") == sizes.filter(_ < 2).sum)
    assert(r.getAs[Long]("rows_below_k5") == sizes.filter(_ < 5).sum)
    assert(r.getAs[Long]("rows_below_k10") == sizes.filter(_ < 10).sum)
    // thresholds nest, and exposure is the exact floor-div basis points
    assert(r.getAs[Long]("rows_below_k2") <= r.getAs[Long]("rows_below_k5")
      && r.getAs[Long]("rows_below_k5") <= r.getAs[Long]("rows_below_k10"))
    assert(r.getAs[Long]("exposure_k10_bp")
      == r.getAs[Long]("rows_below_k10") * 10000 / sizes.sum)
  }

  test("graph_kcore: cores nest, and every core node keeps >= k in-core neighbors") {
    import spark.implicits._
    val out = Analytics.graphKcore(spark, sf).collect()
      .map(r => r.getAs[Int]("k") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"))).toMap
    assert(out.keySet == Set(2, 3, 4))
    // nesting: the (k+1)-core is a subgraph of the k-core
    assert(out(3)._1 <= out(2)._1 && out(4)._1 <= out(3)._1)
    assert(out(3)._2 <= out(2)._2 && out(4)._2 <= out(3)._2)
    // independent local peel from the collected adjacency
    val adj = Analytics.adjacencyProbe(spark, sf)
      .select($"id", $"nbrs").as[(Long, Seq[Long])].collect()
      .map(a => a._1 -> a._2.toSet).toMap
    def peel(k: Int): Map[Long, Set[Long]] = {
      var g = adj
      var changed = true
      while (changed) {
        val keep = g.filter(_._2.size >= k).keySet
        val next = g.collect { case (n, nb) if keep(n) =>
          n -> nb.intersect(keep) }.filter(_._2.size >= k)
        changed = next.keySet != g.keySet
        g = next.toMap
      }
      g
    }
    (2 to 4).foreach { k =>
      val core = peel(k)
      assert(out(k)._1 == core.size, s"k=$k node count")
      assert(out(k)._2 == core.values.map(_.size).sum / 2, s"k=$k edge count")
      core.foreach { case (n, nb) => assert(nb.size >= k) }
    }
  }

  test("ts_acf: bounded, lag-complete, and matches a local recompute") {
    import spark.implicits._
    val out = Analytics.tsAcf(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("lag_h") >= 1 && r.getAs[Int]("lag_h") <= 6)
      if (!r.isNullAt(r.fieldIndex("acf"))) {
        val a = r.getAs[Double]("acf")
        assert(a >= -1.0000001 && a <= 1.0000001)
      }
    }
    // local recompute at lag 1 for one type
    val et = out.head.getAs[String]("event_type")
    val series = Tables.events(spark, sf)
      .where($"event_type" === et)
      .groupBy(date_trunc("hour", $"ts").as("h"))
      .agg(round(sum($"value") * 100, 0).cast("long").as("vc"))
      .orderBy($"h").select($"vc").as[Long].collect()
    val xs = series.dropRight(1).map(_.toDouble)
    val ys = series.drop(1).map(_.toDouble)
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum - sx * sy
    val den = math.sqrt(n * xs.map(x => x * x).sum - sx * sx) *
      math.sqrt(n * ys.map(y => y * y).sum - sy * sy)
    val want = BigDecimal(num / den)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = out.find(r => r.getAs[String]("event_type") == et &&
      r.getAs[Int]("lag_h") == 1).get.getAs[Double]("acf")
    assert(math.abs(got - want) < 2e-6)
  }

  test("ts_transitions: per-source probabilities floor-sum to 10000 and mass conserves") {
    import spark.implicits._
    val out = Analytics.tsTransitions(spark, sf).collect()
    assert(out.nonEmpty)
    val byFrom = out.groupBy(_.getAs[String]("from_type"))
    byFrom.foreach { case (_, rows) =>
      val bpSum = rows.map(_.getAs[Long]("p_bp")).sum
      // each p_bp floors, so the sum sits within n_buckets of 10000
      assert(bpSum <= 10000 && bpSum > 10000 - rows.length)
    }
    // total transitions = sum over users of (events - 1)
    val want = Tables.events(spark, sf).groupBy($"user_id")
      .agg((count(lit(1)) - 1).as("t")).agg(sum($"t")).as[Long].head()
    assert(out.map(_.getAs[Long]("n")).sum == want)
  }

  test("ts_active_users: WAU equals the quadratic trailing-window distinct") {
    val got = Analytics.tsActiveUsers(spark, sf).collect()
      .map(r => r.getAs[java.sql.Date](0).toLocalDate ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val act = Tables.events(spark, sf)
      .select($"user_id", to_date($"ts").as("d")).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate))
    val days = act.map(_._2).distinct
    val want = days.map { d =>
      val dau = act.count(_._2 == d).toLong
      val wau = act.filter { case (_, ad) =>
        !ad.isAfter(d) && !ad.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length.toLong
      d -> (dau, wau, dau * 10000L / wau)
    }.toMap
    assert(got == want, s"${got.size} vs ${want.size} curve days")
    // stickiness is a ratio in (0, 10000]; WAU dominates DAU
    got.values.foreach { case (dau, wau, bp) =>
      assert(wau >= dau && bp > 0 && bp <= 10000)
    }
  }

  test("ts_forecast_linear: matches the exact-integer local OLS replay") {
    val got = Analytics.tsForecastLinear(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val hourly = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(round(sum($"value") * 100, 0).cast("long").as("y"))
      .withColumn("eh", expr("unix_timestamp(h) DIV 3600"))
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(2)))
    val want = hourly.groupBy(_._1).map { case (tpe, rows) =>
      val eh0 = rows.map(_._2).min
      val xy = rows.map(t => (t._2 - eh0, t._3))
      val n = xy.length.toLong
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(t => t._1 * t._2).sum
      val sxx = xy.map(t => t._1 * t._1).sum
      val mx = xy.map(_._1).max
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      def r6(v: Double) = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      def r4(v: Double) = BigDecimal(v)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val fc = sy.toDouble / n + slope * ((mx + 1) - sx.toDouble / n)
      tpe -> (n, sy, r6(slope), r4(fc))
    }
    assert(got == want, s"OLS diverges from replay:\n$got\nvs\n$want")
    // sanity: the fixture series are non-degenerate (real slopes exist)
    assert(got.values.exists(_._3 != 0.0))
  }

  test("dq_benford: exact digit shares vs local replay, chi2 consistent") {
    val rows = Analytics.dqBenford(spark, sf).collect()
      .map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("n"), r.getAs[Long]("obs_bp"), r.getAs[Long]("exp_bp"),
          r.getAs[Long]("dev_bp"), r.getAs[Long]("chi2_bp")))
      .toMap
    assert(rows.keySet.subsetOf((1 to 9).toSet) && rows.nonEmpty)
    // local replay of the exact first-digit extraction
    val cents = Tables.orders(spark, sf).select($"o_totalprice")
      .collect().map(r => math.round(r.getDouble(0) * 100))
    val byDigit = cents.groupBy(_.toString.head.asDigit)
      .view.mapValues(_.length.toLong).toMap
    val total = cents.length.toLong
    assert(rows.view.mapValues(_._1).toMap == byDigit)
    rows.foreach { case (d, (nd, obs, exp, dev, _)) =>
      assert(obs == nd * 10000L / total)
      assert(dev == math.abs(obs - exp))
    }
    // single chi2 value repeated per row, equal to the fold over rows
    val chis = rows.values.map(_._5).toSet
    assert(chis.size == 1)
    val want = rows.values.map(t => t._4 * t._4 / t._3).sum
    assert(chis.head == want)
  }

  test("ts_cume_distinct: equals the quadratic distinct-through-day spelling") {
    val got = Analytics.tsCumeDistinct(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString) ->
        (r.getAs[Long]("new_users"), r.getAs[Long]("cume_distinct_users")))
      .toMap
    val ev = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").cast("string").as("day"), $"user_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // the emitted series is SPARSE (only days a first-timer appears —
    // zero-new days add nothing to the curve); ground truth is the
    // quadratic distinct-through-day spelling on those days
    val firstDays = ev.groupBy(e => (e._1, e._3)).view
      .mapValues(_.map(_._2).min).toSeq
      .map { case ((tpe, _), d) => (tpe, d) }.distinct
    val want = firstDays.map { case (tpe, d) =>
      val through = ev.filter(e => e._1 == tpe && e._2 <= d)
        .map(_._3).distinct.size.toLong
      val before = ev.filter(e => e._1 == tpe && e._2 < d)
        .map(_._3).distinct.size.toLong
      (tpe, d) -> (through - before, through)
    }.toMap
    assert(got == want, s"${got.size} vs ${want.size} series points")
    // and every zero-new day the sparse series omits is curve-constant:
    // total distinct per type equals the last cumulative point
    got.groupBy(_._1._1).foreach { case (tpe, pts) =>
      val last = pts.maxBy(_._1._2)._2._2
      val totalDistinct = ev.filter(_._1 == tpe).map(_._3).distinct.size.toLong
      assert(last == totalDistinct, s"$tpe curve must end at total distinct")
    }
  }

  test("graph_sssp: matches a driver-side Dijkstra, 6 rounds are a fixed point, weights shape real paths") {
    val got = Analytics.graphSssp(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent exact replay: collect the sf0.001 co-supply graph
    // (90 edges) and run a reference Dijkstra on the driver
    val os = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val edges = os.as("a").join(os.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") =!= col("b.l_suppkey"))
      .groupBy(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (1000L + r.getLong(2) - 1) / r.getLong(2)))
    val nodes = edges.map(_._1).distinct.sorted
    val seeds = nodes.take(5)
    val adj = edges.groupBy(_._1).map { case (k, es) =>
      k -> es.map(e => (e._2, e._3))
    }
    val dist = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
    val pq = scala.collection.mutable.PriorityQueue(
      seeds.map(s0 => (0L, s0)): _*)(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (dv, v) = pq.dequeue()
      if (dist(v) == dv) adj.getOrElse(v, Array.empty[(Long, Long)])
        .foreach { case (u, w) =>
          if (dist.getOrElse(u, Long.MaxValue) > dv + w) {
            dist(u) = dv + w; pq.enqueue((dv + w, u))
          }
        }
    }
    val want = nodes.map(n => n -> dist.getOrElse(n, -1L)).toMap
    assert(got == want, s"SSSP must equal the reference Dijkstra\n$got\nvs\n$want")
    // the fixed 6-round contract covers the fixture diameter: one more
    // relaxation over the final distances changes nothing
    val more = edges.flatMap { case (s0, d0, w) =>
      want.get(s0).filter(_ >= 0).map(ds => d0 -> (ds + w))
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    more.foreach { case (n, relaxed) =>
      assert(want(n) >= 0 && want(n) <= relaxed,
        s"node $n: round 7 would still relax ($relaxed < ${want(n)})")
    }
    // weights matter: at least one node's weighted distance is NOT a
    // multiple of 500 (pure hop-counting would make them all w=500
    // only if every pair co-supplied exactly twice — the fixture
    // co-supply counts vary, so some shortest path uses a strong edge)
    assert(got.values.exists(v => v > 0 && v % 500 != 0),
      "some shortest path must use a non-default-weight edge")
  }

  test("co-supply basket bound: per-order supplier fan-out stays small (the collect_list skew guard)") {
    // the shared weighted-pair build (coSupplyWeighted) explodes each
    // order's distinct-supplier basket into ordered pairs MAP-SIDE —
    // quadratic in basket width, so a hot orderkey would blow it up
    // (guide §2.5). This pins the fixture's bound; if a data shape ever
    // breaks it, cap or salt the basket before the explode.
    val mx = graft.Tables.lineitem(spark, sf)
      .groupBy($"l_orderkey")
      .agg(countDistinct($"l_suppkey").as("n"))
      .agg(max($"n")).head().getLong(0)
    assert(mx <= 8,
      s"per-order supplier basket is $mx wide — the pair explode in " +
        "coSupplyWeighted/graphSssp assumes a bounded basket")
  }

  test("dq_schema_drift: verdicts classify added/removed/type-changed from footers alone") {
    val got = graft.operators.Analytics.dqSchemaDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == Set(
      ("o_orderkey", "bigint", "bigint", "unchanged"),
      ("o_totalprice", "double", "string", "type_changed"),
      ("o_orderpriority", "string", "-", "removed"),
      ("o_month", "-", "string", "added")))
  }

  test("ts_trend_test: S statistic replays pair-for-pair from the hourly series") {
    val got = graft.operators.Analytics.tsTrendTest(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    val series = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        org.apache.spark.sql.functions.date_trunc("hour", col("ts"))
          .as("hr"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr(
          "CAST(round(value * 100) AS BIGINT)")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .groupBy(_._1)
    series.foreach { case (et, rows) =>
      val vs = rows.sortBy(_._2).map(_._3)
      val pairs = for (i <- vs.indices; j <- i + 1 until vs.length)
        yield math.signum((vs(j) - vs(i)).toDouble).toLong
      val (nPairs, sStat, trend, tauBp) = got(et)
      assert(nPairs == pairs.length.toLong, s"$et pair count")
      assert(sStat == pairs.sum, s"$et S statistic")
      assert(trend ==
        (if (sStat > 0) "up" else if (sStat < 0) "down" else "flat"))
      assert(tauBp == math.abs(sStat) * 10000 / pairs.length)
    }
  }
}
