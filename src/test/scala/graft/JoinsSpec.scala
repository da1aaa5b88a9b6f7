package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

class JoinsSpec extends SparkSpec {

  test("join_broadcast plans both dims as BroadcastHashJoin") {
    val bhj = collectFinal(graft.operators.Joins.joinBroadcast(spark, sf)) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.size == 2, s"expected 2 broadcast joins, got ${bhj.size}")
  }

  test("join_sort_merge honours the merge hint") {
    val smj = collectFinal(graft.operators.Joins.joinSortMerge(spark, sf)) {
      case s: SortMergeJoinExec => s
    }
    assert(smj.nonEmpty, "merge hint must yield SortMergeJoin")
  }

  test("join_bucketed: the bucketed join itself has no shuffle exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val df = graft.operators.Joins.joinBucketed(spark, sf)
    // exchanges above the join (for the groupBy/orderBy) are expected;
    // the join inputs themselves must be exchange-free bucket scans
    val smj = collectFinal(df) { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "bucketed equi join should be a merge join")
    val shufflesUnderJoin = smj.head.collect { case e: ShuffleExchangeExec => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must not shuffle its inputs:\n${smj.head}")
  }

  test("join_dpp injects a dynamic partition pruning filter into the fact scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = graft.operators.Joins.joinDpp(spark, sf)
    val scans = collectFinal(df) { case s: FileSourceScanExec => s }
    val dynamic = scans.exists(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")))
    assert(dynamic,
      s"fact scan must carry a dynamicpruning partition filter:\n" +
        scans.map(_.partitionFilters).mkString("\n"))
  }

  test("q3/q10: top-k plans as TakeOrdered, filters pushed, exact rank key") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, TakeOrderedAndProjectExec}
    val q3 = graft.operators.Joins.q3ShippingPriority(spark, sf)
    // top-10 must be per-partition heaps + driver merge, never a global
    // sort of the aggregate (the 100 TB shape)
    assert(collectFinal(q3) { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "q3 top-10 should plan as TakeOrderedAndProject")
    // both selective predicates reach their parquet scans
    val pushed = collectFinal(q3) { case s: FileSourceScanExec =>
      s.metadata.getOrElse("PushedFilters", "")
    }.mkString(" ")
    assert(pushed.contains("l_shipdate") && pushed.contains("c_mktsegment"),
      s"q3 filters not pushed to scans: $pushed")
    // the displayed revenue is exactly cents/10⁴ — rank key and display
    // value cannot disagree
    q3.collect().foreach { r =>
      assert(r.getAs[Double]("revenue")
        == math.round(r.getAs[Long]("revenue_cents") / 10000.0 * 10000) / 10000.0)
    }
    val q10 = graft.operators.Joins.q10ReturnedItems(spark, sf)
    assert(collectFinal(q10) { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "q10 top-20 should plan as TakeOrderedAndProject")
    val rows = q10.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    // ranked output arrives ordered by the exact integer key
    val cents = rows.map(_.getAs[Long]("revenue_cents"))
    assert(cents.zip(cents.tail).forall { case (a, b) => a >= b })
    // q18: the selective HAVING leaves a tiny key set — AQE must flip
    // the orders/customer probes to broadcast joins at runtime
    val q18 = graft.operators.Joins.q18BigOrders(spark, sf)
    assert(collectFinal(q18) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "q18 post-aggregate joins should become broadcast under AQE")
    assert(collectFinal(q18) { case t: TakeOrderedAndProjectExec => t }.nonEmpty)
    q18.collect().foreach(r => assert(r.getAs[Long]("total_qty") > 300))
  }

  test("q7: nation arms broadcast, shipdate pushed, bilateral volume exact") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val q7 = graft.operators.Joins.q7VolumeShipping(spark, sf)
    q7.queryExecution.toRdd.count()
    val rows = q7.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sn, cn) = (r.getAs[String]("supp_nation"),
        r.getAs[String]("cust_nation"))
      assert(Set("NATION_3", "NATION_7")(sn) && Set("NATION_3", "NATION_7")(cn))
      assert(sn != cn, "same-nation pairs must be rejected")
      val y = r.getAs[Long]("l_year")
      assert(y == 1996 || y == 1997, s"year $y outside the ship window")
      assert(r.getAs[Long]("revenue_cents") > 0)
      assert(r.getAs[Double]("revenue")
        == math.round(r.getAs[Long]("revenue_cents") / 10000.0 * 10000) / 10000.0)
    }
    // the only fact-side predicate is the shipdate range — it must reach
    // the lineitem parquet scan, not sit in a post-scan Filter
    val pushed = collectFinal(q7) { case s: FileSourceScanExec =>
      s.metadata.getOrElse("PushedFilters", "")
    }.mkString(" ")
    assert(pushed.contains("l_shipdate"),
      s"q7 shipdate range not pushed to the fact scan: $pushed")
    // both nation-tagged dim arms (and supplier) reach the fact through
    // broadcast joins — the tiny-dim ×2 self-joined-dimension shape
    val bhj = collectFinal(q7) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 3,
      s"supplier/nation arms should broadcast, found ${bhj.size}")
  }

  test("q19: hull pushdown is output-invariant, part side broadcasts") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    val q19 = graft.operators.Joins.q19Disjunctive(spark, sf)
    q19.queryExecution.toRdd.count()
    val got = q19.collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("revenue_cents"))).toMap
    // the manually-pushed hull ranges are implied by the disjunction:
    // recompute WITHOUT any hull pre-filter and require identity
    val cents = expr("cast(round(l_extendedprice * 100) as bigint)") *
      (lit(100L) - expr("cast(round(l_discount * 100) as bigint)"))
    val plain = Tables.lineitem(spark, sf).select(col("l_partkey"),
        col("l_quantity"), cents.as("cents"))
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11))
        || (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
          && col("l_quantity").between(10, 20))
        || (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
          && col("l_quantity").between(20, 30)))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("rc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == plain, s"hull pushdown changed the result: $got vs $plain")
    // the quantity hull must reach the lineitem parquet scan
    val pushed = collectFinal(q19) { case s: FileSourceScanExec =>
      s.metadata.getOrElse("PushedFilters", "")
    }.mkString(" ")
    assert(pushed.contains("l_quantity"),
      s"q19 quantity hull not pushed to the fact scan: $pushed")
    // the hull-filtered part side is dim-sized and must broadcast
    val bhj = collectFinal(q19) { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, "filtered part side should broadcast")
  }

  test("join_interval_overlap: day bucketing finds each true pair once, no BNLJ") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = graft.operators.Joins.joinIntervalOverlap(spark, sf)
    df.queryExecution.toRdd.count()
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the overlap join must be an equi-join on the day bucket with the
    // interval predicate as residual — never a nested-loop over pairs
    val bnlj = collectFinal(df) { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnlj.isEmpty, "interval overlap must not plan a BNLJ")
    // reconcile against a local brute-force pair scan
    val sess = graft.operators.Analytics.tsSessionize(spark, sf)
      .select($"user_id", unix_micros($"session_start"),
        unix_micros($"session_end"))
      .as[(Long, Long, Long)].collect()
    val dayUs = 86400L * 1000000L
    val d0 = sess.map(_._2).min / dayUs * dayUs
    val d1 = sess.map(_._3).max / dayUs * dayUs
    val brute = (d0 to d1 by dayUs).flatMap { day =>
      val (ws, we) = (day + 8L * 3600 * 1000000L, day + 12L * 3600 * 1000000L)
      val hits = sess.filter { case (_, ss, se) => ws <= se && ss < we }
      if (hits.isEmpty) None
      else Some(day -> (hits.length.toLong,
        hits.map { case (_, ss, se) =>
          (math.min(se, we) - math.max(ss, ws)) / 1000000L }.sum))
    }.toMap
    val got = rows.map(r =>
      (r.getTimestamp(0).getTime * 1000L) ->
        (r.getAs[Long]("n_overlaps"), r.getAs[Long]("overlap_sec_mass"))).toMap
    assert(got == brute, s"got $got\nbrute $brute")
  }

  test("join_salted equals the unsalted join") {
    import org.apache.spark.sql.functions._
    val salted = graft.operators.Joins.joinSalted(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, _)) => assert(n == plain(k)) }
  }

  test("runtime bloom filter is injected on the fact side") {
    val df = graft.operators.Joins.joinRuntimeFilter(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "InjectRuntimeFilter must add a bloom probe to the fact scan side")
  }

  test("outer joins preserve unmatched sides") {
    val left = graft.operators.Joins.joinLeft(spark, sf)
    // every customer appears at least once
    assert(left.select("c_custkey").distinct().count() == 150)
    val semi = graft.operators.Joins.joinLeftSemi(spark, sf).count()
    val anti = graft.operators.Joins.joinLeftAnti(spark, sf).count()
    assert(semi + anti == 150) // semi ⊎ anti partitions customers
  }

  test("join_pit: every fact matches exactly one version, keyed join (no BNLJ)") {
    val df = graft.operators.Joins.joinPit(spark, sf)
    val r = df.collect().head
    val nOrders = graft.Tables.orders(spark, sf).count()
    // the half-open interval partition ⇒ exactly one version per fact
    assert(r.getAs[Long]("n_matched") == nOrders)
    assert(r.getAs[Long]("n_facts_matched") == nOrders)
    assert(r.getAs[Long]("n_self_version") <= nOrders)
    assert(r.getAs[Long]("n_versions_used") <= nOrders)
    // the interval predicate must ride a KEYED join as a residual, never
    // a nested-loop over the cross space
    val bnlj = collectFinal(df) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnlj.isEmpty, "point-in-time join degenerated to BNLJ")
  }

  test("join_nullsafe: NULL keys match each other and stay a hash join") {
    val rows = graft.operators.Joins.joinNullSafe(spark, sf).collect()
      .map(r => r.getAs[Long]("key_or_sentinel") -> r).toMap
    // the nullif'd class (nationkey 13) must SURVIVE the join as the
    // sentinel row — a plain = join would drop it
    assert(rows.contains(-1L), "null-safe join must keep the NULL key row")
    assert(rows(-1L).getAs[Boolean]("nullsafe_only"))
    assert(rows(-1L).getAs[Long]("n_cust") > 0 &&
      rows(-1L).getAs[Long]("n_supp") > 0)
    assert(rows.keySet.filter(_ >= 0).forall(k =>
      !rows(k).getAs[Boolean]("nullsafe_only")))
    // plan: EqualNullSafe keys must NOT fall back to a nested loop
    val bnlj = collectFinal(graft.operators.Joins.joinNullSafe(spark, sf)) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnlj.isEmpty, "null-safe equi-join degenerated to BNLJ")
  }

  test("join_lateral: decorrelated to a ranked join; equals the window form") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val out = graft.operators.Joins.joinLateral(spark, sf).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Double]("o_totalprice"))).toSet
    // the hand-written top-2-per-group composition the lateral must equal
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = graft.Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 2)
      .join(graft.Tables.customer(spark, sf)
          .where(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Double]("o_totalprice"))).toSet
    assert(out == want)
    // decorrelation: no nested loop in the final plan
    val bnlj = collectFinal(graft.operators.Joins.joinLateral(spark, sf)) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnlj.isEmpty, "lateral subquery must decorrelate, not nested-loop")
  }

  test("join_skew_aqe: the runtime skew split fires and results are split-invariant") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Joins.joinSkewAqe(spark, sf)
    // executed adaptive plan must carry the skew-marked sort-merge join
    val skewed = collectFinal(df) {
      case j: SortMergeJoinExec if j.isSkewJoin => j
    }
    assert(skewed.nonEmpty,
      "OptimizeSkewedJoin must mark the SMJ isSkewJoin on the planted hot key")
    // results are identical with the optimization OFF (the point of the
    // demo: the split is a pure runtime re-plan, never a semantics change)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val li = graft.Tables.lineitem(s2, sf)
      .select(col("l_orderkey"), col("l_quantity"))
    val hot = li.where(col("l_orderkey") === 1)
      .withColumn("__i", explode(expr("sequence(1, 20000)")))
      .withColumn("pay", col("__i") * lit(1000003L) % lit(1000000007L))
      .drop("__i")
    val fact = li.where(col("l_orderkey") =!= 1)
      .withColumn("pay", lit(0L)).unionByName(hot)
    val want = fact.join(
        graft.Tables.orders(s2, sf).select(col("o_orderkey"), col("o_orderstatus")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("bigint").as("sum_qty"),
        sum(col("pay")).as("sum_pay"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.nonEmpty && got == want, s"$got vs $want")
  }

  test("join_spatial_radius: cell-binned join equals the brute O(N²) local replay, plans an equi-join") {
    val got = graft.operators.Joins.joinSpatialRadius(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // brute replay over the same deterministic lattice
    def mix(i: Long, salt: Long): Long = {
      val m = 4294967296L
      var h = (i * 2654435761L + salt) % m
      h ^= h >> 16
      h = (h * 1540483477L) % m
      h ^= h >> 13
      h % 10000L
    }
    val pts = graft.Tables.customer(spark, sf)
      .select(org.apache.spark.sql.functions.col("c_custkey")).collect().map(_.getLong(0))
      .map(id => (id, mix(id, 17L), mix(id, 91L)))
    val want = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia != ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= 40000L
    } yield (ia, ib, d2))
      .groupBy(_._1)
      .map { case (id, nbs) =>
        id -> (nbs.size.toLong, nbs.map(_._3).sum, nbs.map(_._2).min)
      }
    assert(want.nonEmpty, "fixture must have at least one close pair")
    assert(got == want, s"cell join diverges from brute: " +
      s"${got.size} vs ${want.size} points with neighbors")
    // the plan must be the cell equi-join — never a distance cross join
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    val bad = collectFinal(graft.operators.Joins.joinSpatialRadius(spark, sf)) {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    assert(bad.isEmpty, "spatial join must bin, not cross")
  }

  test("join_asof_tolerance: stale matches null out, fresh ones keep the exact gap") {
    import org.apache.spark.sql.functions.{col => c}
    val got = graft.operators.Joins.joinAsofTolerance(spark, sf).collect()
      .map(r => r.getLong(1) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
      .toMap
    val ev = graft.Tables.events(spark, sf)
      .select(c("user_id"), c("event_id"), c("event_type"),
        org.apache.spark.sql.functions.expr("unix_micros(ts)").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val tol = 86400000000L
    val clicks = ev.filter(_._3 == "click")
    val purch = ev.filter(_._3 == "purchase")
    val want = clicks.map { case (u, eid, _, us) =>
      val prior = purch.filter(p => p._1 == u && p._4 <= us)
      // most recent purchase; ties (same µs) break on higher event_id
      // (the window orders by (ts, is_left, event_id) and takes last)
      val best = prior.sortBy(p => (p._4, p._2)).lastOption
      best match {
        case Some(p) if us - p._4 <= tol =>
          eid -> (Some(p._2), Some(us - p._4), true)
        case _ => eid -> (None, None, false)
      }
    }.toMap
    assert(got == want, s"${got.size} vs ${want.size} clicks")
    // the tolerance must actually bite on the fixture: some clicks have
    // a preceding purchase that is too old, and some match fresh
    assert(got.values.exists(_._3) && got.values.exists(v =>
      !v._3 && clicks.nonEmpty), "fixture must exercise both branches")
  }

  test("join_spatial_knn: top-3 within R equals the brute ranked replay") {
    val got = graft.operators.Joins.joinSpatialKnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    def mix(i: Long, salt: Long): Long = {
      val m = 4294967296L
      var h = (i * 2654435761L + salt) % m
      h ^= h >> 16
      h = (h * 1540483477L) % m
      h ^= h >> 13
      h % 10000L
    }
    val pts = graft.Tables.customer(spark, sf)
      .select(org.apache.spark.sql.functions.col("c_custkey"))
      .collect().map(_.getLong(0))
      .map(id => (id, mix(id, 17L), mix(id, 91L)))
    val want = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia != ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= 40000L
    } yield (ia, ib, d2))
      .groupBy(_._1)
      .toSeq
      .flatMap { case (id, nbs) =>
        nbs.sortBy(t => (t._3, t._2)).take(3).zipWithIndex
          .map { case ((_, rid, d2), i) => (id, i + 1) -> (rid, d2) }
      }.toMap
    assert(want.nonEmpty && got == want,
      s"knn diverges: ${got.size} vs ${want.size} ranked rows")
  }

  test("join_exchange_reuse: one shuffle materializes, the second branch reuses it") {
    val df = graft.operators.Joins.joinExchangeReuse(spark, sf)
    // the reuse claim: the per-customer aggregate's exchange is planned
    // once; the second segment branch consumes it as a reuse node
    val reused = collectFinal(df) {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }
    assert(reused.nonEmpty, "second branch must be a ReusedExchange")
    val shuffles = collectFinal(df) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size == 1,
      s"exactly one real shuffle must materialize, saw ${shuffles.size}")
    // and exactly one scan of orders feeds it (reuse starts at the scan)
    val scans = collectFinal(df) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1, s"one scan must serve both branches: ${scans.size}")
    // row semantics vs a local replay of both segments
    import org.apache.spark.sql.functions.{col, count, expr, lit, sum}
    val t = graft.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = t.filter(_._2 >= 10).map(x => (x._1, "frequent", x._2, x._3)) ++
      t.filter(_._3 >= 500000000L).map(x => (x._1, "big", x._2, x._3))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
  }

  test("join_broadcast_aqe: runtime sizes demote the static shuffle join to broadcast") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.functions.{col, count, expr, lit, max, sum}
    val df = graft.operators.Joins.joinBroadcastAqe(spark, sf)
    val bhj = collectFinal(df) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty,
      "AQE must demote at least one join to broadcast from runtime sizes")
    // the control: same query, adaptive off — the static planner (with
    // broadcast estimation disabled, the stale-stats stand-in) must
    // keep shuffle joins
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val custByNation = graft.Tables.customer(s2, sf)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("bal_cents"))
    val ctrl = graft.Tables.orders(s2, sf)
      .join(graft.Tables.customer(s2, sf)
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(custByNation, "c_nationkey")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("n_cust")).as("n_cust"),
        max(col("bal_cents")).as("bal_cents"))
    val ctrlJoins = ctrl.queryExecution.executedPlan.collect {
      case j: SortMergeJoinExec => j: org.apache.spark.sql.execution.SparkPlan
      case j: ShuffledHashJoinExec => j
      case j: BroadcastHashJoinExec => j
    }
    assert(ctrlJoins.nonEmpty &&
      !ctrlJoins.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "static planner with estimation off must not broadcast")
    // demotion must be result-invisible
    def key(r: org.apache.spark.sql.Row) =
      (r.get(0).asInstanceOf[Number].longValue, r.getLong(1),
        r.getLong(2), r.getLong(3))
    assert(df.collect().map(key).toSet == ctrl.collect().map(key).toSet)
  }

  test("join_asof_forward: each click gets the NEXT purchase at-or-after, per user") {
    import org.apache.spark.sql.functions.col
    val got = graft.operators.Joins.joinAsofForward(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val ev = graft.Tables.events(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        org.apache.spark.sql.functions.unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    var checked = 0
    byUser.foreach { case (u, rows) =>
      val purchases = rows.filter(_._3 == "purchase").sortBy(r => (r._4, r._2))
      rows.filter(_._3 == "click").foreach { case (_, eid, _, t) =>
        val want = purchases.find(_._4 >= t).map(_._2).getOrElse(-1L)
        assert(got((u, eid)) == want, s"user $u click $eid")
        checked += 1
      }
    }
    assert(checked > 100, s"too few clicks checked: $checked")
    // forward and backward disagree somewhere (distinct semantics)
    val back = graft.operators.Joins.joinAsof(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got != back, "forward must differ from backward on this data")
  }
}
