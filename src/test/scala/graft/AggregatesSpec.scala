package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.aggregate.HashAggregateExec

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("agg_hash exact values on a literal 6-row lineitem") {
    val li = Seq(
      // (flag, status, qty, price, discount, shipdate)
      ("A", "F", 10.0, 100.0, 0.10, "1998-01-01 00:00:00"),
      ("A", "F", 20.0, 200.0, 0.20, "1998-01-02 00:00:00"),
      ("N", "O", 5.0, 50.0, 0.00, "1998-01-03 00:00:00"),
      ("N", "O", 15.0, 150.0, 0.10, "1998-01-04 00:00:00"),
      ("R", "F", 30.0, 300.0, 0.05, "1998-01-05 00:00:00"),
      ("R", "F", 1.0, 10.0, 0.00, "2002-01-01 00:00:00") // filtered out
    ).toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
      "l_discount", "ship")
      .withColumn("l_shipdate", $"ship".cast("timestamp")).drop("ship")
    li.write.mode("overwrite").parquet("/tmp/graft-test/lineitem.parquet")

    val got = graft.operators.Aggregates.aggHash(spark, "/tmp/graft-test").collect()
    assert(got.toSeq == Seq(
      Row("A", "F", 30.0, 300.0, 250.0, 15.0, 0.15, 2L),
      Row("N", "O", 20.0, 200.0, 185.0, 10.0, 0.05, 2L),
      Row("R", "F", 30.0, 300.0, 285.0, 30.0, 0.05, 1L)))
  }

  test("agg_hash plans as partial+final HashAggregate") {
    val df = graft.operators.Aggregates.aggHash(spark, sf)
    val plan = df.queryExecution.sparkPlan
    assert(plan.collect { case h: HashAggregateExec => h }.size >= 2)
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct stays within the configured 2% rsd (5% bound)") {
    import org.apache.spark.sql.functions._
    val approx = graft.operators.Aggregates.aggApproxDistinct(spark, sf).head
    val exact = Tables.lineitem(spark, sf).agg(
      countDistinct(col("l_partkey")).as("p"),
      countDistinct(col("l_orderkey")).as("o")).head
    def relErr(a: Long, e: Long): Double = math.abs(a - e).toDouble / e
    assert(relErr(approx.getLong(0), exact.getLong(0)) < 0.05)
    assert(relErr(approx.getLong(1), exact.getLong(1)) < 0.05)
  }

  test("hll sketch partials merge to a near-exact distinct estimate") {
    import org.apache.spark.sql.functions._
    val est = graft.operators.Aggregates.aggSketchPartial(spark, sf)
      .head.getLong(0)
    val exact = Tables.orders(spark, sf)
      .agg(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"sketch estimate $est vs exact $exact")
  }

  test("agg_every_any: quantifiers reconcile with their exact counts") {
    val rows = graft.operators.Aggregates.aggEveryAny(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("some_deep_discount")
        == (r.getAs[Long]("n_deep_discount") > 0))
      assert(r.getAs[Boolean]("some_returned")
        == (r.getAs[Long]("n_returned") > 0))
      assert(r.getAs[Long]("n_deep_discount") <= r.getAs[Long]("n_lines"))
    }
    // the fixture's l_quantity is bounded at 50 -> every() must hold
    assert(rows.forall(_.getAs[Boolean]("all_qty_bounded")))
  }

  test("agg_bitmap: bitmap distinct equals exact distinct, buckets cover the key range") {
    val rows = graft.operators.Aggregates.aggBitmap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("ndv_bitmap") == r.getAs[Long]("ndv_exact"))
      assert(r.getAs[Long]("n_buckets") >= 1)
    }
  }

  test("bitmap_and kernel + exact segment overlap vs distinct-intersect witness") {
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    // kernel truth: byte-wise AND, result = min length, null propagates
    val r = spark.sql("SELECT bitmap_and(X'F0FF03', X'0FF0') AS x")
      .collect().head.getAs[Array[Byte]]("x")
    assert(r.toSeq == Seq(0x00.toByte, 0xF0.toByte), r.toSeq.toString)
    assert(spark.sql("SELECT bitmap_and(CAST(NULL AS BINARY), X'00') AS x")
      .collect().head.isNullAt(0))
    // the op equals the exact distinct-intersection computed in-plane
    val got = graft.operators.Aggregates.aggBitmapIntersect(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val d = Tables.orders(spark, sf)
      .select(col("o_orderstatus").as("st"), col("o_custkey").as("k"))
      .distinct()
    val want = d.as("a").join(d.as("b"),
        col("a.k") === col("b.k") && col("a.st") < col("b.st"))
      .groupBy(col("a.st"), col("b.st")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got == want, s"$got vs $want")
  }

  test("count-min sketch: estimates dominate exact counts within the CMS bound") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Aggregates.aggCmsFreq(spark, sf).collect()
    assert(rows.length == 20)
    val total = Tables.documents(spark, sf)
      .select(explode(expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .count()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("est_cnt")
      // CMS guarantee: never under; Markov slack per row is N/w in
      // expectation and the min over d=4 rows lands far below 16× that
      // (P[all 4 rows ≥ 16·N/w] ≲ 16⁻⁴ per probe — deterministic here)
      assert(est >= exact, s"CMS must never underestimate: $r")
      assert(est - exact <= total / 64,
        s"overestimate ${est - exact} beyond 16·N/w bound (N=$total): $r")
    }
  }

  test("two-phase bucketed quantile equals the single-pass exact percentile") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Aggregates.aggQuantileBucketed(spark, sf)
      .collect().head
    // ground truth: full sort, k(q) = ceil(q·n) (quantile_disc's
    // cume_dist rank), 1-based → 0-based index ceil(q·n) − 1
    val vals = Tables.lineitem(spark, sf).select(col("l_extendedprice"))
      .collect().map(_.getDouble(0)).sorted
    def kth(q10: Int) = vals((q10 * vals.length + 9) / 10 - 1)
    assert(got.getLong(0) == vals.length)
    assert(got.getDouble(1) == kth(5), s"median ${got.getDouble(1)} != ${kth(5)}")
    assert(got.getDouble(2) == kth(9), s"p90 ${got.getDouble(2)} != ${kth(9)}")
  }

  test("grouped bucketed quantile equals a per-group full-sort ground truth") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Aggregates.aggQuantileGrouped(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("quantile"))).toMap
    val byG = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getDouble(1)).sorted }
    assert(got.keySet == byG.keySet.flatMap(g => Seq((g, 50), (g, 90))))
    byG.foreach { case (g, vals) =>
      // ceil(q·n) − 1, 0-based: quantile_disc's cume_dist rank
      def kth(q: Int) = vals((q * vals.length + 99) / 100 - 1)
      assert(got((g, 50)) == ((vals.length.toLong, kth(50))), s"$g p50")
      assert(got((g, 90)) == ((vals.length.toLong, kth(90))), s"$g p90")
    }
  }

  test("heavy hitters: exact under adversarial partitionings (MG superset)") {
    import org.apache.spark.sql.functions._
    // Zipf-ish skew: token i repeats (50-i)^2 times, i=0..49, plus a
    // long tail of 4000 singletons that must NOT reach the shuffle in
    // pass 2 and must never displace a true heavy hitter in pass 1.
    val heavy = (0 until 50).flatMap(i => Seq.fill((50 - i) * (50 - i))(s"h$i"))
    val tail = (0 until 4000).map(i => s"t$i")
    val all = heavy ++ tail
    val exact = {
      val n = all.size
      all.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * 20 >= n }
        .toSeq.sortBy { case (t, c) => (-c, t) }
    }
    for (parts <- Seq(1, 7, 32)) {
      // sort so one partition concentrates the tail — the worst case
      // for counter eviction — and also try hash-scattered order
      val sorted = all.sorted.toDF("tok").repartition(parts)
      val scattered = scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).shuffle(all).toDF("tok")
        .repartition(parts)
      for (toks <- Seq(sorted, scattered)) {
        val got = graft.operators.Aggregates.heavyHitters(toks, 20)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(got == exact, s"parts=$parts")
      }
    }
  }

  test("heavy hitters: hot-key skew never reaches the shuffle (partial-agg immunity)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    // plant one key carrying HALF of a 400k-token stream — the shape
    // that melts a skew-naive groupBy (one reducer owns the hot key's
    // raw rows). The recount is skew-immune BY partial aggregation:
    // each map task collapses the hot key to ONE partial count before
    // the exchange, so the shuffle carries ≤ |cands|·partitions rows
    // whatever the key distribution (VERDICT r12 task 8 — the
    // aggregate-side twin of join_skew_aqe's AQE split)
    val hot = Seq.fill(200000)("hotkey")
    val rest = (0 until 200000).map(i => s"k${i % 997}")
    val toks = (hot ++ rest).toDF("tok").repartition(32)
    val df = graft.operators.Aggregates.heavyHitters(toks, 20)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows("hotkey") == 200000L, s"hot key count exact: $rows")
    // measured: the partial (pre-shuffle) aggregate emitted at most
    // cands×partitions rows — 400k input rows never crossed the wire
    val partials = collectFinal(df) {
      case h: HashAggregateExec
          if h.aggregateExpressions.exists(_.mode ==
            org.apache.spark.sql.catalyst.expressions.aggregate.Partial) &&
            h.aggregateExpressions.exists(_.aggregateFunction.prettyName
              == "count") => h
    }
    assert(partials.nonEmpty, "recount must plan a partial hash aggregate")
    val emitted = partials.map(_.metrics("numOutputRows").value).min
    assert(emitted <= 401L * 32,
      s"partial agg must collapse the hot key map-side, emitted $emitted")
    assert(emitted < 400000L / 10,
      s"shuffle mass must be candidate-bounded, not row-bounded: $emitted")
  }

  test("agg_histogram_equidepth: matches the sorted local replay, depths near-balanced") {
    val got = graft.operators.Aggregates.aggHistogramEquidepth(spark, sf)
      .collect()
      .map(r => r.getAs[Int]("bucket").toLong ->
        (r.getAs[Long]("n"), r.getAs[Double]("lo"), r.getAs[Double]("hi")))
      .toMap
    // local replay: exact order statistics at rank ceil(i·n/8)
    val vs = Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.col("l_extendedprice"))
      .collect().map(_.getDouble(0)).sorted
    val n = vs.length
    val bounds = (1 to 7).map(i => vs(((i.toLong * n + 7) / 8).toInt - 1))
    def rnd(x: Double) = math.round(x * 10000.0) / 10000.0
    val want = vs.groupBy(v => bounds.count(_ < v).toLong)
      .map { case (b, xs) => b -> (xs.length.toLong, rnd(xs.min), rnd(xs.max)) }
    assert(got == want, s"equi-depth diverges from replay")
    assert(got.values.map(_._1).sum == n)
    // boundaries partition the VALUE axis: bucket hi ≤ next bucket lo
    val ord = got.toSeq.sortBy(_._1).map(_._2)
    ord.zip(ord.tail).foreach { case ((_, _, hi), (_, lo, _)) =>
      assert(hi <= lo, "buckets must not overlap on the value axis")
    }
    // near-balanced on a mostly-distinct column: each depth within 2×
    // of the ideal n/8 (duplicates may legitimately skew; the fixture
    // price column is fine-grained enough not to)
    got.values.map(_._1).foreach(c =>
      assert(c <= 2 * n / 8 && c >= n / 16, s"depth $c vs ideal ${n / 8}"))
  }

  test("agg_mv_stale_compensate: delta filter reaches the scan, merged result equals the full rollup") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.{col, count, lit, round, sum}
    val df = graft.operators.Aggregates.aggMvStaleCompensate(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSeq
    // the delta side's HW predicate must be a pushed data filter on the
    // lineitem scan (the 20%-of-corpus freshness claim)
    val scans = collectFinal(df) { case f: FileSourceScanExec => f }
    val liScan = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("lineitem")))
    assert(liScan.nonEmpty, "the delta side must scan the base table")
    assert(liScan.forall(_.dataFilters.mkString.contains("l_orderkey")),
      s"HW predicate must push to the scan: ${liScan.map(_.dataFilters)}")
    // the HW slice itself is the minority of the table (the claim the
    // pushed filter + a key-clustered layout turn into skipped row
    // groups at scale; the single-row-group fixture can't skip, so the
    // scan metric is not the witness here — the predicate is)
    val total = graft.Tables.lineitem(spark, sf).count()
    val hw = graft.Tables.lineitem(spark, sf)
      .agg(org.apache.spark.sql.functions.expr("max(l_orderkey) * 4 div 5"))
      .head.getLong(0)
    val deltaRows = graft.Tables.lineitem(spark, sf)
      .where(col("l_orderkey") >= hw).count()
    assert(deltaRows < total / 2,
      s"the delta must be the table's minority ($deltaRows of $total)")
    // stale MV + delta compensation equals the fresh full rollup
    val want = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).cast("bigint").as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(got == want, "compensated read must equal the fresh rollup")
  }

  test("agg_sample_block: 1/8 stratum estimates land within sampling error, arithmetic identities hold") {
    val rows = graft.operators.Aggregates.aggSampleBlock(spark, sf).collect()
    assert(rows.length == 3, "one row per returnflag")
    rows.foreach { r =>
      val (nEx, nEst, nErr) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (qEx, qEst, qErr) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nEst % 8 == 0, "count estimate is 8x an integer sample count")
      assert(nErr == math.abs(nEst - nEx) * 10000 / nEx, "exact bp identity")
      assert(qErr == math.abs(qEst - qEx) * 10000 / qEx, "exact bp identity")
      // ~250-row per-group samples: 1/sqrt(n) noise is ~600 bp; 1500 is
      // a 2.5-sigma bound on the FIXED stratum (deterministic, not flaky)
      assert(nErr < 1500 && qErr < 1500,
        s"estimate drifted beyond sampling error: $r")
      assert(nEst > 0 && qEst > 0, "stratum must be populated per group")
    }
  }

  test("agg_aqe_coalesce: runtime coalescing merges reducers below the static count") {
    val df = graft.operators.Aggregates.aggAqeCoalesce(spark, sf)
    val static = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val reads = collectFinal(df) {
      case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec => r
    }
    assert(reads.nonEmpty, "final plan must carry an AQE shuffle read")
    assert(reads.exists(r => r.partitionSpecs.length < static),
      s"coalescer must merge below the static $static: " +
        reads.map(_.partitionSpecs.length).mkString(","))
    // coalescing must be result-invisible: replay with AQE off
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    val want = graft.operators.Aggregates.aggAqeCoalesce(s2, sf)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val got = df.collect().map(r => (r.getTimestamp(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet
    assert(got == want && got.nonEmpty)
  }
}
