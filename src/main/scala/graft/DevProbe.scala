package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only stage-timing probe (not part of the driver contract): times
  * named SparkEntry queries and prints their final adaptive plans, to
  * localize where wall-clock goes before optimizing. Usage:
  *   runMain graft.DevProbe <sfDir> <name> [name...]
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev-only A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" applies session
    // confs before probing, to measure a knob without touching Bench
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { kvs =>
      // a malformed '=v' entry passes a bare contains('=') filter and
      // calls conf.set("", v) (ADVICE r17) — demand a non-empty key
      kvs.split(';')
        .filter(kv => kv.contains('=') && kv.takeWhile(_ != '=').trim.nonEmpty)
        .foreach { kv =>
          val Array(k, v) = kv.split("=", 2)
          spark.conf.set(k.trim, v.trim)
        }
    }
    // recursive-CTE depth probe (r11, VERDICT r10 task 8): a synthetic
    // countdown chain at fixed frontier WIDTH and growing DEPTH — each
    // UnionLoop level is one driver-coordinated distributed step, so
    // wall time should grow ~linearly in depth with a per-level barrier
    // cost; that per-level constant is the number that decides when the
    // O(log n) checkpointed StarContraction loop must replace a
    // recursive CTE as the fixpoint engine.
    if (names == Seq("cte_depth")) {
      val width = 20000
      spark.range(width).createOrReplaceTempView("graft_cte_seeds")
      Seq(8, 16, 64, 128, 256).foreach { depth =>
        spark.conf.set("spark.sql.cteRecursionLevelLimit", depth + 10)
        // default row guard is 1e6 accumulated rows; the deep tiers
        // legitimately carry width·depth rows
        spark.conf.set("spark.sql.cteRecursionRowLimit", 20000000)
        (1 to 2).foreach { run =>
          val t0 = System.nanoTime()
          val r = spark.sql(
            s"""WITH RECURSIVE walk AS (
               |  SELECT id AS nk, CAST($depth AS BIGINT) AS cur
               |  FROM graft_cte_seeds
               |  UNION ALL
               |  SELECT nk, cur - 1 FROM walk WHERE cur > 0)
               |SELECT CAST(count(*) AS BIGINT) AS n,
               |       CAST(sum(cur) AS BIGINT) AS s
               |FROM walk""".stripMargin).collect().head
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[cte] depth=$depth%4d run$run rows=${r.getLong(0)}%10d " +
            f"${sec}%6.2f s  per-level=${sec / depth}%.4f s")
        }
      }
      spark.stop(); return
    }
    if (names == Seq("bloom_debug")) {
      val df = operators.Joins.joinRuntimeFilter(spark, sfDir)
      println("=== optimized ===")
      println(df.queryExecution.optimizedPlan.toString.take(4000))
      df.collect()
      println("=== executed ===")
      println(df.queryExecution.executedPlan.toString.take(4000))
      spark.stop(); return
    }
    // ad-hoc sub-plan bisection: -parts <sfDir> times decontaminate stages
    if (names == Seq("decon_parts")) {
      import org.apache.spark.sql.functions._
      val grams8 =
        """CASE WHEN size(toks) >= 8 THEN
          |  array_distinct(transform(sequence(1, size(toks) - 7),
          |    i -> xxhash64(concat_ws(' ', slice(toks, i, 8)))))
          |ELSE array() END""".stripMargin
      def t(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val n = df.queryExecution.toRdd.count()
          println(f"[part] $tag run$i: $n rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("gs", expr(grams8))
        .select(col("doc_id"), col("gs"))
      t("gs_only")(docs)
      val isEval = pmod(col("doc_id"), lit(20)) === 7
      t("train_distinct")(docs.where(!isEval).select(explode(col("gs")).as("g")).distinct())
      t("eval_explode")(docs.where(isEval).select(col("doc_id"), explode(col("gs")).as("g")))
      val trainGrams = docs.where(!isEval).select(explode(col("gs")).as("g")).distinct()
      t("semi_join")(docs.where(isEval).select(col("doc_id"), explode(col("gs")).as("g"))
        .join(trainGrams, Seq("g"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit")))
      spark.stop(); return
    }
    // co-supply adjacency build bisection on an N× disjoint clone —
    // localizes the r9 probe finding (graph_degree_dist 188.9 s at 30×
    // is the shared adjacency build, not the 1-row-per-node audit)
    if (names.headOption.contains("adj_parts")) {
      import org.apache.spark.sql.functions._
      val copies = names.drop(1).headOption.map(_.toInt).getOrElse(30)
      val out = "/tmp/graft_adj_probe"
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .withColumn("k", explode(lit((0 until copies).toArray)))
        .select((col("l_orderkey") * copies + col("k")).as("l_orderkey"),
          (col("l_suppkey") * copies + col("k")).as("l_suppkey"))
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      def t(tag: String)(df: DataFrame): Unit = {
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val n = df.queryExecution.toRdd.count()
          println(f"[part] $tag run$i: $n rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
      val li = spark.read.parquet(s"$out/lineitem.parquet")
      t("scan")(li)
      val sups = li.groupBy(col("l_orderkey"))
        .agg(array_distinct(collect_list(col("l_suppkey"))).as("sups"))
      t("collect_sups")(sups)
      val pairs = sups.select(explode(col("sups")).as("src"), col("sups"))
        .select(col("src"), explode(col("sups")).as("dst"))
        .where(col("src") =!= col("dst"))
      t("pairs")(pairs)
      val edges = pairs.groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 2)
      t("edges")(edges)
      val adj = edges.groupBy(col("src").as("id"))
        .agg(sort_array(collect_list(col("dst").cast("long"))).as("nbrs"),
          count(lit(1)).as("deg"))
      t("adjacency")(adj)
      spark.stop(); return
    }
    // fingerprint stage bisection on a 10× synthetic corpus
    if (names == Seq("fp_parts")) {
      import org.apache.spark.sql.functions._
      val out = "/tmp/graft_fp_probe"
      spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("k", explode(lit((0 until 10).toArray)))
        .select((col("doc_id") * 10 + col("k")).as("doc_id"),
          when(col("k") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" v"), col("k"))).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      def t(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val n = df.queryExecution.toRdd.count()
          println(f"[part] $tag run$i: $n rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
      val fpOnly = operators.LlmExtended.fingerprintFpOnly(spark, out)
      t("fp_only")(fpOnly)
      t("full_window")(SparkEntry.queries("llm_fingerprint")(spark, out))
      spark.stop(); return
    }
    if (names == Seq("jac_parts")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      GraftExtensions.register(spark)
      def t(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val n = df.queryExecution.toRdd.count()
          println(f"[part] $tag run$i: $n rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
      val os = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = os.as("a").join(os.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey")
            && col("a.l_suppkey") =!= col("b.l_suppkey"))
        .groupBy(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
        .select(col("src"), col("dst"))
      t("edges")(edges)
      val t0 = System.nanoTime()
      val adj = edges
        .groupBy(col("src").as("id"))
        .agg(sort_array(collect_list(col("dst").cast("long"))).as("nbrs"),
          count(lit(1)).as("deg"))
        .localCheckpoint()
      println(f"[part] adj+ckpt: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t("pairs")(adj.as("a").join(broadcast(adj.as("b")), col("a.id") < col("b.id"))
        .select(col("a.id").as("u"), col("b.id").as("v"),
          expr("cast(sorted_intersect_count(a.nbrs, b.nbrs) as bigint)").as("common"),
          col("a.deg").as("du"), col("b.deg").as("dv"))
        .where(col("common") >= 2))
      spark.stop(); return
    }
    // streaming boot-floor bisection: minimal queries on the same
    // derived session StreamIO uses, to localize the per-query cost
    if (names == Seq("stream_floor")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.Trigger
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "2")
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      val src = java.nio.file.Files.createTempDirectory("floor_src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        src.resolve("events.parquet"))
      val schema = ss.read.parquet(src.toString).schema
      def run(tag: String)(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
          mode: String): Unit = (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val name = s"floor_${tag}_$i"
        val in = ss.readStream.schema(schema).parquet(src.toString)
          .transform(graft.Tables.normalizeTs)
        val q = build(in).writeStream.format("memory").queryName(name)
          .outputMode(mode)
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("floor_ck").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(120000L)
        val n = ss.table(name).count()
        println(f"[floor] $tag run$i: $n rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      run("passthrough")(df => df.select(col("event_id")), "append")
      run("stateless_filter")(df => df.where(col("event_type") === "click")
        .select(col("event_id")), "append")
      run("agg_complete")(df => df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n")), "complete")
      run("windowed_wm")(df => df.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n")), "append")
      // full join with per-batch progress breakdown
      val in1 = ss.readStream.schema(schema).parquet(src.toString)
        .transform(graft.Tables.normalizeTs)
      val clicks = in1.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "10 minutes")
      val purchases = in1.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"), col("value").as("p_value"))
        .withWatermark("p_ts", "10 minutes")
      def joinRun(tag: String, parts: String, noData: Boolean,
          joinType: String): Unit = (1 to 2).foreach { i =>
        ss.conf.set("spark.sql.shuffle.partitions", parts)
        ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
          noData.toString)
        val in1 = ss.readStream.schema(schema).parquet(src.toString)
          .transform(graft.Tables.normalizeTs)
        val clicks = in1.where(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
            col("ts").as("c_ts"))
          .withWatermark("c_ts", "10 minutes")
        val purchases = in1.where(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"),
            col("event_id").as("purchase_id"),
            col("ts").as("p_ts"), col("value").as("p_value"))
          .withWatermark("p_ts", "10 minutes")
        val t0 = System.nanoTime()
        val name = s"floor_join_${tag}_$i"
        val q = clicks.join(purchases,
            col("c_user") === col("p_user") &&
              col("p_ts") >= col("c_ts") - expr("INTERVAL 30 MINUTES") &&
              col("p_ts") <= col("c_ts"), joinType)
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("floor_ck").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(120000L)
        val n = ss.table(name).count()
        println(f"[floor] join[$tag] run$i: $n rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
        q.recentProgress.foreach { p =>
          println(s"[floor]   batch ${p.batchId}: rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
        }
      }
      joinRun("inner_p2", "2", noData = true, "inner")
      joinRun("inner_p1", "1", noData = true, "inner")
      joinRun("inner_p2_nodata_off", "2", noData = false, "inner")
      joinRun("full_p1", "1", noData = true, "fullOuter")
      joinRun("full_p2", "2", noData = true, "fullOuter")
      joinRun("full_p4", "4", noData = true, "fullOuter")
      spark.stop(); return
    }
    // round-9 follow-up on the outer/full expiry floor: the batch
    // schedule is already minimal (1 data + 1 expiry batch — r8), so the
    // remaining levers are per-batch fixed costs: state-store
    // maintenance, format validation, per-batch metrics, skip-nulls
    // storage. Each variant times the FULL outer join end to end.
    if (names == Seq("stream_floor2")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.Trigger
      val src = java.nio.file.Files.createTempDirectory("floor2_src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        src.resolve("events.parquet"))
      def run(tag: String, confs: Map[String, String]): Unit = {
        val ss = spark.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "2")
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
        confs.foreach { case (k, v) => ss.conf.set(k, v) }
        val schema = ss.read.parquet(src.toString).schema
        (1 to 3).foreach { i =>
          val in = ss.readStream.schema(schema).parquet(src.toString)
            .transform(graft.Tables.normalizeTs)
          val clicks = in.where(col("event_type") === "click")
            .select(col("user_id").as("c_user"),
              col("event_id").as("click_id"), col("ts").as("c_ts"))
            .withWatermark("c_ts", "10 minutes")
          val purchases = in.where(col("event_type") === "purchase")
            .select(col("user_id").as("p_user"),
              col("event_id").as("purchase_id"),
              col("ts").as("p_ts"), col("value").as("p_value"))
            .withWatermark("p_ts", "10 minutes")
          val t0 = System.nanoTime()
          val name = s"floor2_${tag}_$i"
          val q = clicks.join(purchases,
              col("c_user") === col("p_user") &&
                col("p_ts") >= col("c_ts") - expr("INTERVAL 30 MINUTES") &&
                col("p_ts") <= col("c_ts"), "fullOuter")
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory("floor2_ck").toString)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination(120000L)
          val n = ss.table(name).count()
          println(f"[floor2] $tag run$i: $n rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
      run("baseline", Map.empty)
      run("no_maint", Map(
        "spark.sql.streaming.stateStore.maintenanceInterval" -> "600s"))
      run("no_validate", Map(
        "spark.sql.streaming.stateStore.formatValidation.enabled" -> "false"))
      run("skip_nulls", Map(
        "spark.sql.streaming.stateStore.skipNullsForStreamStreamJoins.enabled"
          -> "true"))
      run("no_metrics", Map("spark.sql.streaming.metricsEnabled" -> "false"))
      run("all", Map(
        "spark.sql.streaming.stateStore.maintenanceInterval" -> "600s",
        "spark.sql.streaming.stateStore.formatValidation.enabled" -> "false",
        "spark.sql.streaming.stateStore.skipNullsForStreamStreamJoins.enabled"
          -> "true",
        "spark.sql.streaming.metricsEnabled" -> "false"))
      spark.stop(); return
    }
    // sink_stream_graph phase bisection: times init-copy, the two graft
    // commits (called directly on the topic's two parity files), and the
    // drained serve OUTSIDE the stream; the full op's wall minus these
    // is the AvailableNow stream mechanics
    if (names == Seq("sgraph_parts")) {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "2")
      (1 to 3).foreach { i =>
        operators.LlmScale.resetLloydMemo()
        operators.MemoUtil.dropScratch()
        val dir = java.nio.file.Files
          .createTempDirectory(s"sgraph_probe_$i").toString
        val t0 = System.nanoTime()
        operators.LlmScale.streamGraphStoreInit(ss, sfDir, dir)
        val t1 = System.nanoTime()
        val topic = operators.LlmScale.streamGraphTopic(ss, sfDir)
        val t2 = System.nanoTime()
        val files = java.nio.file.Files.list(java.nio.file.Paths.get(topic))
          .toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted
        files.zipWithIndex.foreach { case (f, id) =>
          operators.LlmScale.streamGraphCommit(ss, dir,
            ss.read.parquet(f), id.toLong)
        }
        val t3 = System.nanoTime()
        val n = operators.LlmScale.graphStoreServe(ss, dir)
          .queryExecution.toRdd.count()
        val t4 = System.nanoTime()
        def sec(a: Long, b: Long) = (b - a) / 1e9
        println(f"[sgraph] run$i: init ${sec(t0, t1)}%.2f topic " +
          f"${sec(t1, t2)}%.2f commits ${sec(t2, t3)}%.2f " +
          f"serve ${sec(t3, t4)}%.2f (rows=$n)")
      }
      spark.stop(); return
    }
    // one graft-commit bisection: base read/checkpoint, vector write,
    // the 6-hop batch walk, and the attachment write timed separately
    if (names == Seq("sgraph_commit_parts")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "2")
      graft.GraftExtensions.register(ss)
      (1 to 3).foreach { i =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"sgraphc_probe_$i").toString
        operators.LlmScale.streamGraphStoreInit(ss, sfDir, dir)
        val topic = operators.LlmScale.streamGraphTopic(ss, sfDir)
        val f0 = java.nio.file.Files.list(java.nio.file.Paths.get(topic))
          .toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted.head
        val batch = ss.read.parquet(f0)
        val t0 = System.nanoTime()
        val adjBase = ss.read.parquet(s"$dir/adjacency").localCheckpoint()
        val entBase = ss.read.parquet(s"$dir/entries")
        val vecBase = ss.read.parquet(s"$dir/vectors").localCheckpoint()
        val t1 = System.nanoTime()
        batch.select(col("new_id").as("vec_id"), col("dv").as("qv"))
          .write.mode("overwrite").parquet(s"$dir/vectors_probe")
        val t2 = System.nanoTime()
        val queries = batch.select(col("new_id").as("qid"),
          col("dv").as("qq"))
        // OLD hop shape (pre-r18), inlined for a same-JVM A/B against
        // the fused annGraphSearchBatch
        def oldWalk(qs: org.apache.spark.sql.DataFrame, width: Int)
            : org.apache.spark.sql.DataFrame = {
          val qvb = vecBase
          def score(cands: org.apache.spark.sql.DataFrame) =
            cands.join(qvb, cands("node") === qvb("vec_id"))
              .join(qs, "qid")
              .select(col("qid"), col("node"),
                expr("squared_distance(qv, qq)").as("dist"))
          val wq = Window.partitionBy(col("qid"))
            .orderBy(col("dist").asc, col("node").asc)
          var beam = operators.MemoUtil.scratch(score(
              qs.select(col("qid"))
                .crossJoin(broadcast(entBase.select(col("vec_id").as("node"))))
                .where(col("node") =!= col("qid")))
            .withColumn("c", row_number().over(wq)).where(col("c") <= width)
            .drop("c").localCheckpoint(false))
          for (_ <- 1 to 6) {
            val expanded = beam.select(col("qid"), col("node"))
              .join(adjBase, col("node") === col("src"))
              .select(col("qid"), col("dst").as("node"))
              .where(col("node") =!= col("qid"))
            beam = operators.MemoUtil.scratch(
              beam.unionByName(score(expanded)).distinct()
                .withColumn("c", row_number().over(wq))
                .where(col("c") <= width)
                .drop("c").localCheckpoint(false))
          }
          beam
        }
        def att(beam: org.apache.spark.sql.DataFrame) = {
          val w = Window.partitionBy(col("qid"))
            .orderBy(col("dist").asc, col("node").asc)
          val a = beam.withColumn("rank", row_number().over(w))
            .where(col("rank") <= 4)
            .select(col("qid").as("new_id"), col("node").as("dst"))
          a.select(col("new_id").as("src"), col("dst"))
            .unionByName(a.select(col("dst").as("src"),
              col("new_id").as("dst")))
        }
        att(operators.LlmScale.annGraphSearchBatch(
            adjBase, entBase, vecBase, queries, 8))
          .write.mode("overwrite").parquet(s"$dir/adjacency_probe")
        val t3 = System.nanoTime()
        operators.MemoUtil.dropScratch()
        att(oldWalk(queries, 8))
          .write.mode("overwrite").parquet(s"$dir/adjacency_probe_old")
        val t4 = System.nanoTime()
        def sec(a: Long, b: Long) = (b - a) / 1e9
        println(f"[sgraphc] run$i: base ${sec(t0, t1)}%.2f vecwrite " +
          f"${sec(t1, t2)}%.2f walk_new ${sec(t2, t3)}%.2f " +
          f"walk_old ${sec(t3, t4)}%.2f")
        operators.MemoUtil.dropScratch()
      }
      spark.stop(); return
    }
    // graph_components stage bisection with memo resets between runs —
    // DevProbe's plain mode reuses the adjacency/cc memos, hiding where
    // the bench-visible (memo-paying) time goes
    if (names == Seq("cc_parts")) {
      (1 to 3).foreach { i =>
        operators.Analytics.resetGraphMemo()
        operators.MemoUtil.dropScratch()
        val t0 = System.nanoTime()
        operators.Analytics.adjacencyProbe(spark, sfDir) // memoizes adj
        val tA = System.nanoTime()
        val lbl = operators.Analytics.componentLabels(spark, sfDir)
        val t1 = System.nanoTime()
        val n = SparkEntry.queries("graph_components")(spark, sfDir)
          .queryExecution.toRdd.count()
        val t2 = System.nanoTime()
        println(f"[cc] run$i: adj ${(tA - t0) / 1e9}%.2f s " +
          f"contract ${(t1 - tA) / 1e9}%.2f s " +
          f"(rows=${lbl.count()}) audit ${(t2 - t1) / 1e9}%.2f s n=$n")
      }
      spark.stop(); return
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // multiple runs: first pays codegen+AQE warmup, later ones are steady
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val rows = df.queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $n run$i: $rows rows in $dt%.2f s")
        if (i == 4) println(df.queryExecution.executedPlan.toString.take(8000))
      }
    }
    spark.stop()
  }
}
