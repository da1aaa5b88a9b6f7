package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._

class CustomSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim: known values, symmetry, self-similarity") {
    GraftExtensions.register(spark)
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),   // orthogonal → 0
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)),   // identical → 1
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))   // opposite → -1
    ).toDF("a", "b")
    val got = df.selectExpr("cosine_sim(a, b) AS c").as[Double].collect()
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
    // symmetry on real vectors
    val emb = Tables.embeddings(spark, sf).limit(50)
      .select($"vec_id", $"embedding")
    val pairs = emb.as("x").crossJoin(emb.as("y"))
      .selectExpr("cosine_sim(x.embedding, y.embedding) AS ab",
        "cosine_sim(y.embedding, x.embedding) AS ba")
      .where($"ab" =!= $"ba")
    assert(pairs.count() == 0)
  }

  test("cosine_sim interpreted eval matches codegen") {
    GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(20)
      .select($"vec_id", $"embedding")
    val df = emb.as("x").crossJoin(emb.as("y"))
      .selectExpr("x.vec_id AS a", "y.vec_id AS b",
        "cosine_sim(x.embedding, y.embedding) AS c")
    val codegen = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(codegen == interp, "eval and doGenCode must agree bit-for-bit")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("cosine_sim stays inside whole-stage codegen") {
    GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val df = emb.as("x").crossJoin(broadcast(emb.as("y").limit(5)))
      .selectExpr("cosine_sim(x.embedding, y.embedding) AS c")
    val wsc = collectFinal(df) { case w: WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, "custom expression must not break codegen")
  }

  test("sorted_intersect_count matches size(array_intersect) on sorted sets, stays in codegen") {
    GraftExtensions.register(spark)
    // sorted+distinct arrays from the real signature builder shape,
    // including empty and disjoint cases
    val df = Tables.documents(spark, sf)
      .selectExpr("doc_id",
        """CASE WHEN size(split(text, ' ')) >= 4 THEN
          |  sort_array(array_distinct(transform(
          |    sequence(1, size(split(text, ' ')) - 3),
          |    i -> xxhash64(concat_ws(' ', slice(split(text, ' '), i, 4))))))
          |ELSE array() END AS hs""".stripMargin)
      .localCheckpoint()
    val pairs = df.as("a").crossJoin(df.as("b").limit(7))
      .selectExpr(
        "sorted_intersect_count(a.hs, b.hs) AS fast",
        "size(array_intersect(a.hs, b.hs)) AS ref")
    assert(pairs.where($"fast" =!= $"ref").count() == 0,
      "merge-count must equal the hash-based intersection size")
    assert(pairs.where($"fast" > 0).count() > 0,
      "fixture must exercise non-empty intersections (self pairs)")
    val wsc = collectFinal(pairs) { case w: WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, "custom expression must not break codegen")
  }

  test("squared_distance / dot_long match the HOF folds, stay in codegen") {
    GraftExtensions.register(spark)
    // quantized vectors from the real embeddings fixture (the k-means /
    // semdedup input shape), plus hand-checked literals
    val q = Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint)) AS q")
      .limit(50).localCheckpoint()
    val pairs = q.as("a").crossJoin(q.as("b").limit(5))
      .selectExpr(
        "squared_distance(a.q, b.q) AS sdf",
        "aggregate(zip_with(a.q, b.q, (x, y) -> (x - y) * (x - y)), 0L, (s, v) -> s + v) AS sdr",
        "dot_long(a.q, b.q) AS dpf",
        "aggregate(zip_with(a.q, b.q, (x, y) -> x * y), 0L, (s, v) -> s + v) AS dpr")
    assert(pairs.where($"sdf" =!= $"sdr" || $"dpf" =!= $"dpr").count() == 0,
      "native kernels must equal the interpreted HOF folds exactly")
    val lit = Seq(1).toDF("x")
      .selectExpr("squared_distance(array(1L, 2L, 3L), array(4L, 0L, 3L)) AS s",
        "dot_long(array(1L, 2L, 3L), array(4L, 0L, 3L)) AS d")
      .head()
    assert(lit.getLong(0) == 13L && lit.getLong(1) == 13L)
    val wsc = collectFinal(pairs) { case w: WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, "long-vector kernels must not break codegen")
  }

  test("squared_distance rejects length-mismatched input loudly") {
    GraftExtensions.register(spark)
    val err = intercept[Exception] {
      Seq(1).toDF("x")
        .selectExpr("squared_distance(array(1L,2L), array(1L,2L,3L))")
        .collect()
    }
    def rootMessages(t: Throwable): List[String] =
      Option(t.getMessage).toList ++
        Option(t.getCause).toList.flatMap(rootMessages)
    assert(rootMessages(err).exists(_.contains("lengths differ")),
      s"expected the length precondition error, got $err")
  }

  test("sorted_intersect_count rejects unsorted input loudly") {
    GraftExtensions.register(spark)
    val err = intercept[Exception] {
      Seq(1).toDF("x")
        .selectExpr("sorted_intersect_count(array(3L,1L,2L), array(1L,2L,3L))")
        .collect()
    }
    def rootMessages(t: Throwable): List[String] =
      Option(t.getMessage).toList ++
        Option(t.getCause).toList.flatMap(rootMessages)
    assert(rootMessages(err).exists(_.contains("sorted ascending")),
      s"expected the precondition error, got $err")
  }

  test("VectorMean aggregator: exact mean on literal vectors") {
    val vecMean = udaf(graft.functions.VectorMean)
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f)), (1, Seq(10.0f, 20.0f))
    ).toDF("label", "embedding")
    val got = df.groupBy($"label").agg(vecMean($"embedding").as("m"))
      .orderBy($"label").collect()
    assert(got(0).getSeq[Double](1) == Seq(2.0, 3.0))
    assert(got(1).getSeq[Double](1) == Seq(10.0, 20.0))
  }

  test("simhash32 expression is bit-identical to the HOF formulation, stays in codegen") {
    graft.GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", split($"text", " "))
      .withColumn("h1", expr(
        """CASE WHEN size(toks) >= 3 THEN
          |  array_distinct(transform(sequence(1, size(toks) - 2),
          |    i -> aggregate(split(concat_ws(' ', slice(toks, i, 3)), ''), 0L,
          |           (h, c) -> (h * 31 + ascii(c)) % 1000000007)))
          |ELSE array() END""".stripMargin))
      .withColumn("h2", expr("transform(h1, x -> (x * 2654435761L) % 1000000007)"))
    val both = docs.select($"doc_id",
      expr("simhash32(h1, h2)").as("native"),
      expr(graft.operators.LlmExtended.simhashExpr).as("hof"))
    assert(both.where($"native" =!= $"hof").count() == 0,
      "native fold must equal the HOF formulation on every fixture doc")
    val wsc = collectFinal(both.select($"native")) {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, "simhash32 must not break whole-stage codegen")
  }

  test("poly_shingles expression is bit-identical to the HOF formulation, stays in codegen") {
    graft.GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", split($"text", " "))
    val both = docs.select($"doc_id",
      expr("poly_shingles(toks)").as("native"),
      expr(graft.operators.LlmExtended.shingleHashExpr).as("hof"))
    assert(both.where(expr("native != hof")).count() == 0,
      "native shingle hashes must equal the HOF formulation on every doc")
    // edge cases the corpus may not cover: <3 tokens, empty words from
    // double spaces, non-ASCII code points incl. a surrogate pair
    val edge = Seq("", "one two", "a  b c", "π €𝄞 words here",
      "x y z", "dup dup dup dup")
      .toDF("text").withColumn("toks", split($"text", " "))
    val e2 = edge.select(expr("poly_shingles(toks)").as("native"),
      expr(graft.operators.LlmExtended.shingleHashExpr).as("hof"))
    assert(e2.where(expr("native != hof")).count() == 0,
      "native shingle hashes must match on edge-case texts")
    val wsc = collectFinal(both.select($"native")) {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, "poly_shingles must not break whole-stage codegen")
  }

  test("xx_ngram_hashes is bit-identical to the HOF xxhash64 form, stays in codegen") {
    graft.GraftExtensions.register(spark)
    def hof(k: Int) =
      s"""CASE WHEN size(toks) >= $k THEN
         |  transform(sequence(1, size(toks) - ${k - 1}),
         |    i -> xxhash64(concat_ws(' ', slice(toks, i, $k))))
         |ELSE array() END""".stripMargin
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", split($"text", " "))
    Seq(2, 3, 4, 8).foreach { k =>
      val both = docs.select(
        expr(s"xx_ngram_hashes(toks, $k)").as("native"),
        expr(hof(k)).as("hof"))
      assert(both.where(expr("native != hof")).count() == 0,
        s"k=$k: native gram hashes must equal the HOF formulation")
    }
    // empty words from double spaces keep their concat_ws separator, and
    // short/unicode inputs agree too
    val edge = Seq("", "one", "a  b c d", "π €𝄞 x y", "w w w w w")
      .toDF("text").withColumn("toks", split($"text", " "))
    val e2 = edge.select(expr("xx_ngram_hashes(toks, 3)").as("native"),
      expr(hof(3)).as("hof"))
    assert(e2.where(expr("native != hof")).count() == 0,
      "native gram hashes must match on edge-case texts")
    val wsc = collectFinal(
      docs.select(expr("xx_ngram_hashes(toks, 3)").as("native"))) {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, "xx_ngram_hashes must not break whole-stage codegen")
  }

  test("minhash_sig is bit-identical to the 32 per-seed HOF minima") {
    graft.GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", split($"text", " "))
      .withColumn("hs", expr("array_distinct(xx_ngram_hashes(toks, 3))"))
    val both = docs.select(
      expr("minhash_sig(hs, 32)").as("native"),
      expr(graft.operators.LlmOps.sigHofExpr("hs")).as("hof"))
    // null-safe array compare: empty hs yields 32 nulls on both paths
    assert(both.where(expr(
        "NOT (native <=> hof)")).count() == 0,
      "native signature must equal the per-seed HOF minima on every doc")
  }

  test("LevenshteinGuard rule injects the length pre-filter, idempotently, same results") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    graft.GraftExtensions.installOptimizations(spark)
    val df = Seq(("kitten", "sitting"), ("kitten", "kitten!"),
      ("a", "abcdefgh"), ("same", "same"))
      .toDF("a", "b")
      .where(expr("levenshtein(a, b) <= 3"))
    // apply to the ANALYZED plan: over a literal relation the optimizer
    // folds the whole filter away (ConvertToLocalRelation — same trap as
    // DPP's literal dims), so the rule's effect is asserted pre-folding
    val once = graft.plans.LevenshteinGuard(df.queryExecution.analyzed)
    assert(once.toString.contains("abs((length(a") ,
      s"guard missing after rule application:\n$once")
    val twice = graft.plans.LevenshteinGuard(once)
    assert(once.fastEquals(twice), "rule must be a fixed point after one application")
    // sound: exactly the rows a guard-free evaluation admits
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("kitten", "sitting"), ("kitten", "kitten!"), ("same", "same")))
    // end-to-end: the gate query (parquet-backed, not foldable) carries
    // the guard through to the executed plan
    val fuzzy = graft.operators.Joins.joinFuzzy(spark, sf)
    assert(fuzzy.queryExecution.executedPlan.toString.contains("abs((length("),
      "join_fuzzy's physical plan must contain the length guard")
  }

  test("ngrams generator: plans as GenerateExec, matches explode-over-transform") {
    import org.apache.spark.sql.execution.GenerateExec
    graft.GraftExtensions.register(spark)
    val df = Seq((1L, "a b c d"), (2L, "x y"), (3L, "solo"))
      .toDF("id", "text")
      .withColumn("toks", split($"text", " "))
    val viaGen = df.selectExpr("id", "ngrams(toks, 2) AS (pos, gram)")
    assert(collectFinal(viaGen) { case g: GenerateExec => g }.nonEmpty,
      "custom generator must plan as GenerateExec")
    val got = viaGen.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val expected = Set(
      (1L, 0, "a b"), (1L, 1, "b c"), (1L, 2, "c d"), (2L, 0, "x y"))
    assert(got == expected)
  }

  test("ngrams generator: windows containing null elements are skipped") {
    graft.GraftExtensions.register(spark)
    val df = Seq(1L).toDF("id")
      .selectExpr("id", "array('a', cast(null as string), 'b', 'c') AS toks")
    val got = df.selectExpr("ngrams(toks, 2) AS (pos, gram)")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((2, "b c")), s"null-straddling windows must drop, got $got")
  }

  test("VectorMean tolerates ragged vector lengths (no truncation, no AIOOBE)") {
    val vecMean = udaf(graft.functions.VectorMean)
    // short vector first (buffer must grow), long vector first in the
    // other group (merge must handle unequal buffer lengths both ways)
    val df = Seq(
      (0, Seq(1.0f)), (0, Seq(3.0f, 4.0f)),
      (1, Seq(10.0f, 20.0f, 30.0f)), (1, Seq(2.0f))
    ).toDF("label", "embedding").repartition(4)
    val got = df.groupBy($"label").agg(vecMean($"embedding").as("m"))
      .orderBy($"label").collect()
    assert(got(0).getSeq[Double](1) == Seq(2.0, 2.0))
    assert(got(1).getSeq[Double](1) == Seq(6.0, 10.0, 15.0))
  }

  test("VectorMean is repartition-invariant (partial agg correctness)") {
    val vecMean = udaf(graft.functions.VectorMean)
    val base = Tables.embeddings(spark, sf)
    def mean(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"label").agg(vecMean($"embedding").as("m"))
        .select($"label", round(expr("aggregate(m, 0D, (a, x) -> a + x)"), 6).as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(mean(base) == mean(base.repartition(13)))
  }

  test("TopKPerGroup: custom plan matches the window formulation exactly") {
    val native = operators.Windows.topkPergroupNative(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    val window = operators.Windows.winTopkPerGroup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    assert(native.length == window.length && native.sameElements(window),
      "custom operator must agree with the window twin row-for-row")
  }

  test("TopKPerGroup: partial stage runs before the exchange and caps rows") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val df = operators.Windows.topkPergroupNative(spark, sf)
    val execs = collectFinal(df) { case t: graft.plans.TopKPerGroupExec => t }
    assert(execs.length == 2, s"expected partial+final, got ${execs.length}")
    assert(execs.count(_.isFinal) == 1 && execs.count(!_.isFinal) == 1)
    val exchanges = collectFinal(df) { case e: ShuffleExchangeLike => e }
    assert(exchanges.nonEmpty,
      "EnsureRequirements must insert the hash exchange for the final stage")
    // the map-side cap: partial output ≤ k rows per (group, partition) —
    // strictly fewer rows ever reach the exchange than the window plan
    // shuffles (which is the whole input)
    val nInput = Tables.orders(spark, sf).count()
    val nFinal = df.count()
    assert(nFinal < nInput, "top-k output must be a strict subset")
    // rank values are 1..k and unique per group
    val bad = df.groupBy($"o_custkey")
      .agg(countDistinct($"rn").as("d"), count(lit(1)).as("n"),
        max($"rn").as("mx"))
      .where($"d" =!= $"n" || $"mx" > 3).count()
    assert(bad == 0, "ranks must be dense, unique, and bounded by k")
  }

  test("dhash72: interpreted matches codegen, brightness-invariant, crop-sensitive, null under 72 bytes") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sf).limit(200)
      .selectExpr("doc_id", "encode(text, 'UTF-8') AS blob")
      .where(expr("octet_length(blob) >= 72"))
    val df = docs.selectExpr("doc_id", "dhash72(blob) AS ph")
    val codegen = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(codegen == interp, "eval and doGenCode must agree bit-for-bit")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(codegen.nonEmpty)
    // brightness shift (+1 per ASCII byte) moves every pixel mean by
    // exactly 10⁴ → the difference hash is UNCHANGED (the invariance
    // llm_dedup_phash's planted renditions rely on)
    val shifted = docs.selectExpr("doc_id",
      """dhash72(encode(concat_ws('', transform(
        |  filter(split(decode(blob, 'UTF-8'), ''), c -> c != ''),
        |  c -> chr(ascii(c) + 1))), 'UTF-8')) AS ph""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(shifted == codegen, "dhash must be brightness-invariant")
    // structural edits DO move the hash: dropping a prefix re-segments
    // every pixel (the crop case a perceptual hash is allowed to miss)
    val cropped = docs.where(expr("octet_length(blob) >= 172"))
      .selectExpr("doc_id", "dhash72(substring(blob, 101)) AS ph")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val moved = cropped.count { case (id, ph) => codegen(id) != ph }
    assert(moved > cropped.size / 2, s"crops should usually move the hash ($moved/${cropped.size})")
    // < 72 bytes: no 9×8 downsample exists → NULL by contract
    val short = spark.sql("SELECT dhash72(encode('tiny', 'UTF-8')) AS ph")
      .collect().head
    assert(short.isNullAt(0), "blobs under 72 bytes must hash to NULL")
  }

  test("CosineLshRewrite: brute cosine join becomes bucketed equi-join, matches llm_dedup_embed") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec,
      BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    // flag OFF (plain suite session): the brute spelling plans the
    // quadratic shape the rule exists to rescue
    GraftExtensions.register(spark)
    GraftExtensions.installOptimizations(spark)
    def brute(s: org.apache.spark.sql.SparkSession, tau: Double) = {
      val e = Tables.embeddings(s, sf)
      val a = e.select($"vec_id".as("ida"), $"embedding".as("ea"))
      val b = e.select($"vec_id".as("idb"), $"embedding".as("eb"))
      a.join(b, $"ida" < $"idb" && expr("cosine_sim(ea, eb)") >= tau)
        .select($"ida", $"idb", round(expr("cosine_sim(ea, eb)"), 4).as("cos"))
    }
    val off = brute(spark, 0.5).queryExecution.sparkPlan
    assert(off.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.nonEmpty, s"flag off must keep the quadratic join:\n$off")
    // flag ON (the registered op's derived session): equi-join + no
    // quadratic node anywhere
    val on = operators.LlmExtended.lshAutoRewrite(spark, sf)
    val plan = on.queryExecution.sparkPlan
    assert(plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.isEmpty, s"rewrite must remove the quadratic join:\n$plan")
    assert(plan.collect {
      case j: BroadcastHashJoinExec => j
      case j: ShuffledHashJoinExec => j
      case j: SortMergeJoinExec => j
    }.nonEmpty, s"rewrite must plan an equi-join on the cell key:\n$plan")
    // the rewrite IS the hand-bucketed algorithm: row-identical output
    val want = operators.LlmExtended.dedupEmbed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = on.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want,
      s"rewritten result must equal llm_dedup_embed (got ${got.size} vs ${want.size} pairs)")
    // τ=0.5 may admit zero pairs at this SF; prove the rewritten plan
    // RUNS and is exactly the hamming≤1 candidate set at τ=-1 (every
    // candidate passes cos ≥ -1, so the bucketed result IS the blocks)
    spark.conf.set(graft.plans.CosineLshRewrite.Flag, "true")
    val rewritten = try {
      // idempotent: one application rewrites the analyzed join; a second
      // is a fixed point (injected probe=cell reads as an equi-key)
      val analyzed = brute(spark, 0.5).queryExecution.analyzed
      val once = graft.plans.CosineLshRewrite(analyzed)
      assert(!once.fastEquals(analyzed), "rule must fire on the brute join")
      val twice = graft.plans.CosineLshRewrite(once)
      assert(once.fastEquals(twice), "rule must be a fixed point")
      brute(spark, -1.0).select($"ida", $"idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally spark.conf.unset(graft.plans.CosineLshRewrite.Flag)
    val cellE =
      """aggregate(transform(sequence(0, 7),
        |  i -> IF(element_at(embedding, i + 1) > 0, shiftleft(1, i), 0)),
        |0, (a, x) -> a + x)""".stripMargin
    val cells = Tables.embeddings(spark, sf)
      .select($"vec_id", expr(cellE).as("cell"))
    val expect = cells.as("x").join(cells.as("y"),
        $"x.vec_id" < $"y.vec_id" && expr("bit_count(x.cell ^ y.cell)") <= 1)
      .select($"x.vec_id", $"y.vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rewritten.nonEmpty, "hamming≤1 blocks must be nonempty")
    assert(rewritten == expect,
      s"rewritten τ=-1 result must be the hamming≤1 pair set (${rewritten.size} vs ${expect.size})")
  }

  test("CosineLshRewrite top-k: brute rank-per-query becomes the IVF probe form") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec,
      BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    GraftExtensions.register(spark)
    GraftExtensions.installOptimizations(spark)
    // the brute top-k spelling (the llm_lsh_autorewrite_topk body, on
    // the plain suite session so the flag state is ours to control)
    def brute(s: org.apache.spark.sql.SparkSession) = {
      val emb = Tables.embeddings(s, sf)
      val q = emb.where($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qe"))
      val c = emb.select($"vec_id".as("cid"), $"embedding".as("ce"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"cos".desc, $"cid")
      q.join(c, $"cid" =!= $"qid")
        .select($"qid", $"cid",
          (round(expr("cosine_sim(qe, ce)"), 4) + lit(0.0)).as("cos"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .where($"rn" <= 3)
    }
    // flag OFF: the keyless join plans the quadratic shape
    val off = brute(spark).queryExecution.sparkPlan
    assert(off.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.nonEmpty, s"flag off must keep the quadratic join:\n$off")
    // the registered op (derived session, flag on): equi-join, no
    // quadratic node
    val on = operators.LlmExtended.lshAutoRewriteTopk(spark, sf)
    val plan = on.queryExecution.sparkPlan
    assert(plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.isEmpty, s"rewrite must remove the quadratic join:\n$plan")
    assert(plan.collect {
      case j: BroadcastHashJoinExec => j
      case j: ShuffledHashJoinExec => j
      case j: SortMergeJoinExec => j
    }.nonEmpty, s"rewrite must plan an equi-join on the cell key:\n$plan")
    // idempotence on the analyzed top-k shape
    spark.conf.set(graft.plans.CosineLshRewrite.Flag, "true")
    try {
      val analyzed = brute(spark).queryExecution.optimizedPlan
      val once = graft.plans.CosineLshRewrite(analyzed)
      val twice = graft.plans.CosineLshRewrite(once)
      assert(once.fastEquals(twice), "top-k rewrite must be a fixed point")
    } finally spark.conf.unset(graft.plans.CosineLshRewrite.Flag)
    // the rewrite IS the hand-written IVF probe algorithm: row-identical
    // to llm_ann_ivf (same probes, same rounding, same tie-break)
    def k(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val want = k(operators.LlmExtended.annIvf(spark, sf))
    val got = k(on)
    assert(got.nonEmpty && got == want,
      s"rewritten top-k must equal llm_ann_ivf (${got.size} vs ${want.size})")
    // MIRRORED orientation: queries on the RIGHT side of the join — the
    // rule must probe the side the window partitions by, whichever side
    // of the join it sits on, and produce the identical rows
    spark.conf.set(graft.plans.CosineLshRewrite.Flag, "true")
    try {
      val emb = Tables.embeddings(spark, sf)
      val q = emb.where($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qe"))
      val c = emb.select($"vec_id".as("cid"), $"embedding".as("ce"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"cos".desc, $"cid")
      val mirrored = c.join(q, $"cid" =!= $"qid") // corpus LEFT, queries RIGHT
        .select($"qid", $"cid",
          (round(expr("cosine_sim(qe, ce)"), 4) + lit(0.0)).as("cos"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .where($"rn" <= 3)
      val mplan = mirrored.queryExecution.sparkPlan
      assert(mplan.collect {
        case j: BroadcastNestedLoopJoinExec => j
        case j: CartesianProductExec => j
      }.isEmpty, s"mirrored orientation must also rewrite:\n$mplan")
      assert(k(mirrored) == want,
        "mirrored orientation must produce the identical top-k rows")
    } finally spark.conf.unset(graft.plans.CosineLshRewrite.Flag)
  }

  test("jaccard_sim: exact set semantics vs the HOF witness") {
    // unsorted, duplicate-carrying, empty — the arbitrary user inputs
    // sorted_intersect_count's precondition excludes
    GraftExtensions.register(spark)
    val rows = Seq(
      (Seq(3L, 1L, 2L, 3L, 1L), Seq(2L, 2L, 4L, 1L)),   // dups both sides
      (Seq(5L, 5L, 5L), Seq(5L)),                        // J = 1 via dedup
      (Seq(1L, 2L), Seq(3L, 4L)),                        // disjoint → 0
      (Seq.empty[Long], Seq(1L)),                        // one empty → 0
      (Seq.empty[Long], Seq.empty[Long]))                // both empty → 0
      .toDF("a", "b")
    val got = rows.select(expr("jaccard_sim(a, b)")).collect().map(_.getDouble(0))
    val want = rows.select(
      expr("""CASE WHEN size(array_union(a, b)) = 0 THEN 0.0D ELSE
              |size(array_intersect(a, b)) / size(array_union(a, b)) END"""
        .stripMargin)).collect().map(_.getDouble(0))
    assert(got.toSeq == want.toSeq, s"${got.toSeq} vs ${want.toSeq}")
    // null propagation
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(expr("jaccard_sim(a, b)")).collect()
    assert(n.head.isNullAt(0))
  }

  test("JaccardLshRewrite: brute Jaccard join becomes the MinHash band equi-join, matches llm_dedup_near") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec,
      BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    GraftExtensions.register(spark)
    GraftExtensions.installOptimizations(spark)
    def brute(s: org.apache.spark.sql.SparkSession) = {
      val base = Tables.documents(s, sf)
        .withColumn("toks", split($"text", " "))
        .select($"doc_id",
          expr("array_distinct(xx_ngram_hashes(toks, 3))").as("hs"))
      val a = base.select($"doc_id".as("doc_a"), $"hs".as("sa"))
      val b = base.select($"doc_id".as("doc_b"), $"hs".as("sb"))
      a.join(b, $"doc_a" < $"doc_b" && expr("jaccard_sim(sa, sb)") >= 0.8)
        .select($"doc_a", $"doc_b",
          round(expr("jaccard_sim(sa, sb)"), 4).as("jaccard"))
    }
    // flag OFF: the keyless join plans the quadratic shape
    val off = brute(spark).queryExecution.sparkPlan
    assert(off.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.nonEmpty, s"flag off must keep the quadratic join:\n$off")
    // the registered op (derived session, flag on): band equi-join only
    val on = operators.LlmExtended.lshAutoRewriteJaccard(spark, sf)
    val plan = on.queryExecution.sparkPlan
    assert(plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.isEmpty, s"rewrite must remove the quadratic join:\n$plan")
    assert(plan.collect {
      case j: BroadcastHashJoinExec => j
      case j: ShuffledHashJoinExec => j
      case j: SortMergeJoinExec => j
    }.nonEmpty, s"rewrite must plan an equi-join on the band key:\n$plan")
    // EXACTLY-ONCE multiplicity: the first-matching-band conjunct must
    // stand in for the pipeline's dropDuplicates — a near-dup pair
    // collides in MANY of the 16 bands (clones share most signature
    // entries), so a missing conjunct shows up as duplicate rows here
    val gotRows = on.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(gotRows.size == gotRows.toSet.size,
      "each verified pair must appear exactly once (first-match band)")
    // the rescue verifies exactly, so rows equal the hand-written op
    val want = operators.LlmOps.dedupNear(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotRows.nonEmpty && gotRows.toSet == want,
      s"rewritten result must equal llm_dedup_near (${gotRows.size} vs ${want.size} pairs)")
    // idempotence on the analyzed brute shape
    spark.conf.set(graft.plans.CosineLshRewrite.Flag, "true")
    try {
      val analyzed = brute(spark).queryExecution.analyzed
      val once = graft.plans.JaccardLshRewrite(analyzed)
      assert(!once.fastEquals(analyzed), "rule must fire on the brute join")
      val twice = graft.plans.JaccardLshRewrite(once)
      assert(once.fastEquals(twice), "rule must be a fixed point")
    } finally spark.conf.unset(graft.plans.CosineLshRewrite.Flag)
  }

  test("extension class wires cosine_sim via withExtensions") {
    // the production path: a fresh session built with the extension sees
    // the function without runtime registration
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    try {
      import s2.implicits._
      val r = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
        .selectExpr("cosine_sim(a, b) AS c").as[Double].head()
      assert(math.abs(r - 1.0) < 1e-12)
    } finally ()
    // do not stop s2: it shares the SparkContext with the suite session
  }

  test("RangeBucketRewrite: brute BETWEEN join becomes bucketed equi-join, exactly") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec,
      BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    GraftExtensions.installOptimizations(spark)
    def brute(s: org.apache.spark.sql.SparkSession) = {
      val pts = Tables.events(s, sf).select($"event_id", $"user_id")
      val iv = Tables.orders(s, sf).where($"o_orderkey" % 97 === 0)
        .select($"o_orderkey",
          ($"o_orderkey" * 3 % 9000).as("lo"),
          ($"o_orderkey" * 3 % 9000 + 400).as("hi"))
      pts.join(iv, $"event_id" >= $"lo" && $"event_id" <= $"hi")
    }
    // flag OFF: the naive spelling plans the nested-loop shape
    val off = brute(spark).queryExecution.sparkPlan
    assert(off.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.nonEmpty, s"flag off must keep the nested-loop join:\n$off")
    // flag ON (the registered op's derived session): equi-join, no
    // nested-loop node anywhere
    val on = graft.operators.Joins.joinRangeAutorewrite(spark, sf)
    val plan = on.queryExecution.sparkPlan
    assert(plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.isEmpty, s"rewrite must remove the nested-loop join:\n$plan")
    assert(plan.collect {
      case j: BroadcastHashJoinExec => j
      case j: ShuffledHashJoinExec => j
      case j: SortMergeJoinExec => j
    }.nonEmpty, s"rewrite must plan an equi-join on the bucket key:\n$plan")
    // EXACT rescue: flag-on aggregate equals a flag-off local replay
    val want = brute(spark).groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_events"),
        sum($"event_id").cast("bigint").as("id_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = on.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"rewritten rows must equal the naive join's " +
      s"(got ${got.size} vs ${want.size} groups)")
    assert(got.nonEmpty, "fixture must produce at least one populated interval")
    // idempotent: the injected x div W = bucket conjunct reads as an
    // equi key, so a second application is a fixed point
    spark.conf.set(graft.plans.RangeBucketRewrite.Flag, "true")
    try {
      val analyzed = brute(spark).queryExecution.analyzed
      val once = graft.plans.RangeBucketRewrite(analyzed)
      assert(!once.fastEquals(analyzed), "rule must fire on the brute join")
      val twice = graft.plans.RangeBucketRewrite(once)
      assert(once.fastEquals(twice), "rule must be a fixed point")
    } finally spark.conf.unset(graft.plans.RangeBucketRewrite.Flag)
  }

  test("SpatialGridRewrite: naive radius theta-join becomes the 3x3 cell equi-join, exactly") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec,
      BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    GraftExtensions.installOptimizations(spark)
    // flag OFF: the naive squared-distance self-join plans nested-loop
    def naivePts(s: org.apache.spark.sql.SparkSession) = {
      val pts = Tables.customer(s, sf).select($"c_custkey".as("id"),
        ($"c_custkey" * 7 % 1000).as("x"), ($"c_custkey" * 13 % 1000).as("y"))
      val b = pts.select($"id".as("rid"), $"x".as("rx"), $"y".as("ry"))
      pts.join(b, $"id" =!= $"rid" &&
        ($"x" - $"rx") * ($"x" - $"rx") +
          ($"y" - $"ry") * ($"y" - $"ry") <= lit(900L))
    }
    val off = naivePts(spark).queryExecution.sparkPlan
    assert(off.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.nonEmpty, s"flag off must keep the nested-loop join:\n$off")
    // flag ON (the registered op's derived session): cell equi-join
    val on = graft.operators.Joins.joinSpatialAutorewrite(spark, sf)
    val plan = on.queryExecution.sparkPlan
    assert(plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.isEmpty, s"rewrite must remove the nested-loop join:\n$plan")
    assert(plan.collect {
      case j: BroadcastHashJoinExec => j
      case j: ShuffledHashJoinExec => j
      case j: SortMergeJoinExec => j
    }.nonEmpty, s"rewrite must plan an equi-join on the cell keys:\n$plan")
    // EXACT rescue: rewritten aggregate row-matches the hand-written
    // grid op (independent code path, same semantics)
    val want = graft.operators.Joins.joinSpatialRadius(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = on.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want,
      s"rewritten rows must equal join_spatial_radius (${got.size} vs ${want.size})")
    // NEGATIVE coordinates: the floor-division cell must keep the
    // one-cell-apart invariant across zero (truncating division's
    // double-width cell 0 is the bug this guards)
    spark.conf.set(graft.plans.SpatialGridRewrite.Flag, "true")
    try {
      import spark.implicits._
      val neg = (-30L to 30L).map(i => (i, i * 17 % 250, i * 23 % 250))
        .toDF("id", "x", "y") // Scala % keeps sign: coords in (-250, 250)
      neg.createOrReplaceTempView("neg_pts")
      val b = neg.select($"id".as("rid"), $"x".as("rx"), $"y".as("ry"))
      val joined = neg.join(b, $"id" =!= $"rid" &&
          ($"x" - $"rx") * ($"x" - $"rx") +
            ($"y" - $"ry") * ($"y" - $"ry") <= lit(10000L))
        .select($"id", $"rid")
      val gotN = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // local replay of the naive predicate
      val rows = (-30L to 30L).map(i => (i, i * 17 % 250, i * 23 % 250))
      val wantN = (for {
        (i, x, y) <- rows; (j, rx, ry) <- rows
        if i != j && (x - rx) * (x - rx) + (y - ry) * (y - ry) <= 10000L
      } yield (i, j)).toSet
      assert(gotN == wantN, "floor-division cells must be exact for negatives")
      val negPlan = joined.queryExecution.sparkPlan
      assert(negPlan.collect {
        case j: BroadcastNestedLoopJoinExec => j
        case j: CartesianProductExec => j
      }.isEmpty, "the negative-coordinate join must also be rescued")
      // idempotent: the injected cell equalities read as equi keys
      val analyzed = naivePts(spark).queryExecution.analyzed
      val once = graft.plans.SpatialGridRewrite(analyzed)
      assert(!once.fastEquals(analyzed), "rule must fire on the naive join")
      val twice = graft.plans.SpatialGridRewrite(once)
      assert(once.fastEquals(twice), "rule must be a fixed point")
    } finally spark.conf.unset(graft.plans.SpatialGridRewrite.Flag)
  }

  test("fwht64: equals the explicit (-1)^popcount(j&k) matrix, involutive up to 64, codegen agrees") {
    GraftExtensions.register(spark)
    val vecs = Tables.embeddings(spark, sf).limit(20)
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v")
    val df = vecs.selectExpr("vec_id", "v", "fwht64(v) AS h")
    val rows = df.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val v = r.getSeq[Long](1)
      val h = r.getSeq[Long](2)
      // the explicit Hadamard product the butterfly must equal
      val want = (0 until 64).map(k =>
        (0 until 64).map(j =>
          v(j) * (if (java.lang.Long.bitCount(j & k) % 2 == 0) 1L else -1L))
          .sum)
      assert(h == want, s"butterfly != matrix for vec ${r.getLong(0)}")
    }
    // H·H = 64·I (unnormalized involution)
    val inv = vecs.selectExpr("v", "fwht64(fwht64(v)) AS hh").collect()
    inv.foreach { r =>
      val v = r.getSeq[Long](0); val hh = r.getSeq[Long](1)
      assert(hh == v.map(_ * 64L), "H(H(v)) must equal 64·v")
    }
    // interpreted eval must agree with codegen bit-for-bit
    val codegen = rows.map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
      assert(codegen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("maxsim8: equals the local token-fold replay, >= pooled dot/8 bound sanity, codegen agrees") {
    GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(12)
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v")
    val df = emb.as("x").crossJoin(emb.as("y"))
      .selectExpr("x.vec_id AS a", "y.vec_id AS b",
        "x.v AS xv", "y.v AS yv", "maxsim8(x.v, y.v) AS ms")
    val rows = df.collect()
    rows.foreach { r =>
      val xv = r.getSeq[Long](2); val yv = r.getSeq[Long](3)
      val want = (0 until 8).map { i =>
        (0 until 8).map { j =>
          (0 until 8).map(k => xv(i * 8 + k) * yv(j * 8 + k)).sum
        }.max
      }.sum
      assert(r.getLong(4) == want,
        s"maxsim8 != replay for (${r.getLong(0)}, ${r.getLong(1)})")
      // each query token's best match is >= its aligned-token dot, so
      // maxsim >= the full pooled dot (sum of aligned dots)
      val pooled = (0 until 64).map(k => xv(k) * yv(k)).sum
      assert(r.getLong(4) >= pooled, "maxsim must dominate the aligned dot")
    }
    val codegen = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
      assert(codegen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("join_cbo_reorder: catalog stats flip the syntactic join order; rows unchanged") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    def leafTables(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Set[String] =
      p.collectLeaves().flatMap {
        case lr: LogicalRelation =>
          lr.catalogTable.map(_.identifier.table)
        case _ => None
      }.toSet
    val df = graft.operators.Joins.joinCboReorder(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // the deepest join under CBO must be the star order: orders ⋈
    // customer, with the fact table nowhere beneath it
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.length == 2, s"expected 2 joins, got ${joins.length}")
    val inner = joins.last
    val innerTables = leafTables(inner)
    assert(innerTables.exists(_.startsWith("graft_cbo_ord")) &&
      innerTables.exists(_.startsWith("graft_cbo_cust")) &&
      !innerTables.exists(_.startsWith("graft_cbo_li")),
      s"CBO must join orders to the filtered dimension first: $innerTables")
    // same SQL, CBO off (the parent session has no cbo flags): the
    // syntactic big-big order survives
    val sfx = sf.replaceAll("[^A-Za-z0-9]", "_") + "_" + math.abs(sf.hashCode)
    val raw = spark.sql(
      s"""SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         |  round(sum(l.l_extendedprice), 4) AS revenue
         |FROM graft_cbo_li_$sfx l
         |JOIN graft_cbo_ord_$sfx o ON l.l_orderkey = o.o_orderkey
         |JOIN graft_cbo_cust_$sfx c ON o.o_custkey = c.c_custkey
         |WHERE c.c_custkey < 100
         |GROUP BY o.o_orderpriority""".stripMargin)
    val offJoins = raw.queryExecution.optimizedPlan.collect { case j: Join => j }
    val offInner = leafTables(offJoins.last)
    assert(offInner.exists(_.startsWith("graft_cbo_li")) &&
      offInner.exists(_.startsWith("graft_cbo_ord")),
      s"without CBO the written fact-first order must survive: $offInner")
    // reorder changes plan shape, never results
    val want = raw.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, "reordered rows must equal the syntactic order's")
  }

  test("MvRollupRewrite: rollup aggregate re-targets the MV, exactly; guarded bails hold") {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import graft.plans.MvRollupRewrite
    def leafPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collectLeaves().flatMap {
        case lr: LogicalRelation => lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
        case _ => Nil
      }
    // the registered op: its ONLY file scan must be the MV, never the base
    val op = graft.operators.Aggregates.aggMvAutorewrite(spark, sf)
    val paths = leafPaths(op)
    assert(paths.nonEmpty && paths.forall(_.contains("mv_li")),
      s"rewritten plan must scan only the MV, got: $paths")
    // EXACT: rewritten result row-matches the plain aggregate (flag off)
    val want = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity"), 4).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        round(min($"l_quantity"), 4).as("min_qty"),
        round(max($"l_quantity"), 4).as("max_qty"))
      .orderBy($"l_returnflag", $"l_linestatus").collect().toSeq
    assert(op.collect().toSeq == want,
      "MV rollup must equal the base-scan aggregate exactly")
    // full-key grouping (no residual rollup) also re-targets and matches
    GraftExtensions.installOptimizations(spark)
    val mv = graft.operators.Aggregates.stagedMvDir(spark, sf)
    spark.conf.set(MvRollupRewrite.Flag, "true")
    spark.conf.set(MvRollupRewrite.PathConf, mv)
    spark.conf.set(MvRollupRewrite.BaseConf, "/lineitem.parquet")
    spark.conf.set(MvRollupRewrite.KeysConf,
      "l_returnflag,l_linestatus,l_linenumber")
    spark.conf.set(MvRollupRewrite.MeasuresConf,
      "sum:l_quantity=mv_sum_qty,min:l_quantity=mv_min_qty," +
        "max:l_quantity=mv_max_qty,count=mv_cnt")
    try {
      def threeKey = Tables.lineitem(spark, sf)
        .groupBy($"l_returnflag", $"l_linestatus", $"l_linenumber")
        .agg(round(sum($"l_quantity"), 4).as("sq"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag", $"l_linestatus", $"l_linenumber")
      assert(leafPaths(threeKey).forall(_.contains("mv_li")),
        "equal-key grouping must also re-target the MV")
      val gotFull = threeKey.collect().toSeq
      spark.conf.set(MvRollupRewrite.Flag, "false")
      val wantFull = threeKey.collect().toSeq
      spark.conf.set(MvRollupRewrite.Flag, "true")
      assert(gotFull == wantFull, "equal-key rewrite must be exact")
      // guarded bails: a residual filter, a non-decomposable aggregate,
      // and an off-MV key must each keep the base scan
      val filtered = Tables.lineitem(spark, sf)
        .where($"l_quantity" < 10)
        .groupBy($"l_returnflag").agg(sum($"l_quantity").as("s"))
      assert(leafPaths(filtered).forall(_.contains("lineitem")),
        "a filtered aggregate must NOT be rewritten")
      val avgd = Tables.lineitem(spark, sf)
        .groupBy($"l_returnflag").agg(avg($"l_quantity").as("a"))
      assert(leafPaths(avgd).forall(_.contains("lineitem")),
        "an avg aggregate must NOT be rewritten (not re-aggregable)")
      val offKey = Tables.lineitem(spark, sf)
        .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
      assert(leafPaths(offKey).forall(_.contains("lineitem")),
        "an off-MV grouping key must NOT be rewritten")
      // idempotent: the rewritten aggregate scans the MV, whose path
      // lacks the base marker — a second pass is a no-op
      val analyzed = Tables.lineitem(spark, sf)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("s"), count(lit(1)).as("n"))
        .queryExecution.analyzed
      val once = MvRollupRewrite(analyzed)
      assert(!once.fastEquals(analyzed), "rule must fire on the naive plan")
      val twice = MvRollupRewrite(once)
      assert(once.fastEquals(twice), "rule must be a fixed point")
    } finally {
      Seq(MvRollupRewrite.Flag, MvRollupRewrite.PathConf,
        MvRollupRewrite.BaseConf, MvRollupRewrite.KeysConf,
        MvRollupRewrite.MeasuresConf).foreach(spark.conf.unset)
    }
  }

  test("JoinEliminationRewrite: unused PK-FK join drops to one scan, exactly; bails hold") {
    import org.apache.spark.sql.functions.{col, count, expr, lit, max, sum}
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    GraftExtensions.installOptimizations(s)
    s.conf.set(graft.plans.JoinEliminationRewrite.Flag, "true")
    s.conf.set(graft.plans.JoinEliminationRewrite.DimConf, "customer.parquet")
    s.conf.set(graft.plans.JoinEliminationRewrite.PkConf, "c_custkey")
    s.conf.set(graft.plans.JoinEliminationRewrite.FkConf, "o_custkey")
    // the declared RELY constraints actually hold in the data — the
    // contract the rule trusts
    val ok = graft.Tables.orders(s, sf).alias("o")
      .join(graft.Tables.customer(s, sf).alias("c"),
        col("o.o_custkey") === col("c.c_custkey"), "left_anti").count()
    assert(ok == 0L, "referential integrity must hold in the fixture")
    assert(graft.Tables.customer(s, sf).groupBy(col("c_custkey"))
      .count().where(col("count") > 1).isEmpty, "pk must be unique")

    val df = graft.operators.Joins.joinEliminateQuery(s, sf)
    // plan shape: the join is GONE, exactly one file scan remains, and
    // the injected null guard survives
    val joins = collectFinal(df) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, "the PK-FK join must be eliminated")
    val scans = collectFinal(df) {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.size == 1 &&
      scans.head.relation.location.rootPaths.exists(
        _.toString.contains("orders")),
      "only the fact scan may remain")
    assert(df.queryExecution.optimizedPlan.toString.contains("isnotnull") ||
      scans.head.dataFilters.mkString.contains("isnotnull"),
      "the inner-join null semantics guard must be injected")
    // elimination is result-invisible: rule-off control on a plain
    // session replays the join
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2))
    val got = df.collect().map(key).toSet
    val ctrl = graft.operators.Joins.joinEliminateQuery(spark, sf)
      .collect().map(key).toSet
    assert(got == ctrl && got.nonEmpty)
    // registered demonstrator agrees
    assert(graft.operators.Joins.joinEliminateAutorewrite(spark, sf)
      .collect().map(key).toSet == ctrl)
    // bail: a query that READS a dim column keeps its join
    val reads = graft.Tables.orders(s, sf)
      .join(graft.Tables.customer(s, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("c_acctbal")).as("m"))
    val joins2 = collectFinal(reads) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins2.nonEmpty, "a referenced dimension must keep its join")
    // bail: a join on a NON-declared fact column (o_orderkey = pk) is a
    // genuine filter — referential integrity was promised for o_custkey
    // alone, so the join must survive (the unsound-elimination case the
    // FkConf declaration exists to close)
    val nonFk = graft.Tables.orders(s, sf)
      .join(graft.Tables.customer(s, sf),
        col("o_orderkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val joins3 = collectFinal(nonFk) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins3.nonEmpty, "a non-FK equi-join must keep its join")
    // bail (ADVICE r13): a fact side whose "o_custkey" is DERIVED — a
    // withColumn minting values the declaration never covered — must
    // keep its join; the rule anchors the fk by exprId lineage to a
    // file scan, and an Alias has a fresh exprId no scan carries
    // (pmod keeps the join NON-empty — an empty join would be replaced
    // by AQE's EmptyRelation propagation and hide the shape assert)
    val derived = graft.Tables.orders(s, sf)
      .withColumn("o_custkey", expr("pmod(o_custkey, 100) + 1"))
      .join(graft.Tables.customer(s, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val joins4 = collectFinal(derived) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins4.nonEmpty, "a derived fk column must keep its join")
    // bail (ADVICE r13): a union-derived fact side reuses the first
    // child's exprIds but can inject values RI never covered — the
    // lineage walk bails on Union
    val unioned = graft.Tables.orders(s, sf)
      .unionByName(graft.Tables.orders(s, sf)
        .withColumn("o_custkey", expr("pmod(o_custkey, 100) + 1")))
      .join(graft.Tables.customer(s, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val joins5 = collectFinal(unioned) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins5.nonEmpty, "a union-derived fact side must keep its join")
    // idempotence: re-optimizing the eliminated plan is a fixed point
    val once = df.queryExecution.optimizedPlan
    val twice = graft.plans.JoinEliminationRewrite(once)
    assert(twice.fastEquals(once), "rule must be a fixed point")
  }

  test("AggPushdownRewrite: partial aggregate lands below the join, results rule-off equal, bails hold") {
    import org.apache.spark.sql.functions.{avg, col, count, expr, lit, sum}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg, Join => LJoin}
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    GraftExtensions.installOptimizations(s)
    s.conf.set(graft.plans.AggPushdownRewrite.Flag, "true")
    val df = graft.operators.Joins.joinAggpushQuery(s, sf)
    val opt = df.queryExecution.optimizedPlan
    // shape: an aggregate sits BELOW the join (the pushed partial),
    // keyed on the fact join key, and the outer aggregate survives
    val joins = opt.collect { case j: LJoin => j }
    assert(joins.size == 1, s"expected one join, got ${joins.size}")
    val partial = joins.head.children.flatMap(_.collect {
      case a: LAgg => a
    })
    assert(partial.nonEmpty, "the partial aggregate must sit below the join")
    assert(partial.head.groupingExpressions.map(_.asInstanceOf[
      org.apache.spark.sql.catalyst.expressions.AttributeReference].name) ==
      Seq("o_custkey"), "partial keyed on the fact join key")
    assert(opt.collect { case a: LAgg => a }.size >= 2,
      "outer aggregate + pushed partial")
    // idempotence: re-applying the rule is a fixed point
    assert(graft.plans.AggPushdownRewrite(opt).fastEquals(opt))
    // the join probes |customers| partials, not |orders| facts
    df.collect()
    val aggs = collectFinal(df) {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
    }
    val nCust = graft.Tables.customer(s, sf).count()
    val nOrders = graft.Tables.orders(s, sf).count()
    val partialRows = aggs.map(_.metrics("numOutputRows").value)
      .filter(v => v > 0 && v <= nCust * 2)
    assert(partialRows.nonEmpty && partialRows.min < nOrders / 2,
      s"join input must shrink toward the key space: $partialRows vs $nOrders")
    // results are rule-off equal (cents_avg included — the avg
    // decomposition is exact on the integral cents)
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))
    val got = df.collect().map(key).toSet
    val ctrl = graft.operators.Joins.joinAggpushQuery(spark, sf)
      .collect().map(key).toSet
    assert(got == ctrl && got.nonEmpty)
    // registered demonstrator agrees
    assert(graft.operators.Joins.joinAggpushAutorewrite(spark, sf)
      .collect().map(key).toSet == ctrl)
    // avg FIRES (VERDICT r14 task 4): Σ partial_sum / Σ partial_count —
    // the partial lands below the join and, on an integral input, the
    // exact long partials + one final division reproduce Average's own
    // sum.toDouble / count bit-for-bit against the rule-off session
    def mkAvg(sess: org.apache.spark.sql.SparkSession) =
      graft.Tables.orders(sess, sf)
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .join(graft.Tables.customer(sess, sf)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(avg(col("cents")).as("m"), count(lit(1)).as("n"))
    val avgQ = mkAvg(s)
    val avgJoins = avgQ.queryExecution.optimizedPlan.collect {
      case j: LJoin => j
    }
    assert(avgJoins.nonEmpty &&
      avgJoins.head.children.flatMap(_.collect { case a: LAgg => a }).nonEmpty,
      "avg must decompose — partial below the join")
    def akey(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getDouble(1), r.getLong(2))
    val avgGot = avgQ.collect().map(akey).toSet
    val avgCtrl = mkAvg(spark).collect().map(akey).toSet
    assert(avgGot == avgCtrl && avgGot.nonEmpty,
      "avg rewrite must be rule-off equal (exact, integral input)")
    // bail: a fact-side grouping key that is not the fk keeps the plan
    val factKeyQ = graft.Tables.orders(s, sf)
      .select(col("o_custkey"), col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .join(graft.Tables.customer(s, sf)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("cents")).as("cs"), count(lit(1)).as("n"))
    val fkJoins = factKeyQ.queryExecution.optimizedPlan.collect {
      case j: LJoin => j
    }
    assert(fkJoins.nonEmpty &&
      fkJoins.head.children.flatMap(_.collect { case a: LAgg => a }).isEmpty,
      "a non-fk fact grouping key must bail")
  }

  test("AggPushdownRewrite: join-chain descent lands the partial below BOTH joins; TRY and count(NULL) guard") {
    import org.apache.spark.sql.functions.{avg, col, count, expr, lit, sum}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg, Join => LJoin}
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    GraftExtensions.installOptimizations(s)
    s.conf.set(graft.plans.AggPushdownRewrite.Flag, "true")
    // lineitem ⋈ part ⋈ supplier, grouped by dim attrs from BOTH dims:
    // the fact carries both join keys, so the partial must group by
    // (l_partkey, l_suppkey) and sit below the WHOLE chain (VERDICT r14
    // task 4 — fact pre-aggregates below the join chain)
    def mk(sess: org.apache.spark.sql.SparkSession) =
      graft.Tables.lineitem(sess, sf)
        .select(col("l_partkey"), col("l_suppkey"),
          expr("CAST(l_quantity AS BIGINT)").as("qty"))
        .join(graft.Tables.part(sess, sf)
          .select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .join(graft.Tables.supplier(sess, sf)
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_brand"), col("s_nationkey"))
        .agg(sum(col("qty")).as("sq"), avg(col("qty")).as("aq"),
          count(lit(1)).as("n"))
    val q = mk(s)
    val opt = q.queryExecution.optimizedPlan
    val joins = opt.collect { case j: LJoin => j }
    assert(joins.size == 2, s"expected the two-join chain, got ${joins.size}")
    // the INNERMOST join must already see the partial: one of its legs
    // is an Aggregate keyed on both fact join keys
    val innerJoin = joins.last
    val partial = innerJoin.children.collect {
      case a: LAgg => a
      case org.apache.spark.sql.catalyst.plans.logical.Project(_, a: LAgg) => a
    }
    assert(partial.nonEmpty, "partial aggregate must sit below the chain")
    val pKeys = partial.head.groupingExpressions.map(_.asInstanceOf[
      org.apache.spark.sql.catalyst.expressions.AttributeReference].name).toSet
    assert(pKeys == Set("l_partkey", "l_suppkey"),
      s"partial keyed on BOTH collected fact keys, got $pKeys")
    // results are rule-off equal (integral input → exact everywhere)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))
    val got = q.collect().map(key).toSet
    val ctrl = mk(spark).collect().map(key).toSet
    assert(got == ctrl && got.nonEmpty, "chain rewrite must be rule-off equal")
    // idempotence on the chain shape
    assert(graft.plans.AggPushdownRewrite(opt).fastEquals(opt))
    // guard: TRY eval mode bails (try_sum's null-on-overflow scope is
    // the single-level group — ADVICE r14)
    val tryQ = graft.Tables.orders(s, sf)
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .join(graft.Tables.customer(s, sf)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(expr("try_sum(cents)").as("ts"))
    val tryJoins = tryQ.queryExecution.optimizedPlan.collect { case j: LJoin => j }
    assert(tryJoins.nonEmpty &&
      tryJoins.head.children.flatMap(_.collect { case a: LAgg => a }).isEmpty,
      "try_sum must bail — no partial below the join")
    // orientation: the fact may sit on EITHER side — a count(*)-only
    // aggregate covers both legs, and rejecting the dim-side candidate
    // (grouping key lives there) must rotate to the fact side, not
    // abandon the rewrite (r15 self-review)
    def mkFlip(sess: org.apache.spark.sql.SparkSession) =
      graft.Tables.customer(sess, sf)
        .select(col("c_custkey"), col("c_nationkey"))
        .join(graft.Tables.orders(sess, sf).select(col("o_custkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
    val flipped = mkFlip(s)
    val fJoins = flipped.queryExecution.optimizedPlan.collect {
      case j: LJoin => j
    }
    assert(fJoins.nonEmpty && fJoins.head.children.flatMap(_.collect {
      case a: LAgg => a
    }).nonEmpty,
      "dim-on-the-left count(*) must still push the partial below the join")
    assert(flipped.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
      mkFlip(spark).collect().map(r => (r.getInt(0), r.getLong(1))).toSet)
    // guard: count(NULL) is 0 everywhere and must NOT be rewritten into
    // a row count (ADVICE r14) — values stay 0 with the rule on
    val nullQ = graft.Tables.orders(s, sf)
      .select(col("o_custkey"))
      .join(graft.Tables.customer(s, sf)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(expr("count(CAST(NULL AS BIGINT))").as("cn"))
    val cnVals = nullQ.collect().map(_.getLong(1)).toSet
    assert(cnVals == Set(0L), s"count(NULL) must stay 0, got $cnVals")
  }

  test("JoinEliminationRewrite distinct: unique-key DISTINCT drops its shuffle, exactly") {
    import org.apache.spark.sql.functions.col
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    GraftExtensions.installOptimizations(s)
    s.conf.set(graft.plans.JoinEliminationRewrite.Flag, "true")
    s.conf.set(graft.plans.JoinEliminationRewrite.DimConf, "customer.parquet")
    s.conf.set(graft.plans.JoinEliminationRewrite.PkConf, "c_custkey")
    s.conf.set(graft.plans.JoinEliminationRewrite.FkConf, "o_custkey")
    val df = graft.operators.Joins.aggDistinctQuery(s, sf)
    // the de-duplicating aggregate AND its exchange are gone
    val aggs = collectFinal(df) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
    }
    assert(aggs.isEmpty, "unique-key DISTINCT must drop its aggregate")
    val exchanges = collectFinal(df) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "no shuffle may remain")
    // result-invisible vs the rule-off control
    val got = df.collect()
      .map(r => (r.getLong(0), r.get(1).asInstanceOf[Number].longValue))
      .toSet
    val ctrl = graft.operators.Joins.aggDistinctQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.get(1).asInstanceOf[Number].longValue))
      .toSet
    assert(got == ctrl && got.size == ctrl.size && got.nonEmpty)
    // bail: a DISTINCT that EXCLUDES the unique key keeps its aggregate
    // (c_nationkey alone genuinely has duplicates)
    val bail = graft.Tables.customer(s, sf).select(col("c_nationkey"))
      .distinct()
    val bailAggs = collectFinal(bail) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(bailAggs.nonEmpty, "keyless DISTINCT must keep its aggregate")
    assert(bail.count() < graft.Tables.customer(s, sf).count())
  }
}
