package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style algebraic checks (SURVEY.md §5.3) on generated data.
  * Data is generated once with fixed scalacheck seeds and pushed through
  * Spark as single DataFrames — one job per property, not per sample.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    LazyList.iterate(Seed(seed))(_.next)
      .flatMap(s => g.apply(Gen.Parameters.default, s))
      .take(n).toList

  test("partial+final aggregation ≡ single pass (repartition invariance)") {
    val rows = sample(Gen.zip(Gen.choose(0, 5), Gen.choose(-1e6, 1e6)), 2000, 7L)
      .toDF("k", "v")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k")
        .agg(count(lit(1)).as("n"), round(sum($"v"), 2).as("s"),
          min($"v").as("mn"), max($"v").as("mx"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toMap
    assert(agg(rows) == agg(rows.repartition(17)))
    assert(agg(rows) == agg(rows.coalesce(1)))
  }

  test("union-distinct algebra: (A ∪ B)ᵈ == (Aᵈ ∪ Bᵈ)ᵈ") {
    val a = sample(Gen.choose(0L, 300L), 500, 11L).toDF("k")
    val b = sample(Gen.choose(200L, 500L), 500, 13L).toDF("k")
    val lhs = a.union(b).distinct().as[Long].collect().toSet
    val rhs = a.distinct().union(b.distinct()).distinct().as[Long].collect().toSet
    assert(lhs == rhs)
  }

  test("cosine_sim: self≈1, symmetric, bounded, scale-invariant") {
    GraftExtensions.register(spark)
    val vecGen = Gen.listOfN(16, Gen.choose(-10.0f, 10.0f))
      .suchThat(_.exists(_ != 0.0f))
    val vecs = sample(Gen.zip(vecGen, vecGen), 200, 17L)
      .map { case (a, b) => (a, b) }.toDF("a", "b")
    val checked = vecs.selectExpr(
      "cosine_sim(a, a) AS self",
      "cosine_sim(a, b) AS ab",
      "cosine_sim(b, a) AS ba",
      "cosine_sim(transform(a, x -> x * 3.0F), b) AS scaled")
      .collect()
    checked.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-6, s"self=${r.getDouble(0)}")
      assert(r.getDouble(1) == r.getDouble(2), "symmetry must be exact")
      assert(r.getDouble(1) >= -1.0 - 1e-9 && r.getDouble(1) <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-6,
        "cosine is scale-invariant")
    }
  }

  test("MinHash signature agreement estimates Jaccard within ε") {
    // construct doc pairs with known overlap: k shared tokens out of 60
    val docs = (0 until 20).flatMap { p =>
      val shared = (0 until p * 3).map(i => s"s${p}_$i")
      val ua = (0 until 60 - p * 3).map(i => s"a${p}_$i")
      val ub = (0 until 60 - p * 3).map(i => s"b${p}_$i")
      Seq((p.toLong * 2, (shared ++ ua).mkString(" ")),
        (p.toLong * 2 + 1, (shared ++ ub).mkString(" ")))
    }.toDF("doc_id", "text")
    val sigs = graft.operators.LlmOps.withSignature(
      graft.operators.LlmOps.withShingles(docs))
      .select($"doc_id", $"shingles", $"sig")
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1).toSet, r.getSeq[Long](2))).toMap
    (0 until 20).foreach { p =>
      val (sa, siga) = sigs(p.toLong * 2)
      val (sb, sigb) = sigs(p.toLong * 2 + 1)
      val trueJ =
        if (sa.isEmpty && sb.isEmpty) 1.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      val est = siga.zip(sigb).count { case (x, y) => x == y } / 32.0
      // 32 hashes → σ = sqrt(J(1-J)/32) ≤ 0.09; allow 3.5σ
      assert(math.abs(est - trueJ) < 0.32,
        s"pair $p: trueJ=$trueJ est=$est")
    }
  }

  test("levenshtein length-guard is sound: lev(a,b) >= |len(a)-len(b)| always") {
    val strGen = Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)
    val pairs = sample(Gen.zip(strGen, strGen), 500, 23L).toDF("a", "b")
    val violations = pairs
      .where(levenshtein($"a", $"b") < abs(length($"a") - length($"b")))
      .count()
    assert(violations == 0, "guard would drop qualifying rows")
  }

  test("hash-gate sampling is deterministic and rate-proportional") {
    val ids = sample(Gen.choose(1L, 1000000L), 3000, 29L).distinct.toDF("id")
    def sampleAt(rate: Double) = ids
      .where(pmod($"id" * 2654435761L, lit(4294967296L)) <
        floor(lit(rate) * 4294967296.0).cast("long"))
      .as[Long].collect().toSet
    val s30a = sampleAt(0.30); val s30b = sampleAt(0.30)
    assert(s30a == s30b, "same gate must select identical rows")
    // nested: a higher rate strictly contains a lower one (auditable resampling)
    assert(sampleAt(0.10).subsetOf(s30a))
    // proportional within sampling noise
    val n = ids.count().toDouble
    assert(math.abs(s30a.size / n - 0.30) < 0.05)
  }

  test("knuth32 split gate is total over the full long range and matches BigInt") {
    // the naive (id & 0xFFFFFFFF)·K product overflows 2^63 for
    // id ≥ ~3.47e9; the split-halves form must evaluate (not throw,
    // even under ANSI) and agree with exact BigInt arithmetic at the
    // extremes a 100 TB id space reaches
    val ids = (sample(Gen.choose(0L, Long.MaxValue), 500, 31L)
      ++ Seq(0L, 1L, 3470000000L, Int.MaxValue.toLong,
        Long.MaxValue - 1, Long.MaxValue)).distinct
    val got = ids.toDF("doc_id")
      .select($"doc_id",
        graft.operators.LlmCuration.knuth32($"doc_id").as("h"))
      .as[(Long, Long)].collect().toMap
    val K = BigInt(2654435761L)
    ids.foreach { id =>
      val want = ((BigInt(id & 0xFFFFFFFFL) * K) mod BigInt(4294967296L))
      assert(BigInt(got(id)) == want, s"id $id: got ${got(id)}, want $want")
      assert(got(id) >= 0 && got(id) < 4294967296L)
    }
  }

  test("native hash kernels ≡ HOF witnesses on random unicode token streams") {
    GraftExtensions.register(spark)
    // tokens mix ascii words, empties (double spaces), unicode incl.
    // surrogate pairs — the byte-level edge set the corpus never covers
    val tokGen = Gen.frequency(
      6 -> Gen.alphaNumStr.map(_.take(8)),
      2 -> Gen.oneOf("π", "€", "𝄞", "日本", "côté"),
      1 -> Gen.const(""))
    val docGen = Gen.choose(0, 24)
      .flatMap(n => Gen.listOfN(n, tokGen)).map(_.mkString(" "))
    val docs = sample(docGen, 400, 23L).toDF("text")
      .withColumn("toks", split($"text", " "))
    val shingleHof =
      """CASE WHEN size(toks) >= 3 THEN
        |  array_distinct(element_at(transform(array(
        |    transform(toks, w -> IF(w = '', named_struct('h', 0L, 'p', 1L),
        |      aggregate(split(w, ''), named_struct('h', 0L, 'p', 1L),
        |        (s, c) -> named_struct(
        |          'h', (s.h * 31 + ascii(c)) % 1000000007,
        |          'p', (s.p * 31) % 1000000007))))),
        |    wh -> transform(sequence(1, size(toks) - 2),
        |      i -> (((((element_at(wh, i).h * 31 + 32) % 1000000007)
        |              * element_at(wh, i + 1).p + element_at(wh, i + 1).h) % 1000000007
        |              * 31 + 32) % 1000000007
        |              * element_at(wh, i + 2).p + element_at(wh, i + 2).h) % 1000000007)),
        |    1))
        |ELSE array() END""".stripMargin
    val gramHof =
      """CASE WHEN size(toks) >= 4 THEN
        |  transform(sequence(1, size(toks) - 3),
        |    i -> xxhash64(concat_ws(' ', slice(toks, i, 4))))
        |ELSE array() END""".stripMargin
    val bad = docs.select(
      expr("poly_shingles(toks)").as("ps_n"), expr(shingleHof).as("ps_h"),
      expr("xx_ngram_hashes(toks, 4)").as("xg_n"), expr(gramHof).as("xg_h"),
      expr("minhash_sig(xx_ngram_hashes(toks, 4), 8)").as("ms_n"),
      expr("""array(
        |  array_min(transform(xx_ngram_hashes(toks, 4), x -> xxhash64(x, 0L))),
        |  array_min(transform(xx_ngram_hashes(toks, 4), x -> xxhash64(x, 1L))),
        |  array_min(transform(xx_ngram_hashes(toks, 4), x -> xxhash64(x, 2L))),
        |  array_min(transform(xx_ngram_hashes(toks, 4), x -> xxhash64(x, 3L))),
        |  array_min(transform(xx_ngram_hashes(toks, 4), x -> xxhash64(x, 4L))),
        |  array_min(transform(xx_ngram_hashes(toks, 4), x -> xxhash64(x, 5L))),
        |  array_min(transform(xx_ngram_hashes(toks, 4), x -> xxhash64(x, 6L))),
        |  array_min(transform(xx_ngram_hashes(toks, 4), x -> xxhash64(x, 7L)))
        |)""".stripMargin).as("ms_h"))
      .where(expr(
        "NOT (ps_n <=> ps_h) OR NOT (xg_n <=> xg_h) OR NOT (ms_n <=> ms_h)"))
    assert(bad.count() == 0,
      "native kernels must match their HOF witnesses on generated input")
  }

  test("containment dominates Jaccard and detects plants on random corpora") {
    // random word-stream docs + engineered containment plants: for every
    // doc pair, J(A,B) ≤ min(C(A→B), C(B→A)) (union ≥ each side), and a
    // doc whose gram set is a subset of another's must flag contained.
    val vocab = (0 until 40).map(i => s"t$i")
    val wordSeq = Gen.choose(12, 80).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, vocab.size - 1)))
    // one generator draw for ALL docs: the per-sample Seed.next chain
    // yields shifted (correlated) token streams — docs must be
    // independent or the planted-prefix assertions tie across docs
    val bodies = sample(Gen.listOfN(30, wordSeq), 1, 99L).head
      .map(_.map(vocab).mkString(" "))
    val docs = bodies.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // plants: ids 1000+i carry the exact 16-token prefix of doc i
    val plants = docs.take(5).map { case (id, t) =>
      (1000L + id, t.split(" ").take(16).mkString(" "))
    }
    val dir = "/tmp/graft-test-prop-containment"
    (docs ++ plants).map { case (id, t) => (id, t, "en", "p", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.LlmExtended.dedupContainment(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    plants.foreach { case (pid, _) =>
      val r = out(pid)
      assert(r.getAs[Boolean]("contained"),
        s"planted prefix doc $pid not flagged (shared=${r.getAs[Long]("shared")})")
      assert(r.getAs[Double]("containment") == 1.0)
      assert(r.getAs[Long]("best_id") == pid - 1000L,
        "best container should be the source doc")
    }
    // J ≤ C on the full pair lattice, via the op's own outputs: shared ≤
    // n_grams on every row is the single-sided form (J's denominator is
    // the union, C's is one side)
    out.values.foreach { r =>
      assert(r.getAs[Long]("shared") <= r.getAs[Long]("n_grams"))
    }
  }

  test("window running sum telescopes: last running_total == group sum") {
    val df = graft.operators.Windows.winFrameRows(spark, sf)
    val lastPerGroup = df.groupBy($"o_custkey")
      .agg(max(struct($"running_n", $"running_total")).as("m"))
      .select($"o_custkey", $"m.running_total".as("rt"))
    val direct = Tables.orders(spark, sf).groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 4).as("st"))
    val joined = lastPerGroup.join(direct, "o_custkey")
      .where(abs($"rt" - $"st") > 1e-6)
    assert(joined.count() == 0)
  }
}
