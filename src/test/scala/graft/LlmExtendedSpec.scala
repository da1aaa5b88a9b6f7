package graft

import graft.operators.LlmExtended

class LlmExtendedSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft-test-llmx"

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): Unit =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("simhash: identical docs at hamming 0, near docs small, far docs not paired") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 40).map(i => if (i % 19 == 0) "CHANGED" else s"tok$i").mkString(" ")
    val far = (200 to 240).map(i => s"other$i").mkString(" ")
    writeDocs(Seq(
      (1L, base, "en", "s", 1L), (2L, base, "en", "s", 1L),
      (3L, near, "en", "s", 1L), (4L, far, "en", "s", 1L)))
    val got = LlmExtended.dedupSimhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.exists { case (a, b, h) => a == 1L && b == 2L && h == 0L })
    assert(!got.exists { case (a, b, _) => b == 4L || a == 4L })
  }

  test("ngram jaccard joins only overlapping docs") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    writeDocs(Seq(
      (1L, base, "en", "s", 1L),
      (2L, base + " extra", "en", "s", 1L),
      (3L, "completely different words here now", "en", "s", 1L)))
    val got = LlmExtended.dedupNgram(spark, dir).collect()
    assert(got.length == 1)
    assert(got.head.getDouble(2) > 0.9)
  }

  test("containment catches doc-inside-doc that Jaccard misses, asymmetrically") {
    // doc 1 is the exact 12-token prefix of the 60-token doc 2: Jaccard
    // (5 shared grams / 58 union) ≈ 0.09 — far below dedup_ngram's τ=0.5
    // — but C(1→2) = 1.0. The reverse direction must NOT flag doc 2.
    val short = (1 to 12).map(i => s"w$i").mkString(" ")
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"z$i").mkString(" ")
    writeDocs(Seq(
      (1L, short, "en", "s", 1L), (2L, long, "en", "s", 1L),
      (3L, other, "en", "s", 1L)))
    val out = LlmExtended.dedupContainment(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_grams") == 5 && r1.getAs[Long]("shared") == 5)
    assert(r1.getAs[Long]("best_id") == 2L)
    assert(r1.getAs[Boolean]("contained"))
    assert(r1.getAs[Double]("containment") == 1.0)
    val r2 = out(2L)
    assert(!r2.getAs[Boolean]("contained"),
      "containment must stay asymmetric: the long doc is not contained")
    // the 5-gram doc is no PLAUSIBLE container for a 53-gram doc
    // (|G(B)| ≥ 0.8·|G(A)| is implied by C ≥ 0.8): the size gate kills
    // the pair before the aggregate, so the long doc reports no match
    assert(r2.getAs[Long]("n_grams") == 53 && r2.getAs[Long]("shared") == 0)
    assert(r2.isNullAt(r2.fieldIndex("best_id")),
      "size-ineligible candidates must not surface as best container")
    assert(!out(3L).getAs[Boolean]("contained"))
    assert(out(3L).getAs[Long]("shared") == 0)
    // fixture-wide invariants: exactly one row per doc, bounded stats,
    // gate consistent with the exact integer rule
    val rows = LlmExtended.dedupContainment(spark, sf).collect()
    assert(rows.length.toLong == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (n, sh) = (r.getAs[Long]("n_grams"), r.getAs[Long]("shared"))
      assert(sh >= 0 && sh <= n)
      val c = r.getAs[Double]("containment")
      assert(c >= 0.0 && c <= 1.0)
      assert(r.getAs[Boolean]("contained") == (n > 0 && sh * 5 >= n * 4))
    }
  }

  test("ann_ivf neighbors are a subset of probed cells with high self-cell recall") {
    val ivf = LlmExtended.annIvf(spark, sf).collect()
    assert(ivf.nonEmpty)
    val perQ = ivf.groupBy(_.getLong(0))
    perQ.foreach { case (_, rows) =>
      assert(rows.length <= 3)
      val cs = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lang_id recognizes marker-bearing snippets") {
    writeDocs(Seq(
      (1L, "the cat and the dog of a house", "en", "s", 1L),
      (2L, "der hund und die katze ist da", "de", "s", 1L),
      (3L, "le chat et les maisons est grand", "fr", "s", 1L),
      (4L, "xyzzy plugh qwerty", "en", "s", 1L)))
    val got = LlmExtended.langId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "fr")
    assert(got(4L) == "und")
  }

  test("quality score stays in [0, 1] and rewards clean text") {
    val rows = LlmExtended.qualityScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getDouble(1)
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("token counts agree between whitespace and regex on the fixture vocab") {
    val r = LlmExtended.tokenCount(spark, sf)
      .where($"ws_tokens" =!= $"re_tokens").count()
    // fixture text is lowercase words joined by single spaces → equal
    assert(r == 0)
  }

  test("tokenizer_fertility: reconciles with per-doc token counts, bp math exact") {
    val out = LlmExtended.tokenizerFertility(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"doc_id", $"text").collect()
    assert(out.keySet == docs.map(_.getString(0)).toSet)
    val byLang = docs.groupBy(_.getString(0))
    out.foreach { case (lang, r) =>
      assert(r.getAs[Long]("n_docs") == byLang(lang).length.toLong)
      val chars = byLang(lang).map(_.getString(2).length.toLong).sum
      assert(r.getAs[Long]("n_chars") == chars, s"$lang: char mass")
      val (ws, re) = (r.getAs[Long]("ws_tokens"), r.getAs[Long]("re_tokens"))
      assert(r.getAs[Long]("fertility_bp") == re * 10000 / ws)
      assert(r.getAs[Long]("chars_per_tok_bp") == chars * 10000 / re)
      // fixture text is space-joined [a-z0-9] words → fertility ≈ 1.0
      // for latin langs; the zh marker docs may diverge
      if (lang != "zh")
        assert(r.getAs[Long]("fertility_bp") == 10000, s"$lang fertility")
    }
  }

  test("fingerprint clusters exact duplicates") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    writeDocs(Seq(
      (1L, base, "en", "s", 1L), (2L, base, "en", "s", 1L),
      (3L, "another doc body words many going on", "en", "s", 1L)))
    val got = LlmExtended.fingerprint(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 2 && got(2L) == 2 && got(3L) == 1)
  }

  test("media decode derives deterministic features from bytes") {
    val rows = LlmExtended.mediaDecode(spark, sf).limit(20).collect()
    rows.foreach { r =>
      assert(r.getLong(1) > 0)                       // n_bytes
      assert(r.getLong(2) == r.getLong(1) / 40)      // n_frames
      val hm = r.getDouble(3)
      assert(hm > 32.0 && hm < 127.0)                // printable ASCII mean
    }
  }

  test("dedup_ngram hash-order twin replays the rarest-first flagship") {
    // both prefixes satisfy the theorem under their respective global
    // orders, so the verified pair sets must coincide pair-for-pair
    def k(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).sorted.toSeq
    val flag = k(LlmExtended.dedupNgram(spark, sf))
    assert(flag.nonEmpty)
    assert(k(LlmExtended.dedupNgramHash(spark, sf)) == flag,
      "prefix ordering must be candidate-lossless")
  }

  test("dhash72 through the binaryFile front door equals the in-plane envelope hash") {
    // the registered llm_dedup_phash hashes the utf-8 envelope blob
    // in-plane; a production media corpus arrives as FILES — prove the
    // same kernel over scan_binaryfile's staged blobs (the real
    // distributed binary scan) yields byte-identical fingerprints
    GraftExtensions.register(spark)
    def phMap(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Seq[Long]]] =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1).toSeq))).toMap
    val binDir = graft.operators.Scans.stagedBinDir(spark, sf)
    val fromFiles = phMap(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.txt").load(binDir)
      .selectExpr(
        "CAST(regexp_extract(path, 'doc_(\\\\d+)\\\\.txt$', 1) AS BIGINT) AS doc_id",
        "dhash72(content) AS ph"))
    val inPlane = phMap(graft.Tables.documents(spark, sf)
      .where($"doc_id" < 50)
      .selectExpr("doc_id", "dhash72(encode(text, 'UTF-8')) AS ph"))
    assert(fromFiles.keySet == inPlane.keySet)
    assert(fromFiles == inPlane,
      "file-scanned blobs must fingerprint identically to envelope blobs")
    assert(fromFiles.values.flatten.nonEmpty)
  }

  test("phash frontdoor: plan scans binaryFile, LSH rows replay in-plane") {
    // the REGISTERED front-door op (r12): its physical plan must read
    // through the binaryFile source (the distributed media scan), and
    // its LSH index rows must equal the in-plane derivation from the
    // same staged slice — stage → binary scan → hash → LSH end to end
    GraftExtensions.register(spark)
    val out = LlmExtended.dedupPhashFrontdoor(spark, sf)
    val scans = out.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scans.toLowerCase.contains("binaryfile"),
      s"front door must scan through the binaryFile source:\n$scans")
    def k(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5))).toSet
    val got = k(out.select($"doc_id", $"length", $"ph_hi", $"ph_lo",
      $"blk", $"bv"))
    assert(got.nonEmpty)
    val inPlane = k(Tables.documents(spark, sf)
      .where($"doc_id" < 50)
      .selectExpr("doc_id",
        "CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT) AS length",
        "dhash72(encode(text, 'UTF-8')) AS ph")
      .where($"ph".isNotNull)
      .selectExpr("doc_id", "length",
        "element_at(ph, 1) AS ph_hi", "element_at(ph, 2) AS ph_lo",
        "explode(sequence(0, 3)) AS blk")
      .selectExpr("doc_id", "length", "ph_hi", "ph_lo", "blk",
        """CASE blk WHEN 0 THEN ph_hi & 65535
          |     WHEN 1 THEN shiftright(ph_hi, 16) & 65535
          |     WHEN 2 THEN ph_lo & 65535
          |     ELSE shiftright(ph_lo, 16) & 65535 END AS bv""".stripMargin))
    assert(got == inPlane,
      s"front-door LSH rows must equal the in-plane replay (${got.size} vs ${inPlane.size})")
  }

  test("dedup_url: variant groups fold to one https canonical, scheme stays identity") {
    val rows = LlmExtended.dedupUrl(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val byUrl = rows.map(t => t._1 -> (t._2, t._3)).toMap
    // group 0 = doc_ids 0..3: the three https variants (clean,
    // CASE+:443+slash, utm) fold to ONE canonical keyed by doc 0; the
    // http variant (doc 3) keeps its own identity
    assert(byUrl("https://example.org/articles/0?id=0") == ((3L, 0L)),
      s"https variants must fold: ${rows.filter(_._1.contains("/0?"))}")
    assert(byUrl("http://example.org/articles/0?id=0") == ((1L, 3L)),
      "http is identity, not noise — must stay its own canonical")
    // no canonical carries residue the folding rules should have removed
    assert(rows.forall { case (u, _, _) =>
      !u.contains("utm_") && !u.contains("#") && !u.contains(":443") &&
        !u.contains(":80") && u == u.replaceAll("^HTTPS", "https")
    }, "canonical URLs must be fully folded")
    // every doc is accounted for exactly once across canonicals
    val total = rows.map(_._2).sum
    assert(total == Tables.documents(spark, sf).count(),
      s"dedup must partition the corpus: $total")
  }

  test("dedup_embed: bucketed equi-join plan, equals brute force in-bucket") {
    import org.apache.spark.sql.functions.expr
    graft.GraftExtensions.register(spark)
    val out = LlmExtended.dedupEmbed(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
        && !plan.contains("BroadcastNestedLoopJoin"),
      "dedup_embed must join on the cell key, never cross-join")
    // semantic contract: exactly the cos ≥ 0.5 pairs whose sign cells sit
    // within hamming distance 1 — the documented LSH recall trade
    val cellExpr =
      """aggregate(transform(sequence(0, 7),
        |  i -> IF(element_at(embedding, i + 1) > 0, shiftleft(1, i), 0)),
        |0, (a, x) -> a + x)""".stripMargin
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", expr(cellExpr).as("cell"))
    val exact = e.as("a").crossJoin(e.as("b"))
      .where($"a.vec_id" < $"b.vec_id")
      .where(expr("bit_count(a.cell ^ b.cell) <= 1"))
      .where(expr("cosine_sim(a.embedding, b.embedding) >= 0.5"))
      .count()
    assert(out.count() == exact,
      "bucketed result must equal the in-bucket brute force")
  }

  test("unicode_normalize: composed/decomposed unify; normalize chain goldens") {
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    // the SAME visual string in composed (U+00E9/U+00C9) and decomposed
    // (base + U+0301) encodings — different bytes, one canonical form
    val composed = "Café  du \tMondÉ"
    val decomposed = "Café  du \tMondÉ"
    val df = Seq(composed, decomposed).toDF("text")
      .withColumn("nfd", expr("unicode_normalize(text, 'NFD')"))
      .withColumn("stripped", regexp_replace(col("nfd"), "\\p{Mn}", ""))
      .withColumn("nfc", expr("unicode_normalize(stripped, 'NFC')"))
      .withColumn("norm", trim(regexp_replace(lower(col("nfc")), "\\s+", " ")))
    val norms = df.select(col("norm")).collect().map(_.getString(0))
    assert(norms.toSet == Set("cafe du monde"), norms.toSeq.toString)
    // NFC equality of the two raw encodings (before stripping)
    val nfcs = df.select(expr("unicode_normalize(lower(text), 'NFC')"))
      .collect().map(_.getString(0))
    assert(nfcs(0) == nfcs(1), "NFC must unify composed and decomposed")
    // ASCII fast path: identity (same UTF8String value)
    val id = Seq("plain ascii").toDF("t")
      .select(expr("unicode_normalize(t, 'NFKC')")).collect().head.getString(0)
    assert(id == "plain ascii")
    // null propagation + constant-form enforcement
    assert(Seq(Option.empty[String]).toDF("t")
      .select(expr("unicode_normalize(t, 'NFC')")).collect().head.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("t").select(expr("unicode_normalize(t, 'BOGUS')")).collect()
    }
  }
}
