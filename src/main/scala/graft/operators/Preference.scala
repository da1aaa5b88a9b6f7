package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Preference / annotation-quality operators (round 9): inter-judge
  * agreement and pairwise-preference rating — the measurement layer a
  * human-feedback (RLHF/eval) pipeline runs OVER its preference data
  * before trusting it: "do my raters agree beyond chance" (Cohen's
  * kappa) and "what global ranking do the pairwise outcomes imply"
  * (Bradley–Terry).
  *
  * Numeric discipline (SURVEY §5.4): ratings and win counts are exact
  * integers end-to-end; Bradley–Terry runs on an INTEGER fixed-point
  * lattice (10⁶-scale ratings, 10¹⁵-scale update quotients, floor
  * division) so both engines walk identical iterates — a float BT
  * would drift in the cross-row sums. Kappa's final combination runs
  * in doubles from exact integer operands (the assortativity rule:
  * n² products overflow BIGINT at production corpus sizes).
  */
object Preference extends OpModule {

  private val docFeatures = (s: SparkSession, d: String) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("tok"))).as("sl"),
        count_distinct(col("tok")).as("nd"),
        max(col("n_chars")).as("nc"))

  /** Cohen's kappa between three deterministic judges, pairwise. Each
    * judge rates every document on a 3-level scale from a DIFFERENT
    * exact-integer feature (mean token length / chars-per-token /
    * type-token ratio, fixed-point thresholds at the fixture's
    * terciles), standing in for the model-or-human raters whose
    * agreement an RLHF pipeline must audit before training on their
    * labels. Per judge pair: observed agreement, chance agreement from
    * the label marginals, and κ = (A·n − P)/(n² − P) where A = agreed
    * docs and P = Σ_k m₁[k]·m₂[k] — all exact integers, the final
    * ratio in doubles (n² passes 2⁵³ only beyond 10⁸ docs per rater
    * pool, noted).
    *
    * Scale shape: one token-explode aggregate for the features (the
    * rlhf_pairs pass), per-row rating CASEs, then the pair join keys
    * on doc_id (3 rows per doc — constant fan-out) and every
    * aggregate after runs on |pairs| = 3 or |judges|·|labels| = 9
    * rows. Nothing global ever materializes. */
  def judgeAgreement(s: SparkSession, d: String): DataFrame = {
    val rated = docFeatures(s, d)
      .withColumn("f1", expr("sl * 10000 div n"))
      .withColumn("f2", expr("nc * 10000 div n"))
      .withColumn("f3", expr("nd * 10000 div n"))
      .select(col("doc_id"), explode(array(
        struct(lit(1).as("judge"),
          when(col("f1") < 44000, 0L).when(col("f1") < 46000, 1L)
            .otherwise(2L).as("label")),
        struct(lit(2).as("judge"),
          when(col("f2") < 54000, 0L).when(col("f2") < 56000, 1L)
            .otherwise(2L).as("label")),
        struct(lit(3).as("judge"),
          when(col("f3") < 4000, 0L).when(col("f3") < 5500, 1L)
            .otherwise(2L).as("label")))).as("r"))
      .select(col("doc_id"), col("r.judge").as("judge"),
        col("r.label").as("label"))
    val pairs = rated.as("x")
      .join(rated.as("y"),
        col("x.doc_id") === col("y.doc_id")
          && col("x.judge") < col("y.judge"))
      .groupBy(col("x.judge").as("j1"), col("y.judge").as("j2"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("x.label") === col("y.label"), 1L).otherwise(0L))
          .as("n_agree"))
    val marg = rated.groupBy(col("judge"), col("label"))
      .agg(count(lit(1)).as("cnt"))
    val pe = marg.as("m1")
      .join(marg.as("m2"),
        col("m1.label") === col("m2.label")
          && col("m1.judge") < col("m2.judge"))
      .groupBy(col("m1.judge").as("j1"), col("m2.judge").as("j2"))
      .agg(sum(col("m1.cnt") * col("m2.cnt")).as("pe_num"))
    pairs.join(pe, Seq("j1", "j2"))
      .select(col("j1"), col("j2"), col("n"), col("n_agree"),
        expr("n_agree * 10000 div n").as("po_bp"),
        col("pe_num"),
        expr("pe_num * 10000 div (n * n)").as("pe_bp"),
        round((col("n_agree").cast("double") * col("n") - col("pe_num"))
          / (col("n").cast("double") * col("n") - col("pe_num")), 6)
          .as("kappa"))
  }

  /** Bradley–Terry rating over pairwise source-quality outcomes: each
    * language slice stages one "match" per source pair, decided by the
    * exact rational mean-token-length comparison sl_a·n_b vs sl_b·n_a
    * (ties dropped); three BT fixed-point iterations
    * p_i ← w_i / Σ_j n_ij/(p_i + p_j) then rank sources by rating —
    * the global-ranking synthesis every pairwise-eval pipeline
    * (chat arenas, judge tournaments) runs over its win matrix.
    *
    * The iteration runs ENTIRELY on an integer lattice: ratings at 10⁶
    * fixed point, each pair quotient floor-divided at 10¹⁵ scale
    * (n_ij·10¹⁵ div (p_i+p_j) ≈ n/(p_i+p_j)·10⁹, exact), per-source
    * sums exact BIGINT, and the update w_i·10¹⁵ div S_i clamped to
    * ≥ 1 so an all-losses source cannot zero the next round's
    * denominator. Magnitude bound: w_i ≤ |langs|·|sources| keeps
    * w·10¹⁵ under 2⁶³ through |langs|·|sources| ≲ 9 000 (noted).
    *
    * Scale shape: the corpus collapses ONCE into |langs|·|sources|
    * slice rows; the match join, win matrix (≤ |sources|² rows), and
    * all three BT rounds run on broadcast-size tables — the heavy
    * lift is the single token-count pass, exactly as a production
    * arena's nightly rating job. */
  def winrateBt(s: SparkSession, d: String): DataFrame = {
    val slice = Tables.documents(s, d)
      .select(col("source"), col("lang"),
        explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), sum(length(col("tok"))).as("sl"))
    val decided = slice.as("a")
      .join(slice.as("b"),
        col("a.lang") === col("b.lang")
          && col("a.source") < col("b.source"))
      .select(
        (col("a.sl") * col("b.n")).as("qa"),
        (col("b.sl") * col("a.n")).as("qb"),
        col("a.source").as("sa"), col("b.source").as("sb"))
      .where(col("qa") =!= col("qb"))
      .select(when(col("qa") > col("qb"), col("sa")).otherwise(col("sb"))
          .as("w"),
        when(col("qa") > col("qb"), col("sb")).otherwise(col("sa"))
          .as("l"))
    val longForm = decided.select(col("w").as("i"), col("l").as("j"),
        lit(1L).as("win"))
      .unionByName(decided.select(col("l").as("i"), col("w").as("j"),
        lit(0L).as("win")))
    // lineage cut: round r references round r−1's ratings TWICE (pi and
    // pj), so an uncut plan re-derives the corpus token aggregate 2³
    // times by round 3 (measured ~2.0 s warm). The match table is
    // |langs|·C(|sources|,2)·2 rows — checkpoint it once and the rounds
    // run over tiny in-memory tables (~0.6 s total).
    val lf = MemoUtil.scratch(longForm.localCheckpoint())
    val (wins, ratings) = btIterations(lf, 3)
    val rw = Window.orderBy(col("rating_fp").desc, col("source"))
    wins.join(ratings, "i")
      .select(col("i").as("source"), col("n_matches"), col("w").as("wins"),
        (col("n_matches") - col("w")).as("losses"),
        col("p").as("rating_fp"))
      .withColumn("rank", row_number().over(rw))
  }

  /** The integer-lattice BT core over long-form match rows
    * (i, j, win) — exposed for the planted-tournament spec. Returns
    * (wins table, final ratings). */
  private[graft] def btIterations(longForm: DataFrame, rounds: Int)
      : (DataFrame, DataFrame) = {
    val pairTbl = longForm.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n_ij"))
    val wins = longForm.groupBy(col("i"))
      .agg(count(lit(1)).as("n_matches"), sum(col("win")).as("w"))
    var ratings = wins.select(col("i"), lit(1000000L).as("p"))
    (1 to rounds).foreach { _ =>
      val sums = pairTbl
        .join(ratings.select(col("i"), col("p").as("pi")), "i")
        .join(ratings.select(col("i").as("j"), col("p").as("pj")), "j")
        .groupBy(col("i"))
        .agg(sum(expr("(n_ij * 1000000000000000) div (pi + pj)")).as("s"))
      ratings = wins.join(sums, "i")
        .select(col("i"),
          greatest(lit(1L), expr("(w * 1000000000000000) div s")).as("p"))
    }
    (wins, ratings)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_judge_agreement" -> judgeAgreement _,
    "llm_winrate_bt" -> winrateBt _
  )

  /** Shared oracle preamble: per-doc exact features over non-empty
    * tokens (the docFeatures twin). */
  private val featCte =
    """WITH tk AS (
      |  SELECT doc_id, n_chars,
      |    unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
      |  FROM documents),
      |feat AS (
      |  SELECT doc_id, count(*) AS n,
      |    CAST(sum(length(tok)) AS BIGINT) AS sl,
      |    count(DISTINCT tok) AS nd, max(n_chars) AS nc
      |  FROM tk GROUP BY doc_id)""".stripMargin

  /** One unrolled integer-lattice BT round (MATERIALIZED — each round
    * references its predecessor twice, the kcorePeel lesson). */
  private def btRound(r: Int): String = {
    val prev = if (r == 1) "r0" else s"r${r - 1}"
    s"""s$r AS MATERIALIZED (
       |  SELECT p.i,
       |    CAST(sum((p.n_ij * 1000000000000000) // (ri.p + rj.p))
       |      AS BIGINT) AS s
       |  FROM p
       |  JOIN $prev ri ON p.i = ri.i
       |  JOIN $prev rj ON p.j = rj.i
       |  GROUP BY p.i),
       |r$r AS MATERIALIZED (
       |  SELECT w.i,
       |    greatest(1, (w.w * 1000000000000000) // s$r.s) AS p
       |  FROM wins w JOIN s$r ON w.i = s$r.i)""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "llm_judge_agreement" -> (featCte +
      """,
        |rated AS (
        |  SELECT doc_id, j.judge,
        |    CASE j.judge
        |      WHEN 1 THEN CASE WHEN sl * 10000 // n < 44000 THEN 0
        |                       WHEN sl * 10000 // n < 46000 THEN 1
        |                       ELSE 2 END
        |      WHEN 2 THEN CASE WHEN nc * 10000 // n < 54000 THEN 0
        |                       WHEN nc * 10000 // n < 56000 THEN 1
        |                       ELSE 2 END
        |      ELSE CASE WHEN nd * 10000 // n < 4000 THEN 0
        |                WHEN nd * 10000 // n < 5500 THEN 1
        |                ELSE 2 END END AS label
        |  FROM feat CROSS JOIN (SELECT unnest([1, 2, 3]) AS judge) j),
        |pairs AS (
        |  SELECT x.judge AS j1, y.judge AS j2, count(*) AS n,
        |    CAST(sum(CASE WHEN x.label = y.label THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_agree
        |  FROM rated x JOIN rated y
        |    ON x.doc_id = y.doc_id AND x.judge < y.judge
        |  GROUP BY 1, 2),
        |marg AS (
        |  SELECT judge, label, count(*) AS cnt FROM rated GROUP BY 1, 2),
        |pe AS (
        |  SELECT m1.judge AS j1, m2.judge AS j2,
        |    CAST(sum(m1.cnt * m2.cnt) AS BIGINT) AS pe_num
        |  FROM marg m1 JOIN marg m2
        |    ON m1.label = m2.label AND m1.judge < m2.judge
        |  GROUP BY 1, 2)
        |SELECT p.j1, p.j2, p.n, p.n_agree,
        |  p.n_agree * 10000 // p.n AS po_bp,
        |  e.pe_num,
        |  e.pe_num * 10000 // (p.n * p.n) AS pe_bp,
        |  round((p.n_agree * p.n - e.pe_num)
        |    / (p.n * p.n - e.pe_num), 6) AS kappa
        |FROM pairs p JOIN pe e ON p.j1 = e.j1 AND p.j2 = e.j2""".stripMargin),
    "llm_winrate_bt" ->
      ("""WITH tk AS (
        |  SELECT source, lang,
        |    unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
        |  FROM documents),
        |sl AS (
        |  SELECT lang, source, count(*) AS n,
        |    CAST(sum(length(tok)) AS BIGINT) AS sl
        |  FROM tk GROUP BY 1, 2),
        |d AS (
        |  SELECT CASE WHEN a.sl * b.n > b.sl * a.n
        |           THEN a.source ELSE b.source END AS w,
        |         CASE WHEN a.sl * b.n > b.sl * a.n
        |           THEN b.source ELSE a.source END AS l
        |  FROM sl a JOIN sl b
        |    ON a.lang = b.lang AND a.source < b.source
        |  WHERE a.sl * b.n != b.sl * a.n),
        |lf AS (
        |  SELECT w AS i, l AS j, 1 AS win FROM d
        |  UNION ALL SELECT l, w, 0 FROM d),
        |p AS MATERIALIZED (
        |  SELECT i, j, count(*) AS n_ij FROM lf GROUP BY 1, 2),
        |wins AS MATERIALIZED (
        |  SELECT i, count(*) AS n_matches,
        |    CAST(sum(win) AS BIGINT) AS w
        |  FROM lf GROUP BY 1),
        |r0 AS MATERIALIZED (
        |  SELECT i, CAST(1000000 AS BIGINT) AS p FROM wins),
        |""".stripMargin +
        (1 to 3).map(btRound).mkString(",\n") + "\n" +
        """SELECT w.i AS source, w.n_matches, w.w AS wins,
          |  w.n_matches - w.w AS losses,
          |  CAST(r3.p AS BIGINT) AS rating_fp,
          |  row_number() OVER (ORDER BY r3.p DESC, w.i) AS rank
          |FROM wins w JOIN r3 ON w.i = r3.i""".stripMargin)
  )
}
