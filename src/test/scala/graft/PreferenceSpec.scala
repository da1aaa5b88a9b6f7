package graft

import org.apache.spark.sql.functions._

import graft.operators.Preference

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("judge_agreement: 3 pairs, agreement bounded, kappa consistent with its integers") {
    val rows = Preference.judgeAgreement(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getAs[Int]("j1"), r.getAs[Int]("j2"))).toSet
      == Set((1, 2), (1, 3), (2, 3)))
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val a = r.getAs[Long]("n_agree")
      val p = r.getAs[Long]("pe_num")
      assert(n > 0 && a <= n)
      assert(p <= n * n, "chance mass exceeds n²")
      // kappa recomputes from the exact integers it ships with
      val want = BigDecimal((a.toDouble * n - p) / (n.toDouble * n - p))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("kappa") - want) < 1e-12)
      assert(r.getAs[Double]("kappa") <= 1.0 + 1e-9)
    }
    // every judge rates every doc exactly once: all three pairs share n
    assert(rows.map(_.getAs[Long]("n")).distinct.length == 1)
  }

  test("winrate_bt: ratings rank winners above losers, accounting exact") {
    val rows = Preference.winrateBt(spark, sf).collect()
    assert(rows.nonEmpty)
    // wins + losses = matches, everyone played someone
    rows.foreach { r =>
      assert(r.getAs[Long]("wins") + r.getAs[Long]("losses")
        == r.getAs[Long]("n_matches"))
      assert(r.getAs[Long]("n_matches") > 0)
      assert(r.getAs[Long]("rating_fp") >= 1L)
    }
    // ranks are a dense total order
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq
      == (1 to rows.length))
    // BT is monotone in this tournament's aggregate: the top-rated
    // source must not have fewer wins than the bottom-rated one
    val byRank = rows.sortBy(_.getAs[Int]("rank"))
    assert(byRank.head.getAs[Long]("wins") >= byRank.last.getAs[Long]("wins"))
    // an undefeated source (if any) outranks a winless one (if any)
    val unbeaten = byRank.filter(_.getAs[Long]("losses") == 0L)
    val winless = byRank.filter(_.getAs[Long]("wins") == 0L)
    if (unbeaten.nonEmpty && winless.nonEmpty)
      assert(unbeaten.map(_.getAs[Int]("rank")).max
        < winless.map(_.getAs[Int]("rank")).min)
  }

  test("bt lattice: a planted dominance chain orders ratings strictly") {
    // planted tournament: s0 beats everyone, s1 beats s2, s2 winless
    val d = Seq(("s0", "s1"), ("s0", "s2"), ("s1", "s2"))
    val longForm = (d.map { case (w, l) => (w, l, 1L) } ++
      d.map { case (w, l) => (l, w, 0L) }).toDF("i", "j", "win")
    val (_, ratings) = Preference.btIterations(longForm, 3)
    val p = ratings.collect()
      .map(r => r.getAs[String]("i") -> r.getAs[Long]("p")).toMap
    assert(p("s0") > p("s1"), "dominant source not rated above the middle")
    assert(p("s1") > p("s2"), "middle source not rated above the winless")
    assert(p("s2") == 1L, "winless source should sit at the clamp floor")
  }
}
