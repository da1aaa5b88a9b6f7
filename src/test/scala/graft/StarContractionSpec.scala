package graft

import org.apache.spark.sql.functions._

import graft.operators.StarContraction

/** The claim that moved graph_components off min-label propagation:
  * large-star/small-star converges in O(log n) rounds on ANY topology,
  * including the propagation worst case — a long path, where label
  * propagation needs exactly L rounds to carry the minimum end to end. */
class StarContractionSpec extends SparkSpec {
  import spark.implicits._

  private def pathEdges(n: Long) =
    spark.range(n - 1).select($"id".as("u"), ($"id" + 1).as("v"))
      .localCheckpoint()

  test("planted 256-path: logarithmic rounds, single min-rooted component") {
    val n = 256L
    // localThreshold = 0 forces the distributed contraction loop — the
    // round-count claim is about THAT path, not the small-regime gate
    val res = StarContraction.contract(pathEdges(n), localThreshold = 0L)
    // label propagation would take 255 rounds here; contraction must be
    // within a small constant of log2(n) (+1 for convergence detection:
    // the final round re-derives an unchanged edge set)
    val bound = (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 3
    assert(res.rounds <= bound,
      s"took ${res.rounds} rounds on a $n-path; logarithmic bound is $bound")
    val labels = StarContraction.labels(res.stars)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == (0L until n).toSet, "every node labeled")
    assert(labels.values.forall(_ == 0L), "one component rooted at the min")
    res.live.foreach(operators.MemoUtil.dropCheckpoint)
  }

  test("two components + ring: labels are per-component minima") {
    // component A: ring 0..9, component B: star centered at 100
    val ring = spark.range(10)
      .select($"id".as("u"), (($"id" + 1) % 10).as("v"))
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
    val star = spark.range(101, 106).select(lit(100L).as("u"), $"id".as("v"))
    val res = StarContraction.contract(ring.union(star).localCheckpoint())
    // 14 edges ≤ the gate — this took the union-find path, zero rounds
    assert(res.rounds == 0, "small regime must take the local path")
    val labels = StarContraction.labels(res.stars)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach(id => assert(labels(id) == 0L))
    (100L to 105L).foreach(id => assert(labels(id) == 100L))
    res.live.foreach(operators.MemoUtil.dropCheckpoint)
  }

  test("degenerate inputs: empty edge set and a single edge") {
    // an empty dup-pair table is the COMMON case for a clean corpus —
    // the engine must return an empty star set, not throw
    val empty = spark.range(0).select($"id".as("u"), $"id".as("v"))
      .localCheckpoint()
    val er = StarContraction.contract(empty)
    assert(StarContraction.labels(er.stars).count() == 0L)
    val one = Seq((5L, 9L)).toDF("u", "v").localCheckpoint()
    val labels = StarContraction.labels(StarContraction.contract(one).stars)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(5L -> 5L, 9L -> 5L))
  }

  test("local union-find ≡ distributed contraction on a mixed topology") {
    // paths + a clique + cross-links: exercises rank/compression cases
    val mixed = pathEdges(40)
      .union(spark.range(50, 60).crossJoin(spark.range(50, 60).toDF("b"))
        .where($"id" < $"b").select($"id".as("u"), $"b".as("v")))
      .union(Seq((7L, 55L)).toDF("u", "v")) // bridge path↔clique
      .union(spark.range(200, 230, 3)
        .select($"id".as("u"), ($"id" + 2).as("v")))
      .localCheckpoint()
    val loc = StarContraction.labels(
      StarContraction.contract(mixed).stars).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val dist = StarContraction.contract(mixed, localThreshold = 0L)
    val dst = StarContraction.labels(dist.stars).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(loc == dst, "gate must not change the labeling")
    dist.live.foreach(operators.MemoUtil.dropCheckpoint)
  }
}
