package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Alternating large-star/small-star connected-components contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond"),
  * the repo's ONE component-labeling engine — shared by
  * llm_dedup_cluster (near-dup pair closure) and graph_components /
  * graph_jaccard's dense-regime blocker (co-supply graph).
  *
  * Each round rewires edges toward the per-neighborhood minimum:
  *   large-star: for every center u, link each strictly-larger neighbor
  *     to m = min(Γ(u) ∪ u);
  *   small-star: on the resulting (big → small) edges, link the center
  *     and every smaller neighbor to the center's minimum.
  * The edge set converges to min-rooted stars in O(log n) rounds on ANY
  * topology, where min-label propagation needs O(diameter) — the
  * difference between ~7 and 256 join barriers on a planted 256-path
  * (StarContractionSpec measures exactly that). Convergence is detected
  * on the materialized edge set via (count, xor-of-hashes) — no extra
  * join, O(1) driver reads per round, and xor cannot overflow where a
  * sum() of hashes would trip ANSI arithmetic. */
private[graft] object StarContraction {

  /** `stars`: the min-rooted (member u, root v) fixpoint edge set
    * (u > v), localCheckpoint'd. `live`: the checkpointed rounds still
    * reachable from `stars`' plan or not yet freed (final + possibly the
    * penultimate) — the CALLER must release them: MemoUtil.scratch when
    * the returned plan is consumed lazily (harness frees at its safe
    * points), or dropCheckpoint right after an eager re-materialization.
    * `rounds`: contraction rounds to the fixpoint (the spec's witness
    * that convergence is logarithmic, not diameter-bound). */
  final case class Result(stars: DataFrame, live: Seq[DataFrame], rounds: Int)

  /** `edges0`: canonical undirected pairs, columns (u, v) with u < v,
    * same numeric type, ALREADY materialized by the caller (each round
    * reads its input twice — once per star phase — so an unmaterialized
    * input would recompute its lineage). Superseded rounds are
    * unpersisted in-loop the moment the next round's checkpoint is
    * eagerly live, so at most two rounds of blocks exist at any time;
    * cluster jobs would use reliable checkpoints here so a lost executor
    * doesn't recompute round 1.
    *
    * MEASURED REGIME GATE (the jaccard-blocker discipline): the round-0
    * convergence signature already counts the edge set, so when it fits
    * the broadcast budget (`localThreshold`, default 2²⁰ edges ≈ 16 MB —
    * the same order as a broadcast-join side) the min-rooted fixpoint is
    * computed by ONE collect + union-find instead of ~log n contraction
    * rounds: each distributed round costs 4 shuffle barriers + a
    * checkpoint job, ~0.6 s of fixed overhead here for data a driver
    * loop folds in microseconds. Identical output contract (min-rooted
    * stars); StarContractionSpec pins local≡distributed equivalence. A
    * 100 TB dup graph blows past the gate and takes the contraction
    * path — which is why the gate reads the measured count, not a
    * config. */
  def contract(edges0: DataFrame, maxRounds: Int = 30,
      localThreshold: Long = 1L << 20): Result = {
    var edges = edges0
    var priorRound: DataFrame = null // superseded round, dropped in-loop
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = signature(edges)
    if (sig._1 <= localThreshold) return contractLocal(edges0)
    var converged = false
    var iter = 0
    while (!converged && iter < maxRounds) {
      // large-star over the undirected neighborhood
      val dir = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val minsL = dir.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val afterLs = dir.join(minsL, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // (big, small): m ≤ u < v
        .distinct()
      // small-star on the big→small orientation
      val minsS = afterLs.groupBy(col("u")).agg(min(col("v")).as("mv"))
      val next = afterLs.join(minsS, "u")
        .where(col("v") =!= col("mv"))
        .select(col("v").as("u"), col("mv").as("v"))
        .union(minsS.select(col("u"), col("mv").as("v")))
        .distinct()
        .localCheckpoint()
      val nsig = signature(next)
      converged = nsig == sig
      sig = nsig
      // `next` is materialized (checkpoint is eager), so the penultimate
      // round's blocks free immediately instead of stranding ≤30
      // checkpoints until GC — except the caller's own input, which the
      // caller owns and may still reference
      if ((priorRound != null) && !(priorRound eq edges0))
        MemoUtil.dropCheckpoint(priorRound)
      priorRound = edges
      edges = next
      iter += 1
    }
    // the iteration cap is a runaway guard, not a tolerance: exiting it
    // while edges were still changing would silently emit wrong labels.
    require(converged,
      s"star contraction did not converge in $iter rounds")
    val live = Seq(priorRound, edges)
      .filter(df => (df != null) && !(df eq edges0)).distinct
    Result(edges, live, iter)
  }

  /** Small-regime path: one collect of the (gated, ≤ localThreshold)
    * edge set, min-rooted union-find with path compression (union
    * attaches the larger root under the smaller, so every root is its
    * component's minimum — the exact fixpoint the contraction reaches),
    * re-emitted as a local-relation star table with the same (u, v)
    * schema. rounds = 0 records that no contraction barrier ran. */
  private def contractLocal(edges0: DataFrame): Result = {
    val spark = edges0.sparkSession
    import spark.implicits._
    val pairs = edges0.select(col("u").cast("long"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != c) {
        val nxt = parent.get(c); parent.put(c, r); c = nxt
      }
      r
    }
    pairs.foreach { case (u, v) =>
      val ru = find(u); val rv = find(v)
      if (ru != rv) {
        if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    val nodes = pairs.iterator.flatMap(p => Iterator(p._1, p._2))
      .toArray.distinct
    val stars = nodes.iterator.map(x => (x, find(x)))
      .filter(p => p._1 != p._2).toSeq.toDF("u", "v")
    Result(stars, Seq.empty, 0)
  }

  /** Per-node labeling from the star fixpoint: (id, cc) with cc = the
    * component's minimum member, covering every node incident to an
    * input edge (members from star rows, roots from their self-row).
    * Isolated nodes never enter the edge set; callers that need them
    * labeled union them in with cc = id. */
  def labels(stars: DataFrame): DataFrame =
    stars.select(col("u").as("id"), col("v").as("cc"))
      .union(stars.select(col("v").as("id"), col("v").as("cc")).distinct())
      .distinct()
}
