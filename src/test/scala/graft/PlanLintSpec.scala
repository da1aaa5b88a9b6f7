package graft

import org.apache.spark.sql.execution.joins.{
  BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Repo-wide physical-plan lint — the continuously-enforced version of
  * the per-round "no scale-killers" audit: every registered BATCH query
  * is planned at sf0.001 and checked for the two join shapes that melt
  * at 100 TB. "Planned" means the final DataFrame's job never runs,
  * but CONSTRUCTING some ops executes staged sub-jobs (llm_pca_power
  * collects its gram matrix, llm_bpe_apply/llm_hybrid_rrf run
  * localCheckpoint rounds, scan_malformed/scan_xml stage files) — the
  * lint tolerates that cost; only the returned plan is inspected. A CartesianProduct (non-broadcast
  * pair-explosion) is banned everywhere except the op that exists to
  * demonstrate it. BroadcastNestedLoopJoin is legitimate ONLY when the
  * broadcast side is bounded (a 1-row global aggregate, a LIMIT, a
  * ≤16-row literal, a 10-id probe set …) — every op that plans one is
  * pinned in the census below, so a NEW op that accidentally drifts
  * into a nested loop fails this spec until its author consciously
  * justifies the bound and adds it here.
  *
  * Streaming/pipeline modules are excluded: their registered functions
  * EXECUTE micro-batches during construction, and their stateful plans
  * are asserted in their own suites.
  */
class PlanLintSpec extends SparkSpec {

  private val streamingOps: Set[String] =
    (graft.operators.Streaming.queries.keySet
      ++ graft.operators.StreamIO.queries.keySet
      ++ graft.operators.PipelineOps.queries.keySet)

  // ops whose BNLJ broadcast side is bounded by construction; the
  // comment is the justification the lint demands
  private val bnljAllowed: Set[String] = Set(
    // join-matrix demonstrators: the non-equi shapes BNLJ exists for
    // (range/theta upgrade to bucketed equi-joins at scale, documented)
    "join_cross", "join_theta", "join_range",
    // 1-ROW global-aggregate broadcast (crossJoin(broadcast(df.agg(…)))
    // — corpus statistics, cutoffs, high-water marks, totals): the
    // build side is exactly one row at any data size
    "filter_subquery", "dim_scd2_incremental", "mv_incremental",
    "llm_cluster_topics", "agg_heavy_hitters",
    "dq_constraints", "dq_drift", "dq_freshness", "dq_skew",
    "graph_label_propagation", "llm_bm25", "llm_cooccur",
    "llm_curriculum", "llm_dataset_card", "llm_domain_mix",
    "llm_epoch_plan", "llm_keyword_extract", "llm_lineage_audit",
    "llm_ngram_lm", "llm_mix_temperature", "llm_perplexity_proxy",
    "llm_sample_importance",
    "llm_shard_layout", "llm_tfidf", "llm_cross_split_leakage",
    // BOUNDED probe/codebook sets (10 broadcast queries, K-row
    // centroid/supercell tables — constant in corpus size)
    "llm_similarity_topk", "llm_hard_negatives", "llm_ann_recall",
    "llm_ann_pq_recall", "llm_ann_ivf_kmeans", "llm_kmeans_twolevel",
    "llm_ann_recall_sweep",
    // residual-PQ recall (r12): same 10-query broadcast brute side as
    // llm_ann_pq_recall
    "llm_ann_pq_residual_recall",
    // matryoshka recall (r12): the truncated-dim brute pass carries the
    // same bounded 10-query broadcast side
    "llm_ann_matryoshka",
    // filtered ANN (r13): same bounded sides as llm_ann_recall — the
    // 10-query broadcast probes/truth plus a 2-row strategy × 10-row
    // truth-count cross (constant in corpus size)
    "llm_ann_filtered",
    // filtered graph ANN (r14): the walk itself is memo-checkpointed at
    // construction; the returned plan's only cross is the 2-row
    // strategy literal × the 10-row broadcast truth counts
    "llm_ann_graph_filtered",
    // incremental IVF (r14): the delta assignment broadcasts the K-row
    // persisted centroid table — the same K-row bound every IVF op
    // carries (K = N/128 driver-bounded, broadcast by contract)
    "llm_ann_ivf_incremental",
    // maintained-index recall rows (r15): the same bounded sides as
    // every recall row — an 11-query (5 base + 6 delta) broadcast probe
    // set × the K-row centroid table, and the brute-truth pass's
    // query broadcast; constant in corpus size
    "llm_ann_ivf_incremental_recall",
    // post-rebalance routing (r15): ≤6 anchor queries broadcast × the
    // (K+3)-row post-split cell table + the same bounded truth pass
    "llm_ann_ivf_rebalance_recall",
    // vector delete (r15): the 10-query broadcast probe/truth sides of
    // llm_ann_ivf_kmeans/llm_ann_recall, unchanged by the tombstone
    // anti-join (a key-slice filter, not a join shape)
    "llm_ann_ivf_delete",
    // graph-node retirement (r15): the survivor brute-truth pass
    // carries the same bounded 10-query broadcast side as llm_ann_graph
    // (the retired walk itself is checkpointed at construction)
    "llm_ann_graph_delete",
    // persisted index store (r15): both serving phases carry the
    // 10-query broadcast probe/truth sides over the disk store —
    // the K-row centroid crossJoin and the bounded query broadcast
    "llm_ann_index_persisted",
    // persisted graph store (r16): the serve's entry cross (≤16-node
    // sample × 10 broadcast queries) and the graph-live brute-truth
    // pass — the same bounded shapes as llm_ann_graph, read from disk
    "llm_ann_graph_persisted",
    // store time travel (r16): four llm_ann_index_persisted-shaped
    // serves, one per logged version — each carries the same bounded
    // 10-query broadcast probe/truth sides over the disk store
    "llm_ann_store_asof",
    // filtered store serve (r17): llm_ann_graph_persisted's bounded
    // shapes (entry cross + graph-live truth, both ≤ 10-query
    // broadcast sides) twice — once per sweep phase
    "llm_ann_graph_persisted_filtered",
    // streaming graph store (r17): the drained-store serve is
    // graphStoreServe verbatim — the same bounded entry cross and
    // brute-truth broadcast sides as llm_ann_graph_persisted
    "sink_stream_graph",
    // LSH recall eval (r12): both sides are the FIXED 160-row audit
    // sample (128 lowest-id docs + 32 planted renditions) — the pair
    // space is sample², constant in corpus size like the ANN probes
    "llm_dedup_near_recall",
    // SQ8 recall (r12): the 10-query broadcast brute side (like every
    // recall row) plus the 1-row broadcast of the 64-entry grid table
    "llm_ann_sq8",
    // OPQ recall (r12): the same bounded 10-query broadcast brute side
    "llm_ann_opq_recall",
    // MaxSim re-rank (r12): the same bounded 10-query broadcast side
    "llm_colbert_maxsim",
    // 1-row broadcasts: total-count join (benford), the 1-row boundary
    // array + 1-row stats (equi-depth histogram) — constant build sides
    "dq_benford", "agg_histogram_equidepth",
    // retrieval metrics (r13): the truth pass carries the same bounded
    // 10-query broadcast side as every recall row
    "llm_retrieval_metrics",
    // calibration (r14): the (min, width) bin statistic is a 1-row
    // broadcast over the margin table — constant at any corpus size
    "llm_quality_calibration",
    // row lineage (r13): the readout assembles FOUR 1-row aggregates
    // (v2 summary × v1 rowid mass × row-CDC verdict × key-CDC counts)
    // via crossJoin — every side is exactly one row at any data size
    "scan_row_lineage"
  )

  // ops whose KEYLESS window (empty partition spec → ONE task sorts the
  // whole input) is bounded by construction — the input domain is an
  // aggregate of constant/plan-bounded cardinality, never corpus-
  // proportional. Every other keyless window must either sit above a
  // limit (orderBy().limit(k) + rank over k rows — the bm25 discipline)
  // or be rewritten. This gate exists because the class survived two
  // rounds un-linted (VERDICT r10: llm_bm25/llm_dedup_winnow top-k).
  private val keylessWindowAllowed: Set[String] = Set(
    // ≤10⁴-row rare_bp histogram → cumulative offsets (llm_curriculum's
    // ntile replay — the window input is the bp DOMAIN, not the corpus)
    "llm_curriculum",
    // K-row supercell/centroid numbering (K = n/128 driver-bounded)
    "llm_kmeans_twolevel",
    // |sources|-row Bradley–Terry rating table (bounded label domain)
    "llm_winrate_bt",
    // PQ seed numbering: row_number over the vec_id < 16 slice (≤16
    // rows by the filter — the same window pqTop3 runs, visible here
    // because the recall op consumes the un-checkpointed builder twice)
    "llm_ann_opq_recall"
  )

  test("no keyless WindowExec over unbounded input (single-task sort gate)") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec,
      TakeOrderedAndProjectExec}
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val census = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!streamingOps(name)) {
        val plan = fn(spark, sf).queryExecution.sparkPlan
        val keyless = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
        }
        // a keyless window is structurally bounded when a limit sits
        // beneath it through CARDINALITY-PRESERVING nodes only
        // (project/filter/exchange/sort): a limit below a fan-out join
        // or explode does NOT bound the window's input (ADVICE r11 —
        // the old any-descendant collectFirst accepted exactly that)
        import org.apache.spark.sql.execution.{ProjectExec, FilterExec,
          SortExec, InputAdapter, WholeStageCodegenExec}
        import org.apache.spark.sql.execution.exchange.Exchange
        def boundedBelow(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
          p match {
            case _: TakeOrderedAndProjectExec => true
            case _: GlobalLimitExec => true
            case _: LocalLimitExec => true
            case _: ProjectExec | _: FilterExec | _: SortExec |
                 _: Exchange | _: InputAdapter | _: WholeStageCodegenExec =>
              p.children.exists(boundedBelow)
            case _ => false // join/explode/agg/scan: stop — no bound proven
          }
        val unbounded = keyless.filterNot(_.children.exists(boundedBelow))
        if (unbounded.nonEmpty) {
          census += name
          if (!keylessWindowAllowed(name)) offenders += name
        }
      }
    }
    assert(offenders.isEmpty,
      s"NEW keyless window over unbounded input (rewrite as orderBy().limit(k) " +
        s"or justify the bounded domain here): $offenders; full census: ${census.sorted}")
    // the allowlist must not rot: every pinned op still plans its
    // (audited, bounded) keyless window
    val stale = keylessWindowAllowed -- census.toSet -- streamingOps
    assert(stale.isEmpty, s"allowlisted ops no longer plan a keyless window: $stale")
  }

  test("no registered batch query plans a CartesianProduct; BNLJ census is pinned") {
    val cartesian = scala.collection.mutable.ArrayBuffer.empty[String]
    val bnlj = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!streamingOps(name)) {
        val df = fn(spark, sf)
        val plan = df.queryExecution.sparkPlan
        if (plan.collect { case c: CartesianProductExec => c }.nonEmpty)
          cartesian += name
        if (plan.collect { case b: BroadcastNestedLoopJoinExec => b }.nonEmpty)
          bnlj += name
      }
    }
    assert(cartesian.toSet.subsetOf(Set("join_cross")),
      s"unexpected CartesianProduct in: ${cartesian.filterNot(_ == "join_cross")}")
    val unexpected = bnlj.toSet -- bnljAllowed
    assert(unexpected.isEmpty,
      s"NEW BroadcastNestedLoopJoin (justify its bound or fix the plan): $unexpected; full census: ${bnlj.sorted}")
  }
}
