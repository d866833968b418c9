package graft

/** The engine's core determinism claim, tested directly: every query's
  * output must be BIT-IDENTICAL under different partitionings — shuffle
  * partition count is the thing that changes between a laptop and a
  * 1000-executor cluster, and any float summed in shuffle order would
  * diverge there first. The DECIMAL quantize-then-sum idiom, integer
  * graph arithmetic, exact power-of-two EWMA weights, md5 draws etc.
  * all exist to make this test pass; here it is actually exercised
  * instead of argued.
  *
  * The sample deliberately spans the risk classes: decimal-sum floats
  * (surprise/z-norm/shrinkage), iterative integer algebra (PageRank),
  * join+agg revenue (salted join, q1/q5), sketch estimates (PSI, AUC),
  * order-statistics selections (weighted sample), and the sequential
  * folds (EWMA, CUSUM). Artifact-backed queries are excluded — their
  * memoized caches would trivially return identical bytes.
  */
class DeterminismSpec extends SparkSuite {

  private val names = Seq(
    "q1_pricing_summary", "q5_local_supplier_volume", "join_skew_salted",
    "graph_domain_rank", "graph_triangles", "graph_kcore",
    "text_unigram_surprise", "text_quality_znorm", "quality_source_shrunk",
    "doc_weighted_sample", "audit_psi_value_drift", "quality_auc",
    "ev_ewma_hourly", "ev_cusum_hourly", "ev_holt_trend", "ev_user_stats",
    "agg_stats",
    // round-9 third-sitting risk classes: iterative distributed argmax
    // (BPE merge rounds), driver-side greedy on rounded cosines (MMR),
    // codec round-trip + IEEE energy sums (audio), min-bucket distinct
    // counting (Heaps)
    "text_bpe_train", "sim_mmr_select", "mm_audio_features", "text_heaps_law",
    // round-9 fourth-sitting risk classes: fixed-point GD (LR trainer),
    // lattice Lloyd iterations (k-means), IEEE-exact cosine max/sum
    // (late interaction), LM lattice sums (perplexity), integer EMD
    // cumulative walk (t-closeness), seed-restricted teleport (PPR)
    "quality_lr_train", "sim_kmeans_assign", "sim_maxsim_topk",
    "text_bigram_ppl", "audit_t_closeness", "graph_ppr_seeded",
    "ev_seasonal_decompose", "quality_agreement_kappa")

  test("query outputs are bit-identical under 3 vs 7 shuffle partitions") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        // clear bounded memos (BPE merges, quantizer seeds) so both runs
        // genuinely recompute — a memo hit would trivially match
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        graft.operators.SessionCaches.clear(spark)
        val a = fn(spark, Sf).collect().map(_.toString).toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        graft.operators.SessionCaches.clear(spark)
        val b = fn(spark, Sf).collect().map(_.toString).toSeq
        assert(a.nonEmpty, s"$n returned no rows")
        assert(a == b, s"$n diverged under repartitioning")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
