package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Partitioning-independence: a query's RESULT may never depend on how the
  * data happens to be partitioned. Order-dependent windows, first/last
  * without full ordering, and non-commutative merges all pass single-config
  * runs and corrupt results only under a different parallelism — so each
  * representative query is executed under two shuffle-partition settings
  * and the collected outputs must match exactly. (The driver's DuckDB gate
  * catches cross-engine drift; this catches cross-CONFIG drift.) */
class DeterminismSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  private val sf = "/root/testdata/sf0.001"

  // one per operator family: window topk, bounded-agg topk, as-of join,
  // connected components, sequence packing, salted agg, jq generator;
  // r4 families: binned range join, cross-corpus gates, bigram LM,
  // source filter, PQ ANN (seeded training must not see partitioning)
  private val queries = Seq("rel_window_topn", "rel_topk_agg", "rel_asof_join",
    "dedup_groups", "text_packing", "rel_salted_distinct", "jq_multi_col",
    "rel_range_join", "dedup_crosscorpus", "dedup_crosscorpus_near",
    "text_lm_score", "pipeline_source_filter", "ann_pq_topk",
    // r6 families: bloom routing, sketch compaction/merge order, BPE
    // training ties, recipe cuts, bottom-k sampling, PCA model fit
    "dedup_bloom_gate", "text_len_quantile_sketch", "text_bpe_roundtrip",
    "pipeline_source_mix", "pipeline_sample_per_group", "text_heavy_hitters",
    // r7 families: BM25 bounded top-k + tie order, string-payload top-k
    // (keywords + collocations), phrase join, centroid floor-div means,
    // gap-fill spine + rolling frame, anchored-bin overlap dedup,
    // weighted-sample cut, md5 snapshot diff
    "search_bm25", "search_keywords", "search_phrase", "text_collocations",
    "emb_label_outliers", "events_rolling_7d", "rel_interval_overlap",
    "pipeline_weighted_sample", "pipeline_snapshot_diff",
    // r7 late wave: anomaly window frames, strided chunk explode,
    // audio-header probe map, governance groupBy, snippet map, the
    // composed curation chain
    "events_anomalies", "text_chunks_overlap", "multimodal_audio_probe",
    "pipeline_k_anonymity", "search_snippets", "pipeline_e2e_curation",
    // r7 continued: iterative integer PageRank (per-round join + agg must
    // not see partitioning), salted-replica join routing, RRF fusion ties,
    // percentile-boundary bucketing
    "graph_pagerank", "rel_skew_join", "search_rrf", "rel_quantile_buckets",
    "dedup_fuzzy_names", "multimodal_phash_pairs", "graph_triangles",
    "graph_pagerank_weighted",
    // r7 session 3: span-removal rebuild (anti-join + per-doc sort rebuild
    // must not see partitioning), DSIR model build + broadcast scoring,
    // label-propagation vote argmax
    "text_span_dedup", "pipeline_dsir_weights", "graph_communities",
    "graph_ppr", "pipeline_score_calibration", "text_oov_rate",
    "emb_knn_accuracy",
    // r7 session 4: state-merge re-aggregate, LOCF window fill,
    // anti-joined bounded top-k, bipartite self-join projection
    "pipeline_incremental_rollup", "events_forward_fill",
    "emb_hard_negatives", "graph_copurchase",
    "pipeline_integrity_audit", "rel_join_explode_audit",
    // r7 session 5: word-gram prefix-filter candidates (bucket join +
    // distinct must not see partitioning), reciprocal-argmax mining,
    // CC-keyed fold assignment, Bellman-Ford frontier rounds
    "dedup_simjoin_exact", "emb_mutual_pairs", "pipeline_group_split",
    "graph_shortest_paths",
    // r7 session 6: containment posting join, scd2-interval as-of lookup
    "dedup_containment", "events_scd2_lookup",
    // r7 session 7: argmax-struct mode ties, two-pass holistic MAD,
    // min/max-boundary histogram binning
    "rel_mode", "rel_mad", "rel_histogram",
    // decimal moment sums + final-double slope; CUSUM window argmax
    "events_trend", "events_changepoint",
    // degree-join coefficient over the wedge-join triangle core
    "graph_clustering",
    // driver-literal bucket stats feeding the interleave map
    "rel_zorder_key",
    // two-side conditional sums + floor-div centroid gap
    "emb_drift",
    // per-unit dedup agg + variant pivot; prefix join + weight lookup
    "events_ab_test", "search_rbo",
    // LP labels feeding cross-multiplied decimal contributions
    "graph_modularity",
    // distinct-x running-max recurrence + survivor semi join
    "rel_skyline",
    // one-pass multi-rule conditional sums; dup-key rollup
    "pipeline_expectations", "pipeline_unique_audit",
    // contribution-explode distinct count + broadcast bounds trim
    "events_rolling_actives", "events_rolling_median",
    // dual conditional argmax over the broadcast-scored pairs
    "emb_triplets",
    // min-bucket first-appearance rollup + spine running sum
    "text_vocab_growth",
    // write→read JSONL/CSV round-trips must not depend on partitioning
    "src_jsonl_roundtrip", "src_csv_roundtrip",
    // frontier-chase closure rounds + ancestor rollup
    "rel_hierarchy_rollup",
    // collect_list pack + sequential floor recurrence (array_sort is the
    // only thing standing between partitioning and the EWMA order)
    "ts_ewma",
    // running-max island opens + island rollup; asof-attributed rollup
    "ts_islands", "events_attribution",
    // alternating-side normalized fixed point; wedge-join candidate top-k
    "graph_hits", "graph_links",
    // dim-sorted centroid collect + bounded per-label top-k
    "emb_class_prototypes",
    // distinct-value running-sum window + one-row argmax
    "rel_ks_test",
    // full-grid cross join + decimal cell terms; symmetrized moment agg;
    // vocab equi self-join
    "rel_chi_square", "graph_assortativity", "text_source_overlap",
    // guarded basket self-join + lift top-k; (key,dow) window means
    "rel_basket_rules", "ts_dow_adjusted",
    // lag-explode equi join + decimal ACF moments
    "ts_autocorrelation",
    // synchronous edge-peel rounds to fixpoint
    "graph_ktruss",
    // r8: real-decode pipelines (encode→decode must be partition-blind),
    // list-join scored candidates + dual argmax, benchmark-broadcast
    // nearest argmax, PCM chunk-walk scans, contracted-graph group fold
    "multimodal_meta", "multimodal_frame_phash", "multimodal_pcm_silence",
    "emb_mutual_pairs_blocked", "emb_decontam", "multimodal_image_stats",
    // r8 continued: TreeSet bottom-k sketch merges + sketch-pair overlap
    // arithmetic; per-round Lloyd argmin + centroid floor-div collect
    "sketch_kmv_distinct", "sketch_kmv_overlap", "emb_kmeans",
    // two-level collapse + dual single-partition cumulative windows;
    // per-(doc,word) counts folding through the integer log grade
    "pipeline_skew_audit", "text_word_entropy",
    // real decode → integer convolution; md5-keyed permutation + per-shard
    // window rank
    "multimodal_sharpness", "pipeline_shuffle_shards",
    // register-table cut + dense-grid range window + estimator fold
    "sketch_hll_rolling",
    // TakeOrdered + broadcast tag re-aggregate; staged min + bounded
    // user-keyed exclusion join
    "rel_topn_other", "events_funnel_exclusion",
    // per-pair two-level distinct rollup union
    "pipeline_fd_audit",
    // time-qualified frontier relaxation rounds
    "graph_temporal_reach",
    // regex-count maps; per-dim decimal moment rollup
    "text_mojibake", "emb_dim_audit",
    // semi-filtered delta joins + union
    "pipeline_join_delta",
    // ewma recurrence + lag window + error rollup
    "ts_backtest",
    // three chained exact-percentile discretizers over the user frame
    "events_rfm",
    // per-field argmax-struct survivorship + field-frame joins
    "dedup_golden_records",
    // class-explode scoring + argmax over integer log-probs
    "text_nb_classify",
    // duration-collapse + dual cumulative windows + lg64 log-survival
    "events_survival",
    // exact-integer pair probability; cluster-label argmax rollup
    "text_simpson", "emb_kmeans_purity",
    // pooled-grid at-risk windows + O/E rollup
    "events_survival_ab",
    // session gaps-and-islands + holistic percentile rollup
    "events_session_stats",
    // dual exact rolling-distinct passes joined on the spine
    "events_stickiness",
    // reversed-key semi self-join counts
    "graph_reciprocity",
    // canonical-edge collapse + bitlen bucket rollup
    "graph_degree_dist",
    // r9: tolerant-decode reject accounting, JPEG meta through the lossy
    // codec, two-level prefix-sum piece layout, spine MA + phase means,
    // margin rollups + grade arithmetic, hash-keyed gram anti counts,
    // higher-order checksum map, global moment folds, ORC round-trip
    "multimodal_decode_tolerant", "multimodal_jpeg_meta",
    "pipeline_pack_chop", "ts_seasonal", "text_pmi", "text_novelty",
    "pipeline_luhn_audit", "rel_welch_t", "events_ab_conversion",
    "src_orc_roundtrip",
    // r9 composed: decompose→MAD verdict, content-key session epochs
    "ts_seasonal_anomaly", "dedup_time_scoped",
    // r10: prefix-sum CUSUM windows + alarm rollup, pairwise-slope median
    // rank pick, dual-lead path census, lookback position shares + anti
    // NULL bucket, bounded top-k Zipf moments, token-join KL fold,
    // single-term BM25 runs + metric chain, hook+jump components, per-dim
    // scale broadcast + error rollup, greedy literal-center rounds
    "ts_cusum", "ts_theil_sen", "events_top_paths",
    "events_attribution_position", "text_zipf", "text_source_kl",
    "search_ndcg", "graph_components", "emb_quantize", "emb_coreset",
    // r10 wave 2: pure-map line battery, contingency-cell kappa fold,
    // prefix-filtered pairs against the broadcast threshold grid
    "text_c4_clean", "text_langid_kappa", "dedup_threshold_curve",
    // r10 wave 3: md5-weighted resample folds + order-statistic window,
    // pair rollup through two source joins
    "rel_bootstrap_ci", "dedup_source_matrix",
    // r10 wave 4: confusion-marginal P/R/F1 rollup, CC size census
    "text_nb_eval", "dedup_group_sizes",
    // r10 wave 5: tagged-benchmark broadcast gram join; detector core
    // over the dow-residual spine
    "text_decontam_batch", "ts_cusum_deseasonal",
    // r10 wave 6: water-filling over the collapsed per-source frame;
    // percentile-boundary deciles + collapsed cumulative-gain window
    "pipeline_mix_plan", "events_decile_lift",
    // r11 session 1: pairwise-sign spine join + tie fold, lag-gap
    // holistic median, percentile-boundary temporal cut
    "ts_mann_kendall", "events_bot_screen", "pipeline_temporal_split",
    // r11 session 2: distinct-value rank windows + DECIMAL folds
    // (mann-whitney/kruskal), dual value-keyed rank joins (spearman),
    // md5-rank TakeOrdered sample + broadcast pair join (kendall — the
    // orderBy/limit sample is the classic partition-order risk),
    // band-vs-truth count joins, Lorenz row_number over the source
    // frame, three-rater union into the Fleiss cell fold, positional
    // gram islands, Lg64 histogram folds, effect-size tail, URL
    // when-chain map, header-decode verdict map
    "rel_mann_whitney", "rel_kruskal", "rel_spearman", "rel_kendall_tau",
    "dedup_minhash_pr", "pipeline_gini", "text_rater_agreement",
    "text_decontam_runs", "pipeline_psi", "pipeline_js_drift",
    "rel_cramers_v", "pipeline_url_gate", "multimodal_resolution_screen",
    // (node, landmark)-keyed relaxation rounds + the md5 landmark cut
    "graph_harmonic",
    // per-declared-lang row-total window + share floor
    "text_langid_confusion",
    // r13: even-period 2×MA trend (windowed sum + lag/lead combine);
    // two-pass Brandes (level anti-joins + per-term floor-DIV folds);
    // JPEG decode-vs-gradient tolerance verdict (real codec both runs)
    "ts_seasonal_even", "graph_betweenness", "multimodal_jpeg_stats",
    "graph_closeness", "events_markov_attribution", "emb_silhouette",
    "graph_louvain", "events_burstiness", "rel_ols2", "ts_croston",
    "events_cuped", "text_textrank", "events_did", "rel_theil",
    "pipeline_moment_maintenance", "rel_anova", "graph_mst",
    // r14: FW-BW peel fixpoints (color min-join + reach growth must not
    // see partitioning); contraction + weighted-move argmax + unfold;
    // quotient max-relaxation levels; md5-indexed walk steps; EM-prune
    // Viterbi training collects; register-table pair merges; rank-window
    // step-up screen; order-statistic conformal pick; per-source yield
    // rollup through the dedup window; islands over per-line langid
    "graph_scc", "graph_louvain_full", "graph_condensation", "graph_walks",
    "text_unigram_tokens", "sketch_hll_setops", "rel_fdr_bh",
    "ts_conformal", "pipeline_token_yield", "text_lang_spans",
    "events_mde", "text_compress_ratio",
    // r15: per-track box-walk map + explode (pure map, but the
    // synthesizer rides a Dataset.map); exact-moment grid explode with
    // double readouts pinned after the DECIMAL aggregation
    "multimodal_video_tracks", "events_power_curve",
    "text_token_fertility", "graph_eccentricity",
    // r15 wave 2: byte-walk explodes + the composed strip/langid chain
    // (Dataset.map synthesizers must not see partitioning)
    "src_warc_records", "pipeline_crawl_chain", "events_sprt",
    // r16 session 2: the content-type router's union, the per-domain
    // schedule window + delay join, the frontier's broadcast gate, and
    // the objstm page-tree expansion must not see partitioning
    "pipeline_crawl_chain_pdf", "pipeline_fetch_schedule",
    "pipeline_sitemap_frontier", "src_pdf_objstm")

  private def runAt(name: String, parts: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  queries.foreach { name =>
    test(s"$name returns identical rows at 3 and 32 shuffle partitions") {
      val narrow = runAt(name, 3)
      val wide = runAt(name, 32)
      assert(narrow.nonEmpty)
      assert(narrow == wide,
        s"$name drifts with partitioning: ${narrow.diff(wide).take(3)} vs ${wide.diff(narrow).take(3)}")
    }
  }
}
