#!/usr/bin/env python3
"""Family assignment for the round-14 SparkEntry split.

Each gate lands in exactly one family file under
src/main/scala/graft/catalog/. Assignment is primarily by the operator
module the gate calls (MODULE_FAMILY); the pure-DataFrame gates are
assigned explicitly (QID_FAMILY overrides, which also win over module
inference where a gate's headline semantics differ from its helper
calls)."""
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from split_entry_lib import parse

FAMILIES = {
    "core": ("CoreGates", "reference-port pipeline analogues: joins, "
             "counters, sessions, dedupe-in-stream, validation, flat chains"),
    "tables": ("TableGates", "storage/table machinery: upsert/MoR, CDC, "
               "time travel, layout (z-order, RLE, dict, buckets), ingest, "
               "schema evolution, profiling, data quality"),
    "machinery": ("MachineryGates", "Catalyst machinery: rewrite rules, "
                  "matviews, pushdowns, IVM, routing/hashing, SQL surface"),
    "dedup": ("DedupGates", "near-duplicate mining: n-gram/MinHash/SimHash/"
              "PPJoin/substring/winnowing, record linkage, fuzzy matching"),
    "similarity": ("SimilarityGates", "embedding ops: brute/LSH/IVF/PQ ANN, "
                   "clustering + indices, valuation, retrieval eval, MMR"),
    "text": ("TextGates", "text analysis + corpus prep: quality, lang-ID, "
             "repetition, PII, packing, contamination, keywords, readability"),
    "tokenizers": ("TokenizerGates", "subword tokenizers: BPE train/encode, "
                   "unigram-LM train/encode, fertility, n-gram LMs"),
    "sketches": ("SketchGates", "probabilistic sketches: HLL, KMV, "
                 "count-min, Misra–Gries, AMS, exact-quantile references"),
    "graph": ("GraphGates", "graph analytics: PageRank, components, "
              "triangles, centralities, k-core, motifs, process mining"),
    "timeseries": ("TimeSeriesGates", "time series: smoothing, forecasts, "
                   "changepoints, ACF, drift monitors, matrix profile"),
    "stats": ("StatsGates", "statistical tests + estimation: rank tests, "
              "divergences, richness, tail/moment estimators, sampling audits"),
    "experiment": ("ExperimentGates", "experimentation + causal: CUPED, "
                   "uplift, DiD, IPS/DR, raking, power, mixtures, valuation"),
    "ranking": ("RankingGates", "ranking/classifier eval: AUC, calibration, "
                "gains, nDCG-shape metrics, pass@k, slice finder"),
    "preference": ("PreferenceGates", "preference/RL + annotation: "
                   "Bradley–Terry, DPO/GRPO shapes, agreement coefficients"),
    "privacy": ("PrivacyGates", "privacy: k-anon, l-div, t-closeness, DP "
                "mechanisms, masking, crypto-shred, audit sinks"),
    "retail": ("RetailGates", "TPC-H-flavor business analytics: revenue, "
               "cohorts, RFM, market share, star rollups"),
}

MODULE_FAMILY = {
    # core pipeline
    "Windows": "core", "IntervalJoin": "core", "IntervalLookup": "core",
    "Funnel": "core", "Retention": "core", "GapFill": "core",
    "Attribution": "experiment", "Scheduling": "core", "Queueing": "stats",
    # tables/storage
    "UpsertTable": "tables", "ZOrderTable": "tables",
    "BucketedTable": "tables", "IncrementalIngest": "tables",
    "ShardExport": "tables", "RunLength": "tables", "Profile": "tables",
    "TableDiff": "tables", "PartitionCompare": "tables",
    "Summarize": "tables", "SpaceCurves": "tables",
    # machinery
    "GraftRegistry": "machinery", "RuntimeFilter": "machinery",
    "JoinStats": "machinery", "TruncEqRewrite": "machinery",
    "MaskingRewrite": "privacy", "StatsBroadcastRewrite": "machinery",
    "AggregateEliminationRewrite": "machinery",
    "RangeContradictionRewrite": "machinery",
    "DistinctEliminationRewrite": "machinery",
    "JoinEliminationRewrite": "machinery", "MatviewRewrite": "machinery",
    "EpochCmpRewrite": "machinery", "PrefixScan": "machinery",
    # dedup / linkage
    "Dedup": "dedup", "RollingMinHash": "dedup",
    "StringSimilarity": "dedup", "FuzzyJoin": "dedup",
    "RecordLinkage": "dedup",
    # similarity / clustering
    "Similarity": "similarity", "KMeansExact": "similarity",
    "ItemCF": "similarity", "Coreset": "similarity",
    "NegativeSampling": "similarity", "SpatialJoin": "similarity",
    # text / corpus
    "CorpusOps": "text", "TextRank": "text", "GopherRules": "text",
    "CharEntropyFn": "text", "Readability": "text", "Stylometry": "text",
    "PhraseIndex": "text", "DialogQa": "text", "Blocklist": "text",
    "NgramLm": "tokenizers", "BpeTrainer": "tokenizers",
    "UnigramLm": "tokenizers", "HashedClassifier": "text",
    # sketches
    "HllSketch": "sketches", "CountMinSketch": "sketches",
    "KmvSketch": "sketches", "MisraGries": "sketches",
    "ExactQuantiles": "sketches", "PolyHash64": "sketches",
    # graph
    "Graph": "graph", "Motif": "graph", "ProcessMining": "graph",
    # timeseries
    "Trend": "timeseries", "Anomaly": "timeseries", "Drift": "timeseries",
    "Lttb": "timeseries",
    # stats
    "PairedTests": "stats", "OrdinalTests": "stats", "RankStats": "stats",
    "Inequality": "stats", "Dispersion": "stats",
    "EnergyDistance": "stats", "Reliability": "preference",
    "LMoments": "stats", "Dependence": "stats", "MetaAnalysis": "stats",
    "PowerAnalysis": "experiment", "Sequential": "stats",
    "CaptureRecapture": "stats", "HorvitzThompson": "stats",
    "Conformal": "stats", "Isotonic": "stats", "EmpiricalBayes": "experiment",
    "Richness": "stats", "GlobalRank": "ranking", "EvalCurves": "ranking",
    # experimentation
    "Causal": "experiment", "OffPolicy": "experiment", "Raking": "experiment",
    "TargetEncode": "experiment", "Dsir": "experiment", "Mixture": "experiment",
    # preference / annotation
    "Preference": "preference",
    # privacy
    "Privacy": "privacy",
    # generic expression/type helpers carry no family signal
    "expressions": None, "functions": None, "types": None,
}

QID_FAMILY = {
    # core reference analogues (TPC-H-shape + the flagship join chains)
    "q01_pricing_summary": "core", "q02_region_revenue": "core",
    "q03_top_orders": "core", "q04_hourly_metrics": "core",
    "q05_sliding_counts": "core", "q06_weekly_counts": "core",
    "q07_cumulate": "core", "q08_sessionize": "core",
    "q09_asof_join": "core", "q10_interval_join": "core",
    "q11_semi_gate": "core", "q14_last_seen": "core",
    "q15_hot_keys": "core", "q24_query_hash": "core",
    "q25_inferred_join": "core", "q26_combine_dlog": "core",
    "q29_counter_family": "core", "q31_session_cogroup": "core",
    "q32_latest_impressions": "core", "q33_redundant_repoint": "core",
    "q35_flat_chain": "core", "q36_counter_all": "core",
    "q37_redundant_actions": "core", "q38_session_payload": "core",
    "q39_merge_details": "core", "q55_skew_interval": "core",
    "q64_funnel": "core", "q65_retention": "core", "q67_gap_fill": "core",
    "q82_transitions": "core", "q103_rollup_metrics": "core",
    "q148_daily_trend": "timeseries", "q149_metric_pivot": "retail",
    "q151_session_paths": "core", "q152_gap_histogram": "core",
    "q169_identity_stitch": "core", "q170_span_filter": "core",
    "q172_asof_nearest": "core", "q188_seq_pairs": "core",
    "q192_temporal_dim_join": "core", "q195_fifo_match": "core",
    "q210_pattern_negation": "core", "q269_lateness_audit": "core",
    "q270_concurrency": "core", "q271_interval_sched": "core",
    "q318_interval_bnlj_ref": "core", "q322_alert_debounce": "core",
    "q324_interval_large": "core", "q110_attribution": "experiment",
    "q111_linear_attribution": "experiment",
    "q147_position_attribution": "experiment",
    # dedup
    "q12_dedup_first": "dedup", "q13_dedup_exact": "dedup",
    "q18_fingerprint": "dedup", "q19_ngram_jaccard": "dedup",
    "q21_minhash_pairs": "dedup", "q22_simhash": "dedup",
    "q27_embed_neardup": "dedup", "q30_rolling_fp": "dedup",
    "q41_neardup_components": "dedup", "q42_clean_corpus": "dedup",
    "q53_line_dedup": "dedup", "q57_exact_substring": "dedup",
    "q58_sem_dedup": "dedup", "q116_containment": "dedup",
    "q123_dedup_audit": "dedup", "q161_source_overlap": "dedup",
    "q176_jaro_winkler": "dedup", "q177_entity_clusters": "dedup",
    "q213_sorted_neighborhood": "dedup", "q266_fs_linkage": "dedup",
    "q277_survivorship": "dedup", "q343_record_linkage": "dedup",
    "q346_linkage_em": "dedup", "q347_link_clusters": "dedup",
    "q378_winnowing": "dedup", "q434_lsh_planner": "dedup",
    "q92_fuzzy_join": "dedup", "q95_fuzzy_stress": "dedup",
    # similarity / embeddings / clustering
    "q20_knn_cosine": "similarity", "q23_lsh_ann": "similarity",
    "q34_ivf_ann": "similarity", "q43_random_projection": "similarity",
    "q52_pq_ann": "similarity", "q56_pq_trained": "similarity",
    "q83_ivfpq_ann": "similarity", "q96_pq_rerank": "similarity",
    "q120_triplet_mining": "similarity", "q136_label_centroids": "similarity",
    "q137_centroid_confusion": "similarity", "q138_gram_matrix": "similarity",
    "q143_item_similarity": "similarity", "q144_ann_recall": "similarity",
    "q145_ann_rank_metrics": "similarity", "q150_int8_quant": "similarity",
    "q155_tfidf_cosine": "similarity", "q158_hybrid_rrf": "similarity",
    "q159_ivf_upsert": "similarity", "q183_kmeans": "similarity",
    "q218_grid_join": "similarity", "q258_grid_dbscan": "similarity",
    "q268_kcenter_coreset": "similarity", "q320_ivf_sweep": "similarity",
    "q369_silhouette": "similarity", "q370_davies_bouldin": "similarity",
    "q397_calinski_harabasz": "similarity", "q398_adjusted_rand": "similarity",
    "q401_mmr_rerank": "similarity", "q425_knn_shapley": "similarity",
    "q429_label_noise": "similarity", "q430_retrieval_eval": "similarity",
    # text / corpus
    "q16_text_stats": "text", "q17_lang_stats": "text",
    "q28_bpe_tokens": "text", "q40_repetition": "text",
    "q44_split_assign": "text", "q45_pack_sequences": "text",
    "q46_pii_scrub": "text", "q47_contamination": "text",
    "q48_length_quantiles": "text", "q49_mixture_sample": "text",
    "q59_quality_classifier": "text", "q93_gopher_rules": "text",
    "q99_chunk_overlap": "text", "q105_blocklist": "text",
    "q106_char_entropy": "text", "q119_tfdf_keywords": "text",
    "q125_collocations": "text", "q134_quality_canon": "text",
    "q135_lang_report": "text", "q153_quality_percentile": "text",
    "q187_vocab_coverage": "text", "q189_textrank": "text",
    "q197_nucleus": "text", "q237_vocab_growth": "text",
    "q263_phrase_search": "text", "q281_autocomplete": "text",
    "q302_rake": "text", "q323_data_card": "text",
    "q371_readability": "text", "q372_ppmi_window": "text",
    "q375_oov_rate": "text", "q379_zipf_slope": "text",
    "q404_luhn_summary": "text", "q414_burrows_delta": "text",
    "q426_ppl_filter": "text", "q198_leakage_audit": "text",
    # tokenizers
    "q60_bpe_train": "tokenizers", "q78_bpe_encode": "tokenizers",
    "q100_bigram_lm": "tokenizers", "q351_unigram_lm": "tokenizers",
    "q352_unigram_encode": "tokenizers", "q384_kneser_ney": "tokenizers",
    "q427_bpe_fertility": "tokenizers",
    # sketches
    "q62_hll_sketch": "sketches", "q63_count_min": "sketches",
    "q66_kmv_jaccard": "sketches", "q69_sliding_hll": "sketches",
    "q88_heavy_hitters": "sketches", "q89_exact_quantiles": "sketches",
    "q112_sliding_heavy": "sketches", "q115_freq_spectrum": "sketches",
    "q167_distinct_pregroup": "sketches", "q168_salted_sets": "sketches",
    "q225_kmv_overlap": "sketches", "q383_ams_f2": "sketches",
    # graph
    "q77_pagerank": "graph", "q84_label_prop": "graph",
    "q85_triangles": "graph", "q86_modularity": "graph",
    "q87_ppr": "graph", "q128_kcore": "graph", "q180_bfs_hops": "graph",
    "q181_sssp": "graph", "q203_weighted_pagerank": "graph",
    "q204_assortativity": "graph", "q219_edge_support": "graph",
    "q241_top_component": "graph", "q244_hits": "graph",
    "q257_two_hop_agg": "graph", "q296_link_predict": "graph",
    "q328_cc_bigstar": "graph", "q332_betweenness": "graph",
    "q367_conductance": "graph", "q386_rich_club": "graph",
    "q410_attr_assortativity": "graph", "q412_morans_i": "graph",
    "q428_eccentricity": "graph", "q436_conformance": "graph",
    "q438_clustering_coeff": "graph",
    # timeseries
    "q75_ewma": "timeseries", "q102_cusum_drift": "timeseries",
    "q118_seasonal_residual": "timeseries", "q124_psi_drift": "timeseries",
    "q127_trending": "timeseries", "q133_decayed_score": "timeseries",
    "q162_revenue_halflife": "timeseries", "q164_changepoint": "timeseries",
    "q186_sax": "timeseries", "q226_holt_forecast": "timeseries",
    "q229_holt_winters": "timeseries", "q230_theil_sen": "timeseries",
    "q231_decompose": "timeseries", "q232_linear_fill": "timeseries",
    "q233_isotonic": "timeseries", "q248_drawdown": "timeseries",
    "q251_acf": "timeseries", "q254_rolling_ols": "timeseries",
    "q289_forecast_backtest": "timeseries", "q299_mann_kendall": "timeseries",
    "q303_croston": "timeseries", "q305_page_hinkley": "timeseries",
    "q330_matrix_profile": "timeseries", "q380_lead_lag": "timeseries",
    "q395_newey_west": "timeseries", "q400_seasonal_strength": "timeseries",
    "q422_taylors_law": "timeseries", "q423_hurst": "timeseries",
    # stats
    "q70_mad_outliers": "stats", "q121_trimmed_stats": "stats",
    "q139_ks_test": "stats", "q154_ab_chi2": "stats", "q163_gini": "stats",
    "q171_robust_scale": "stats", "q194_qq_map": "stats",
    "q199_simpson": "stats", "q200_benford": "stats",
    "q245_spearman": "stats", "q246_rank_sum": "stats",
    "q249_cohen_kappa": "preference", "q252_kendall_tau": "stats",
    "q279_cvm_test": "stats", "q300_bh_fdr": "stats",
    "q357_mutual_info": "stats", "q358_cramers_v": "stats",
    "q360_weighted_quantiles": "stats", "q364_mcnemar": "stats",
    "q365_mantel_haenszel": "stats", "q366_jackknife_ratio": "stats",
    "q373_cochran_q": "stats", "q374_js_divergence": "stats",
    "q377_poisson_bootstrap": "stats", "q310_poisson_bootstrap": "stats",
    "q382_chao_richness": "stats", "q387_theil_index": "stats",
    "q388_dispersion": "stats", "q389_capture_recapture": "stats",
    "q390_runs_test": "stats", "q391_energy_distance": "stats",
    "q392_hill_tail": "stats", "q393_cronbach_alpha": "preference",
    "q394_kendalls_w": "preference", "q402_meta_analysis": "stats",
    "q411_kruskal_wallis": "stats", "q415_chatterjee_xi": "stats",
    "q417_l_moments": "stats", "q418_cliffs_delta": "stats",
    "q419_jonckheere": "stats", "q420_moods_median": "stats",
    "q421_littles_law": "stats", "q433_sprt": "stats",
    "q435_horvitz_thompson": "stats", "q437_capture_recapture": "stats",
    "q273_pps_sample": "stats", "q282_fk_closed_sample": "stats",
    "q311_hoeffding_sequential": "stats", "q227_apportion": "stats",
    # experimentation / causal / weighting
    "q101_dsir_weights": "experiment", "q104_mixture_weights": "experiment",
    "q122_curriculum": "experiment", "q129_wilson_gate": "experiment",
    "q234_shapley": "experiment", "q235_neyman": "experiment",
    "q238_diff_in_did": "experiment", "q238_diff_in_diff": "experiment",
    "q240_uplift_curve": "experiment", "q259_cuped": "experiment",
    "q262_poststrat_ate": "experiment", "q265_replay_ips": "experiment",
    "q285_qte": "experiment", "q286_balance_audit": "experiment",
    "q298_target_encode": "experiment", "q314_mix_shift": "experiment",
    "q321_twfe": "experiment", "q329_woe_iv": "experiment",
    "q359_snips_dr": "experiment", "q361_ess": "experiment",
    "q376_power_mde": "experiment", "q381_raking": "experiment",
    "q399_price_elasticity": "experiment", "q413_eb_smoothing": "experiment",
    "q416_price_index": "experiment", "q424_doremi_mixture": "experiment",
    "q68_stratified_split": "experiment", "q73_weighted_sample": "experiment",
    "q49_mixture_sample_DUP": None,
    # ranking / eval
    "q140_auc": "ranking", "q141_calibration": "ranking",
    "q142_slice_finder": "ranking", "q184_rbo": "ranking",
    "q185_nb_confusion": "ranking", "q206_leave_last_out": "ranking",
    "q309_avg_precision": "ranking", "q317_gains_table": "ranking",
    "q340_pass_at_k": "ranking", "q341_best_of_n": "ranking",
    "q342_wilson_lb": "ranking", "q403_youden": "ranking",
    "q405_win_ratio": "ranking", "q98_grouped_topk": "ranking",
    "q72_bm25": "ranking", "q184_rbo_DUP": None,
    "q267_gini_stump": "ranking", "q201_negative_sampling": "similarity",
    # preference / annotation
    "q333_bradley_terry": "preference", "q334_trunc_recall": "preference",
    "q335_group_advantage": "preference", "q336_krippendorff": "preference",
    "q337_dpo_margins": "preference", "q338_dawid_skene": "preference",
    "q339_krippendorff_interval": "preference", "q344_bt_ties": "preference",
    "q355_length_bias": "preference", "q356_bt_calibration": "preference",
    "q362_brier_decomp": "preference", "q363_pairwise_kappa": "preference",
    "q409_fleiss_kappa": "preference", "q368_transcript_audit": "preference",
    "q306_gen_ladder": "preference",
    # privacy
    "q211_k_anonymity": "privacy", "q224_private_histogram": "privacy",
    "q250_t_closeness": "privacy", "q297_l_diversity": "privacy",
    "q312_crypto_shred": "privacy", "q313_audit_sink": "privacy",
    "q353_masking": "privacy", "q432_dp_counts": "privacy",
    "q191_erasure": "privacy",
    # survival (kept with stats)
    "q214_kaplan_meier": "stats", "q236_nelson_aalen": "stats",
    "q319_logrank": "stats", "q385_competing_risks": "stats",
    "q406_cox_score": "stats", "q407_gehan_wilcoxon": "stats",
    "q408_rmst": "stats",
    # retail / business analytics
    "q156_cube_metrics": "retail", "q160_cohort_ltv": "retail",
    "q165_profit": "retail", "q166_market_share": "retail",
    "q173_customer_orders": "retail", "q174_audience_churn": "retail",
    "q179_user_entropy": "retail", "q220_small_qty_revenue": "retail",
    "q221_waiting_supplier": "retail", "q222_idle_rich_customers": "retail",
    "q223_dominant_supplier": "retail", "q242_large_orders": "retail",
    "q243_top_supplier": "retail", "q247_disjunct_revenue": "retail",
    "q315_rfm": "retail", "q316_star_rollup": "retail",
    "q131_funnel_latency": "core", "q130_session_percentiles": "core",
    "q175_daily_percentiles": "retail", "q126_sliding_percentiles": "core",
    "q108_sliding_distinct": "core", "q109_sliding_freq": "core",
    "q107_filter_stack": "text", "q113_equi_depth": "sketches",
    "q114_join_size": "machinery", "q117_moment_profile": "stats",
    # tables / storage / ingest
    "q50_upsert_snapshot": "tables", "q51_upsert_incremental": "tables",
    "q54_derived_agg": "tables", "q61_zorder_read": "tables",
    "q74_bucketed_join": "tables", "q76_bloom_skip": "tables",
    "q71_bloom_join": "machinery", "q79_profile": "tables",
    "q80_quality_checks": "tables", "q81_table_diff": "tables",
    "q90_shard_export": "tables", "q91_incremental_ingest": "tables",
    "q97_ingest_rounds": "tables", "q132_cdc_chunks": "tables",
    "q157_scd2": "tables", "q190_compaction_bins": "tables",
    "q193_json_ingest": "tables", "q202_ref_integrity": "tables",
    "q205_json_nested": "tables", "q208_bucketed_agg": "tables",
    "q209_time_travel_diff": "tables", "q215_melt_roundtrip": "tables",
    "q216_fd_audit": "tables", "q255_table_checksum": "tables",
    "q261_rle_layout": "tables", "q264_dict_encode": "tables",
    "q274_bitemporal": "tables", "q276_delta_layout": "tables",
    "q278_fk_inference": "tables", "q288_event_sourcing": "tables",
    "q290_tree_flatten": "tables", "q291_subtree_rollup": "tables",
    "q293_format_parity": "tables", "q294_schema_evolution": "tables",
    "q304_synth_source": "tables", "q326_synth_agg": "tables",
    "q146_doc_skyline": "retail", "q94_winsorize": "stats",
    "q178_time_weighted": "timeseries",
    # machinery / SQL surface
    "q207_sql_surface": "machinery", "q217_join_view": "machinery",
    "q256_notin_nullaware": "machinery", "q272_session_ivm": "machinery",
    "q275_hash_ring": "machinery", "q280_hilbert_locality": "tables",
    "q283_lttb": "timeseries", "q284_postings_cost": "machinery",
    "q287_hrw_hashing": "machinery", "q292_trunc_pushdown": "machinery",
    "q295_epoch_pushdown": "machinery", "q301_join_ivm": "machinery",
    "q307_interval_lookup": "machinery", "q308_matview_rewrite": "machinery",
    "q325_matview_e2e": "machinery", "q327_join_elim": "machinery",
    "q331_distinct_elim": "machinery", "q345_analyze": "machinery",
    "q348_agg_elim": "machinery", "q349_range_prune": "machinery",
    "q350_negative_sampling": "similarity", "q354_stats_broadcast": "machinery",
    "q212_assoc_rules": "retail", "q253_freq_triples": "retail",
    "q182_interval_coverage": "core", "q196_rollup_cascade": "retail",
    "q228_topk_other": "retail", "q239_markov_removal": "experiment",
    "q260_conformal": "stats", "q431_conformal": "stats",
    "q396_closeness": "graph", "q409_fleiss_kappa_DUP": None,
}


def classify(q_entries):
    mod_re = re.compile(
        r"\boperators\.([A-Z]\w+)|\bagg\.(\w+)|\bjobs\.(\w+)|\bsinks\.(\w+)"
        r"|\bstreaming\.(\w+)|\bplans\.(\w+)|\bsql\.(\w+)|\bsources\.(\w+)"
        r"|\bmultimodal\.(\w+)|\bfunctions\.([A-Z]\w+)")
    out = {}
    unknown = []
    for qid, lines in q_entries:
        if qid in QID_FAMILY and QID_FAMILY[qid]:
            out[qid] = QID_FAMILY[qid]
            continue
        body = "\n".join(l for l in lines if not l.strip().startswith("//"))
        fam = None
        for tup in mod_re.findall(body):
            for tok in tup:
                if tok and MODULE_FAMILY.get(tok):
                    fam = MODULE_FAMILY[tok]
                    break
            if fam:
                break
        if fam:
            out[qid] = fam
        else:
            unknown.append(qid)
    return out, unknown


if __name__ == "__main__":
    p = parse()
    fams, unknown = classify(p["q_entries"])
    import collections
    c = collections.Counter(fams.values())
    for f, n in c.most_common():
        print(f"{f:12s} {n}")
    print("total classified:", len(fams), " unknown:", len(unknown))
    for q in unknown:
        print("  ?", q)
    if len(sys.argv) > 1 and sys.argv[1] == "--list":
        byfam = collections.defaultdict(list)
        for q, f in fams.items():
            byfam[f].append(q)
        for f in sorted(byfam):
            print(f"\n== {f} ==")
            for q in sorted(byfam[f]):
                print("  ", q)
