from .registry import ORACLES, QUERIES, query  # noqa: F401
from .tables import epoch_us, load_table  # noqa: F401

# importing the corpus modules populates the registry
from . import core  # noqa: F401,E402
from . import extensions  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The verify driver compares the FIRST 50 registry entries (insertion order)
# against their DuckDB oracles; the rest only get in-repo verification via
# tests/test_oracle_parity.py, which sweeps ALL oracle-backed queries with the
# identical rows+schema+value-hash protocol.  Rounds 1-2 filled the window in
# file order, so the newest operators (data-mixing tier x22-x25, skewed as-of
# x26, unsupervised near-dup x28) never received a driver row.
#
# _WINDOW_HEAD puts the never-driver-checked queries first; _WINDOW_TAIL parks
# the simplest twice-green scans/aggregates (unchanged since round 1, green in
# both CORRECTNESS_r01 and _r02) outside the window.  Every query stays
# registered and oracle-parity-tested regardless of position.
# ---------------------------------------------------------------------------

_WINDOW_HEAD = [
    # Round-8 window (exactly 50), executing the round-7 verdict item 1:
    # ALL 48 never-driver-checked queries (x122-x169 — everything
    # registered after the r07 head was fixed: the Hamming/contrastive/
    # graph tier, BPE, MMR, forward index, spectral, the modern
    # selection pipeline, SemDeDup lifecycle, session-5 additions) take
    # the head as first-round rows.  The remaining 2 slots go to this
    # round's new queries (registered below the block, appended at the
    # end of the head list).
    "x122_hamming_refine_knn",
    "x123_hard_negative_mining",
    "x124_contrastive_triplets",
    "x125_link_centrality",
    "x126_bpe_vocabulary",
    "x127_bpe_encode_vocab",
    "x128_mmr_rerank",
    "x129_forward_index_fetch",
    "x130_top_component",
    "x131_remove_top_component",
    "x132_histogram_quantiles",
    "x133_prefix_term_search",
    "x134_tokenizer_fertility",
    "x135_personalized_pagerank",
    "x136_snapshot_diff",
    "x137_retrieval_mrr",
    "x138_debias_knn",
    "x139_grouped_quantiles",
    "x140_retention_cohorts",
    "x141_weighted_pagerank",
    "x142_hits_containment",
    "x143_importance_weights",
    "x144_label_propagation",
    "x145_ccnet_buckets",
    "x146_triangle_stats",
    "x147_winnow_candidates",
    "x148_gopher_rules",
    "x149_lang_reid_confusion",
    "x150_split_leakage",
    "x151_cluster_aware_split",
    "x152_lsh_recall_audit",
    "x153_modern_selection_pipeline",
    "x154_dup_ngram_stats",
    "x155_importance_snapshot_probe",
    "x156_cluster_size_histogram",
    "x157_semdedup",
    "x158_perceptron_train",
    "x159_concat_chunk_spans",
    "x160_pii_scan",
    "x161_vocab_growth",
    "x162_doremi_reweight",
    "x163_chunk_dedup",
    "x164_zipf_histogram",
    "x165_corpus_datasheet",
    "x166_semantic_split_leakage",
    "x167_semdedup_hier",
    "x168_semdedup_from_index",
    "x169_perceptron_heldout_eval",
    # Round-8 slots 49-50: the new first-round row (x170, the x149
    # remedy) and x21 as the touched-code re-check — its probe path
    # gained the zero-norm coarse-ranking guard and its build the
    # content-sensitive fingerprint (_ensure_ivf_index, shared with
    # the head's own x166/x168).
    "x170_lang_snapshot_reid",
    "x21_ann_ivf_index_probe",
    # The r02-stale block (q26/q28-q32, x01-x13, x15/x17/x18 — ~20
    # queries, six rounds stale after this round) leads the r09
    # rotation per verdict item 8, together with re-checks of any code
    # touched in r08 (x126/x127 delta trainer, x137/x166 served forms).
]

# Parked this round per the park-the-twice-green convention (every row
# here has >= 2 driver greens with a recent r05/r06 green, except
# noted; all remain swept by tests/test_oracle_parity.py with the
# identical protocol): the entire round-6 head — its r06 firsts
# (x95/x96... x96/x97 re-enter the head as touched-code re-checks),
# the r05 firsts x83-x94, the freshly re-checked r06 rows (q27,
# x03/x04/x05/x14, x19, the sampling/monitor tier) — plus the
# long-parked q33/x16..x81 block.  Everything not listed in HEAD or
# TAIL keeps its registration order after the head — all beyond
# slot 50.
_WINDOW_TAIL = [
    "x95_kneser_ney_surprisal",
    "q27_pricing_summary",
    "x03_quality_stats",
    "x04_lang_id",
    "x05_doc_fingerprint",
    "x14_multimodal_features",
    "x19_range_join_long_intervals",
    "x22_hash_split",
    "x23_stratified_sample",
    "x25_domain_mixture",
    "x31_benchmark_decontamination",
    "x32_repetition_ratio",
    "x35_per_domain_cap",
    "x36_quality_percentile_filter",
    "x37_uniform_rebalance",
    "x39_line_dedup",
    "x41_shard_manifest",
    "x42_minhash_accuracy_audit",
    "x43_contamination_fraction",
    "x44_token_budget_selection",
    "x45_mixture_drift",
    "x46_quality_distribution",
    "x49_incremental_dedup_probe",
    "x51_unigram_surprisal",
    "x53_random_projection",
    "x55_temperature_rebalance",
    "x56_novelty_score",
    "x57_percentile_rank",
    "x61_length_bucketed_batches",
    "x63_event_sessions",
    "x64_scd2_history",
    "x65_pivot_counts",
    "x66_rollup_counts",
    "x67_set_ops",
    "x68_unpivot_metrics",
    "x82_trigram_backoff_surprisal",
    "x83_span_dedup",
    "x84_trigram_jm_surprisal",
    "x85_tfidf_snapshot_probe",
    "x86_surprisal_snapshot_probe",
    "x87_vocab_coverage",
    "x88_containment_pairs",
    "x90_ivf_knn_join",
    "x91_quantized_knn_index_join",
    "x92_quantization_recall",
    "x93_quality_cluster_dedup",
    "x94_fourgram_jm_surprisal",
    "q33_warehouse_roundtrip",
    "x16_asof_join",
    "x20_ann_lsh_index_probe",
    "x24_sequence_packing",
    "x26_asof_join_skewed",
    "x27_ann_ivf_kmeans_probe",
    "x28_embedding_near_dup_lsh",
    "x29_ann_lsh_multiprobe",
    "x30_index_append_probe",
    "x33_near_dup_removal",
    "x34_duplicate_clusters",
    "x38_semantic_cluster_centroids",
    "x40_tfidf_top_terms",
    "x47_hashed_linear_score",
    "x48_cluster_dedup",
    "x50_doc_chunking",
    "x52_bloom_decontamination",
    "x54_pretraining_pipeline",
    "x58_knn_join",
    "x59_knn_join_multiprobe",
    "x60_ann_recall_audit",
    "x62_merge_upsert",
    "x69_text_normalize",
    "x71_dedup_rate_by_source",
    "x72_top_terms_global",
    "x73_length_histogram",
    "x74_cross_source_dups",
    "x75_asof_tolerance",
    "x76_sliding_window_avg",
    "x77_daily_growth",
    "x78_grouped_percentile_rank",
    "x79_top_terms_sketch",
    "x80_bigram_surprisal",
    "x81_weighted_sample",
]


def _reorder() -> None:
    head = [n for n in _WINDOW_HEAD if n in QUERIES]
    tail = [n for n in _WINDOW_TAIL if n in QUERIES]
    mid = [n for n in QUERIES if n not in head and n not in tail]
    ordered = head + mid + tail
    for reg in (QUERIES, ORACLES):
        snapshot = {n: reg[n] for n in ordered if n in reg}
        reg.clear()
        reg.update(snapshot)


_reorder()
