"""Pin the driver-visible registry window.

The external correctness harness verifies exactly the FIRST 50 entries
of ``Q.REGISTRY`` (registration order). A mis-ordered insert anywhere in
the query modules would silently swap the checked set — this test turns
that invariant from a memory note into a hard failure.

The expected list is the exact window recorded in CORRECTNESS_r02.json
(all 50 green). Changing the window is allowed but must be DELIBERATE:
update this list in the same commit and re-verify with
``tools/check_correctness.py``.
"""

from multimodal_vector_db_spark import queries as Q

DRIVER_WINDOW = [
    "knn_single", "knn_batch",
    "topk_per_group", "filter_project", "captions_join", "anti_join",
    "result_overlap",
    "doc_text_stats", "lang_id", "repetition_filter",
    "source_mixing_sample",
    "string_pipeline", "percentile_stats", "dedup_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "near_dup_embedding", "metrics_eval", "contamination",
    "label_centroids", "matryoshka_knn",
    "fp16_round_trip", "pq_encode_decode", "pq_adc_knn", "mmr_rerank",
    "index_stats", "multimodal_features",
    "sessionization",
    "cross_modal_routed", "scalar_functions",
    "linear_projection",
    # round 11: the registry's two hardest oracles rotated INTO the
    # driver gate (VERDICT r10 ask)
    "ann_ivf_knn", "bpe_merge_table",
    # round 12: eight never-driver-checked entries rotated in (the
    # standing rotation policy in queries/__init__.py names each
    # demoted entry's covering twin)
    "asof_join", "bm25_search", "hybrid_rrf_search",
    "events_sliding_window", "tpch_q18", "mrr_metric",
    "incremental_dedup", "pca_matryoshka_knn",
    # round 13: eight more never-driver-checked entries (see the
    # rotation policy in queries/__init__.py for each demoted entry's
    # covering twin)
    "hll_distinct", "cms_heavy_hitters", "tfidf_top_terms",
    "event_funnel", "semantic_dedup", "shard_packing",
    "opq_adc_knn", "tpch_q6",
]


def test_registry_window_is_pinned():
    assert list(Q.REGISTRY)[:50] == DRIVER_WINDOW


def test_every_window_query_has_an_oracle():
    # every driver-checked query must have an oracle SQL pair (the
    # strong hash gate, not the weaker rows-only check)
    for name in DRIVER_WINDOW:
        assert name in Q.ORACLES, f"{name} lost its oracle"


def test_every_oracle_has_a_query():
    for name in Q.ORACLES:
        assert name in Q.REGISTRY, f"oracle {name} has no query"
