"""Declared query registry: every implemented operator from SURVEY.md SS2
(plus the training-data-pipeline extensions) as a (spark, sf_dir) ->
DataFrame callable with a DuckDB-oracle SQL twin.

REGISTRATION ORDER IS LOAD-BEARING: the external correctness harness
verifies the FIRST 50 entries of REGISTRY. The module manifest below is
imported IN ORDER; decorators register at import. Do not reorder the
manifest or insert queries mid-module without re-checking
tests/test_registry_window.py (which pins the exact window).
"""

from __future__ import annotations

from ._core import ORACLES, REGISTRY, _csv_doubles, _csv_longs, _t, query  # noqa: F401

# ordered manifest — import order = registration order
from .m1_knn_relational import *  # noqa: F401,F403
from .m2_text_dedup import *  # noqa: F401,F403
from .m3_metrics_compression import *  # noqa: F401,F403
from .m4_multimodal_tpch import *  # noqa: F401,F403
from .m5_ann_search import *  # noqa: F401,F403
from .m6_sketches_scale import *  # noqa: F401,F403
from .m7_corpus_analytics import *  # noqa: F401,F403
from .m8_quant_packing import *  # noqa: F401,F403
from .m8b_tpch_breadth import *  # noqa: F401,F403
from .m9_serving import *  # noqa: F401,F403
from .m10_corpus_ops import *  # noqa: F401,F403
from .m11_curation3 import *  # noqa: F401,F403
from .m12_curation4 import *  # noqa: F401,F403
from .m13_funnel import *  # noqa: F401,F403
from .m14_serving2 import *  # noqa: F401,F403
from .m15_tokenpack import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# Registry ordering: the external correctness harness verifies the FIRST
# 50 registered queries only, so the §2-core surface — including the
# reference's signature cross-modal routed query
# (search_cross_modal.py:107-173) — must sit inside that window.
#
# ROTATION POLICY (round 12, standing): driver-side evidence must
# eventually cover the WHOLE registry, not the same 50 entries — so
# each round PROMOTES ≥5 entries that have never appeared in any
# CORRECTNESS_r*.json into the window (picked from the never-checked
# tail, favoring module diversity and the hardest oracles), and
# DEMOTES window entries whose §2 row stays covered by an in-window
# twin and which already carry several prior driver passes. Demoted
# entries remain registered and locally hash-verified every round via
# ``tools/check_correctness.py`` over the full registry
# (CORRECTNESS_local.json); ``tests/test_registry_window.py`` pins the
# resulting window so any accidental reorder is a hard test failure.
#
# Round 11: the registry's two HARDEST oracles rotated in — ann_ivf_knn
# (MLlib-KMeans fit/serve split through the committed centroid fixture)
# and bpe_merge_table (greedy BPE training replayed as a DuckDB
# recursive CTE). Demoted: semi_join (overlaps anti_join), intersect_op
# (E1 also covered by result_overlap), dedup_keep_first (overlaps
# dedup_exact), tpch_q3 (TPC-H breadth also shown by
# q1/q5/q6/q13/q14/q18), knn_l2 (J2 also covered by knn_single +
# distance_transforms), orders_topk (W1 also covered by
# knn_single/topk_per_group).
#
# Round 12: EIGHT never-driver-checked entries promoted — asof_join
# (custom as-of join operator), bm25_search + hybrid_rrf_search
# (lexical + fusion retrieval), events_sliding_window (windowed-agg
# twin of the demoted tumbling form), tpch_q18 (TPC-H twin of the
# demoted q1), mrr_metric (metrics-family entry with no prior driver
# row), incremental_dedup (the incremental new-vs-corpus dedup path),
# pca_matryoshka_knn (M10 torch-free PCA training, previously
# local-only). Demoted, each with the in-window (or local) twin named:
# groupby_count (A4 also covered by index_stats), cumulative_window
# (W7 also covered by metrics_eval's cumulative-precision window),
# doc_quality (text-quality family covered by doc_text_stats +
# repetition_filter), map_metric (A7/A8 share operators/metrics.py's
# AP kernel with in-window metrics_eval; MAP stays locally
# hash-verified), attention_pooling (A3 also covered by
# label_centroids), matryoshka_multiscale (F5 shares
# functions/projection.py with in-window matryoshka_knn; locally
# verified), events_tumbling_window (swapped for its sliding twin),
# tpch_q1 (swapped for q18; q1 remains the bench headline).
#
# Round 13: EIGHT more never-driver-checked entries promoted, again
# favoring module diversity and hard oracles — hll_distinct +
# cms_heavy_hitters (m6 sketches: HLL / count-min replayed in DuckDB),
# tfidf_top_terms (m7 corpus analytics), event_funnel (event-sequence
# analytics), semantic_dedup (m11 embedding-centroid dedup),
# shard_packing (m8 output-layout packing), opq_adc_knn (m14 OPQ
# rotation through the committed fixture — a hard serving oracle),
# tpch_q6 (TPC-H pushdown breadth twin of the demoted-in-r12 q1).
# Demoted, each with its covering twin: knn_filtered (J-family covered
# by in-window knn_single/knn_batch + filter_project), union_distinct
# (set family covered by result_overlap + anti_join), hash_split
# (deterministic-hash sampling covered by source_mixing_sample),
# ngram_decontamination (shingle machinery covered by
# dedup_ngram_jaccard + contamination), tokenize_regex (tokenization
# covered by doc_text_stats + string_pipeline), winnow_fingerprint
# (fingerprint family covered by dedup_exact + dedup_simhash),
# distance_transforms (scalar transform family covered by
# scalar_functions; the distance->similarity semantics also exercised
# by every in-window kNN query), frame_sampling (multimodal family
# covered by multimodal_features). fp16_round_trip stays in-window:
# tests/test_coverage_doc.py pins it as part of the reference's
# Ss2-core storage contract (vector_index.py:79-91). All eight demoted entries carry 10+ prior
# driver passes and stay hash-verified every round in
# CORRECTNESS_local.json.
# ---------------------------------------------------------------------------

_PROMOTED = [
    # round 11
    "cross_modal_routed", "scalar_functions", "linear_projection",
    "ann_ivf_knn", "bpe_merge_table",
    # round 12
    "asof_join", "bm25_search", "hybrid_rrf_search",
    "events_sliding_window", "tpch_q18", "mrr_metric",
    "incremental_dedup", "pca_matryoshka_knn",
    # round 13
    "hll_distinct", "cms_heavy_hitters", "tfidf_top_terms",
    "event_funnel", "semantic_dedup", "shard_packing",
    "opq_adc_knn", "tpch_q6",
]
_DEMOTED = [
    # round 11
    "semi_join", "intersect_op", "dedup_keep_first", "tpch_q3",
    "knn_l2", "orders_topk",
    # round 12
    "groupby_count", "cumulative_window", "doc_quality", "map_metric",
    "attention_pooling", "matryoshka_multiscale",
    "events_tumbling_window", "tpch_q1",
    # round 13
    "knn_filtered", "union_distinct", "hash_split",
    "ngram_decontamination", "tokenize_regex", "winnow_fingerprint",
    "distance_transforms", "frame_sampling",
]


def _reorder_registry() -> None:
    global REGISTRY, ORACLES
    head = [
        n for n in REGISTRY
        if n not in _DEMOTED and n not in _PROMOTED
    ]
    cut = 50 - len(_PROMOTED)
    order = head[:cut] + _PROMOTED + head[cut:] + _DEMOTED
    missing = [n for n in order if n not in REGISTRY]
    assert not missing, f"reorder references unknown queries: {missing}"
    assert len(order) == len(REGISTRY)
    REGISTRY = {n: REGISTRY[n] for n in order}
    ORACLES = {n: ORACLES[n] for n in order if n in ORACLES}


_reorder_registry()
