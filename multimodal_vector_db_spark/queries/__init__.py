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
# Round 11 rotates the registry's two HARDEST oracles into the window
# so the driver re-proves them every round: ann_ivf_knn (MLlib-KMeans
# fit/serve split through the committed centroid fixture) and
# bpe_merge_table (greedy BPE training replayed as a DuckDB recursive
# CTE). Demoted past the window (still registered, still locally
# verified via tools/check_correctness.py over the full registry):
# semi_join (overlaps anti_join), intersect_op (E1 also covered by
# result_overlap), dedup_keep_first (overlaps dedup_exact), tpch_q3
# (TPC-H breadth also shown by q1/q5/q6/q13/q14/q18), knn_l2 (J2 also
# covered by knn_single + distance_transforms), orders_topk (W1 also
# covered by knn_single/topk_per_group).
# ---------------------------------------------------------------------------

_PROMOTED = [
    "cross_modal_routed", "scalar_functions", "linear_projection",
    "ann_ivf_knn", "bpe_merge_table",
]
_DEMOTED = [
    "semi_join", "intersect_op", "dedup_keep_first", "tpch_q3",
    "knn_l2", "orders_topk",
]


def _reorder_registry() -> None:
    global REGISTRY, ORACLES
    head = [
        n for n in REGISTRY
        if n not in _DEMOTED and n not in _PROMOTED
    ]
    order = head[:45] + _PROMOTED + head[45:] + _DEMOTED
    missing = [n for n in order if n not in REGISTRY]
    assert not missing, f"reorder references unknown queries: {missing}"
    assert len(order) == len(REGISTRY)
    REGISTRY = {n: REGISTRY[n] for n in order}
    ORACLES = {n: ORACLES[n] for n in order if n in ORACLES}


_reorder_registry()
