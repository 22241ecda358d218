"""Blocked BLAS serving paths as REGISTERED queries (round-4 verdict
task: the product hot paths — ``knn_join_blocked`` and
``ivf_search_blocked`` — were validated only by pytest parity; these
entries put them in front of the driver every round).

Both are **rows-only by design** (no DuckDB oracle): their scores come
from float64 BLAS matmuls, whose accumulation order differs from the
sequential-fold contract that makes the other kNN queries hash-exact
against DuckDB. Their correctness contract is recall/parity against the
fold-exact forms, pinned in ``tests/test_knn.py``
(``test_knn_join_blocked_matches_exact``,
``test_knn_search_blocked_matches_knn_search``) and
``tests/test_ann.py`` (``test_ivf_search_blocked_matches_ivf_search``)
— the ANN-standard contract, same as ``ann_ivf_knn``.

Reference anchors: ``vector_index.py:162-210`` (batch search; ours is
the shuffle-bounded 100 TB form) and ``vector_index.py:131`` (search is
always the fast path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._core import _t, query


@query("knn_blocked_batch")  # rows-only: BLAS accumulation order ≠ fold
def q_knn_blocked_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact batch kNN through the blocked scale path: per-partition
    NumPy matmul + local top-k inside ``mapInPandas``, global window
    over only ``partitions × k`` candidates per query — the shuffle is
    bounded by ``partitions × k × |queries|``, never by corpus size.
    Same winner sets as ``knn_batch`` (the fold-exact window form);
    parity pinned in tests/test_knn.py."""
    from multimodal_vector_db_spark.operators.knn import knn_join_blocked

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("id"), "embedding")
    queries_df = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = knn_join_blocked(corpus, queries_df, k=5)
    return out.select(
        "query_id",
        "id",
        F.round("sim", 6).alias("sim"),
        F.col("rank").cast("long").alias("rank"),
    )


@query("ivf_blocked_knn")  # rows-only: engine KMeans + BLAS scores
def q_ivf_blocked_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN through the blocked serving path: driver-side BLAS probe
    ranking, corpus scan statically pruned to probed clusters, one BLAS
    call per (Arrow batch × cluster) emitting local top-k only. The
    100 TB serving shape of ``ann_ivf_knn`` (same quantizer: MLlib
    KMeans, 8 clusters, seed 42, nprobe=2). Recall vs the joined form
    pinned in tests/test_ann.py."""
    from multimodal_vector_db_spark.operators.ann import (
        ivf_assign,
        ivf_fit,
        ivf_search_blocked,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("id"), "embedding")
    centroids = ivf_fit(corpus, n_clusters=8)
    assigned = ivf_assign(corpus, centroids)
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 10).collect()
    ]
    out = ivf_search_blocked(assigned, qs, centroids, k=5, nprobe=2)
    return out.select(
        "query_id", "id", F.round("sim", 6).alias("sim")
    )
