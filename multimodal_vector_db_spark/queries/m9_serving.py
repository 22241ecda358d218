"""Blocked BLAS serving paths as REGISTERED queries (round-4 verdict
task: the product hot paths — ``knn_join_blocked`` and
``ivf_search_blocked`` — were validated only by pytest parity; these
entries put them in front of the driver every round).

Round 5 upgraded both from rows-only to FULL hash checks with the
``semantic_dedup_blocked`` trick: the float64-BLAS *scores* can never
hash-match DuckDB's sequential fold (different accumulation order),
but the *winner sets and ranks* are discrete — so the queries emit
``(query_id, id, rank)`` only, and the oracle re-derives the same
ranking from the fold-exact ``list_dot_product``. On tie-free data
(these synthetic embeddings) the orders agree exactly; sim-emitting
forms of the same operators stay pinned by the parity tests in
``tests/test_knn.py`` / ``tests/test_ann.py``.

Reference anchors: ``vector_index.py:162-210`` (batch search; ours is
the shuffle-bounded 100 TB form) and ``vector_index.py:131`` (search is
always the fast path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._core import _t, query

_DOT = "list_dot_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[])"


@query(
    "knn_blocked_batch",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      WHERE vec_id < 8
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS id, {_DOT} AS sim
      FROM embeddings e, q
    ),
    ranked AS (
      SELECT query_id, id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, id ASC) AS rank
      FROM scored
    )
    SELECT query_id, id, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def q_knn_blocked_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact batch kNN through the blocked scale path: per-partition
    NumPy matmul + local top-k inside ``mapInPandas``, global window
    over only ``partitions × k`` candidates per query — the shuffle is
    bounded by ``partitions × k × |queries|``, never by corpus size.
    Discrete ``(query_id, id, rank)`` output hash-matches the
    fold-exact oracle (scores differ only in accumulation order)."""
    from multimodal_vector_db_spark.operators.knn import knn_join_blocked

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("id"), "embedding")
    queries_df = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = knn_join_blocked(corpus, queries_df, k=5)
    return out.select(
        "query_id", "id", F.col("rank").cast("long").alias("rank")
    )


@query(
    "ivf_blocked_knn",
    f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
    ),
    ac AS (  -- corpus assignment: argmax fold-dot, ties -> higher cid
      SELECT e.vec_id AS id,
             list_dot_product(e.embedding::DOUBLE[], c.cv::DOUBLE[]) AS csim,
             c.cid
      FROM embeddings e, c
    ),
    a AS (
      SELECT id, cid AS cluster_id FROM (
        SELECT id, cid,
               row_number() OVER (PARTITION BY id
                                  ORDER BY csim DESC, cid DESC) AS rn
        FROM ac
      ) WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      WHERE vec_id < 10
    ),
    p AS (  -- probed clusters: top-2 by dot desc, ties -> higher cid
      SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_dot_product(q.q_emb::DOUBLE[],
                                           c.cv::DOUBLE[]) DESC,
                          c.cid DESC) AS pr
        FROM q, c
      ) WHERE pr <= 2
    ),
    cand AS (
      SELECT q.query_id, e.vec_id AS id, {_DOT} AS sim
      FROM q
      JOIN p USING (query_id)
      JOIN a ON a.cluster_id = p.cid
      JOIN embeddings e ON e.vec_id = a.id
    ),
    ranked AS (
      SELECT query_id, id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, id ASC) AS rank
      FROM cand
    )
    SELECT query_id, id, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def q_ivf_blocked_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN through the blocked serving path: driver-side BLAS probe
    ranking, corpus scan statically pruned to probed clusters, one BLAS
    call per (Arrow batch × cluster) emitting local top-k only — the
    100 TB serving shape of ``ann_ivf_knn``.

    Quantizer here: 8 DATA-DERIVED centroids (embeddings of vec_id
    0..7 — the ``semantic_dedup`` trick), so the oracle can replay the
    ENTIRE pipeline — assignment (argmax fold-dot, ties→higher cid),
    probe ranking (top-nprobe by dot, ties→higher cid — the blocked
    prober's lexsort order), pruning, and final ranking — and the
    discrete ``(query_id, id, rank)`` output hash-matches end to end.
    The MLlib-KMeans-fit variant stays covered by ``ann_ivf_knn`` +
    the recall parity tests in tests/test_ann.py."""
    from multimodal_vector_db_spark.operators.ann import (
        ivf_assign,
        ivf_search_blocked,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("id"), "embedding")
    centroids = [
        [float(x) for x in r["embedding"]]
        for r in corpus.where(F.col("id") < 8).orderBy("id").collect()
    ]
    assigned = ivf_assign(corpus, centroids, metric="dot")
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 10).collect()
    ]
    out = ivf_search_blocked(
        assigned, qs, centroids, k=5, nprobe=2, probe_metric="dot"
    )
    # ivf_search_blocked returns (query_id, id, sim); re-rank the ≤ k
    # survivors per query (a window over k·|q| rows) to emit the
    # discrete hash-checkable form
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("id").asc()
    )
    return out.withColumn("rank", F.row_number().over(w)).select(
        "query_id", "id", F.col("rank").cast("long").alias("rank")
    )
