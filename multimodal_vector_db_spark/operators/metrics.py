"""IR evaluation metrics as Column expressions over (retrieved, relevant)
ranking rows — the engine's equivalent of ``src/utils/metrics.py``.

Input model: one row per query with ``retrieved ARRAY<LONG>`` (ordered by
rank) and ``relevant ARRAY<LONG>`` (ground truth) — exactly the shape of
``recall_at_k(retrieved, relevant, k)`` etc. in the reference
(``metrics.py:30-166``).

Determinism: every ordered metric (AP, NDCG) is a *sequential
left-to-right fold over the retrieved array* (``F.aggregate`` over
``sequence(1, n)``), not an exploded aggregation — so the float
accumulation order is fixed and reproducible in any engine with ordered
list folds. Outputs are rounded to 6 decimals as part of the declared
query (the only place cross-engine libm differences could surface is
``log2`` inside NDCG).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions._cache import cached_expr


@cached_expr
def _rank_seq(n: Column) -> Column:
    """``[1..n]``, or the EMPTY array when ``n <= 0``.

    ``F.sequence(1, 0)`` yields the *descending* ``[1, 0]`` — so a bare
    ``sequence(1, size(retrieved))`` over an empty ``retrieved`` makes the
    fold call ``element_at(retrieved, 1)`` and throw INVALID_ARRAY_INDEX
    instead of returning the documented 0.0. Folding over an empty array
    returns the zero accumulator, which is exactly the empty-input
    contract of AP / NDCG / RR.
    """
    return F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )


@cached_expr
def recall_at_k(retrieved: Column, relevant: Column, k: int) -> Column:
    """``|top_k ∩ relevant| / |relevant|``; 0.0 if relevant empty
    (``metrics.py:30-53``)."""
    hits = F.size(F.array_intersect(F.slice(retrieved, 1, k), relevant))
    return F.coalesce(
        F.try_divide(hits.cast("double"), F.size(relevant).cast("double")),
        F.lit(0.0),
    )


@cached_expr
def precision_at_k(retrieved: Column, relevant: Column, k: int) -> Column:
    """``|top_k ∩ relevant| / k``; 0.0 if k=0 (``metrics.py:55-78``)."""
    if k == 0:
        return F.lit(0.0)
    hits = F.size(F.array_intersect(F.slice(retrieved, 1, k), relevant))
    return hits.cast("double") / F.lit(float(k))


@cached_expr
def average_precision(retrieved: Column, relevant: Column) -> Column:
    """AP (``metrics.py:80-110``): at each relevant hit at rank r,
    precision = hits_so_far / r; AP = sum / |relevant|; 0 if empty.

    Sequential fold with a (hits, sum) struct accumulator.
    """
    n = F.size(retrieved)
    folded = F.aggregate(
        _rank_seq(n),
        F.struct(
            F.lit(0).cast("int").alias("hits"), F.lit(0.0).alias("s")
        ),
        lambda acc, i: F.struct(
            (
                acc["hits"]
                + F.when(
                    F.array_contains(relevant, F.element_at(retrieved, i)), 1
                ).otherwise(0)
            ).alias("hits"),
            (
                acc["s"]
                + F.when(
                    F.array_contains(relevant, F.element_at(retrieved, i)),
                    (
                        acc["hits"]
                        + F.lit(1)
                    ).cast("double")
                    / i.cast("double"),
                ).otherwise(0.0)
            ).alias("s"),
        ),
    )
    return F.coalesce(
        F.try_divide(folded["s"], F.size(relevant).cast("double")), F.lit(0.0)
    )


@cached_expr
def ndcg_at_k(retrieved: Column, relevant: Column, k: int) -> Column:
    """NDCG@k (``metrics.py:135-166``): binary relevance,
    DCG = Σ_{i≤k, hit} 1/log2(i+1); IDCG over min(k, |relevant|) ideal
    ranks; 0 if IDCG = 0."""
    dcg = F.aggregate(
        _rank_seq(F.least(F.size(retrieved), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc
        + F.when(
            F.array_contains(relevant, F.element_at(retrieved, i)),
            F.lit(1.0) / F.log2(i.cast("double") + 1.0),
        ).otherwise(0.0),
    )
    ideal_n = F.least(F.lit(k), F.size(relevant))
    idcg = F.when(ideal_n <= 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), F.greatest(ideal_n, F.lit(1))),
            F.lit(0.0),
            lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1.0),
        )
    )
    return F.coalesce(F.try_divide(dcg, idcg), F.lit(0.0))


def evaluate_rankings(
    rankings: DataFrame,
    k: int,
    retrieved_col: str = "retrieved",
    relevant_col: str = "relevant",
) -> DataFrame:
    """Per-query metric table: recall@k, precision@k, AP, NDCG@k — rounded
    to 6 decimals (declared canonical projection for oracle parity)."""
    r, rel = F.col(retrieved_col), F.col(relevant_col)
    return rankings.select(
        "query_id",
        F.round(recall_at_k(r, rel, k), 6).alias("recall"),
        F.round(precision_at_k(r, rel, k), 6).alias("precision"),
        F.round(average_precision(r, rel), 6).alias("ap"),
        F.round(ndcg_at_k(r, rel, k), 6).alias("ndcg"),
    )


def mean_average_precision(per_query: DataFrame, ap_col: str = "ap") -> DataFrame:
    """MAP (``metrics.py:112-133``): mean of AP over queries."""
    return per_query.agg(F.round(F.avg(ap_col), 6).alias("map"))


def rankings_from_knn(knn_out: DataFrame) -> DataFrame:
    """Collapse batch-kNN output (query_id, id, rank) into one
    (query_id, retrieved) row per query with rank-ordered ids."""
    return knn_out.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "id"))),
            lambda s: s["id"],
        ).alias("retrieved")
    )


@cached_expr
def reciprocal_rank(retrieved: Column, relevant: Column) -> Column:
    """RR — ``1 / rank`` of the FIRST relevant hit in ``retrieved``,
    0.0 if none. The per-query term of MRR, the standard
    single-relevant-item retrieval metric (beyond the reference's
    A5-A9 family; rounds out the IR-metric set next to AP/NDCG).
    Sequential fold, deterministic accumulation order like the rest of
    this module."""
    n = F.size(retrieved)
    first_hit = F.aggregate(
        _rank_seq(n),
        F.lit(0).cast("int"),
        lambda acc, i: F.when(acc > 0, acc).otherwise(
            F.when(
                F.array_contains(relevant, F.element_at(retrieved, i)), i
            ).otherwise(0)
        ),
    )
    return F.when(
        first_hit > 0, F.lit(1.0) / first_hit.cast("double")
    ).otherwise(F.lit(0.0))
