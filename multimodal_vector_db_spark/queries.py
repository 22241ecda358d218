"""Declared query registry: every implemented operator from SURVEY.md §2
(plus the training-data-pipeline extensions) as a (spark, sf_dir) →
DataFrame callable with a DuckDB-oracle SQL twin.

Register with the :func:`query` decorator; ``REGISTRY`` / ``ORACLES``
feed ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.vector import dot
from multimodal_vector_db_spark.operators.knn import (
    knn_join,
    knn_search,
    top_k_per_group,
)

REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# kNN similarity joins (SURVEY §2.3 J2-J5, §2.5 W1/W2) — the defining ops
# ---------------------------------------------------------------------------

# DuckDB computes list_dot_product over DOUBLE[] with the same sequential
# fold as our aggregate(zip_with(...)) — bit-identical doubles, no rounding.
_DOT = "list_dot_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[])"


@query(
    "knn_single",
    f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id AS id, e.label, {_DOT} AS sim
      FROM embeddings e, q
    )
    SELECT id, label, sim FROM scored
    ORDER BY sim DESC, id ASC LIMIT 10
    """,
)
def q_knn_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/W1: single-query exact kNN, plan = scan → project(dot) →
    TakeOrderedAndProject(10). Reference: vector_index.py:107-160."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    return knn_search(
        emb.select(F.col("vec_id").alias("id"), "label", "embedding"),
        qvec,
        k=10,
    )


@query(
    "knn_batch",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS id, {_DOT} AS sim
      FROM embeddings e, q
    ),
    ranked AS (
      SELECT query_id, id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, id ASC)
               AS rank
      FROM scored
    )
    SELECT query_id, id, sim, rank::BIGINT AS rank FROM ranked WHERE rank <= 10
    """,
)
def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/W2: batch kNN similarity join — corpus ⨝ broadcast(queries) →
    per-query top-k window. Reference: vector_index.py:162-210."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = knn_join(
        emb.select(F.col("vec_id").alias("id"), "embedding"), qs, k=10
    )
    return out.select(
        "query_id", "id", "sim", F.col("rank").cast("long").alias("rank")
    )


@query(
    "knn_filtered",
    f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 7),
    scored AS (
      SELECT e.vec_id AS id, e.label, {_DOT} AS sim
      FROM embeddings e, q
      WHERE e.label = 3
    )
    SELECT id, label, sim FROM scored ORDER BY sim DESC, id ASC LIMIT 5
    """,
)
def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P4: predicate-filtered kNN — the filter applies BEFORE ranking
    (no k×10 over-fetch needed, unlike vector_index.py:129,153-158)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 7).select("embedding").first()[0]
    return knn_search(
        emb.select(F.col("vec_id").alias("id"), "label", "embedding"),
        qvec,
        k=5,
        predicate=F.col("label") == 3,
    )


# ---------------------------------------------------------------------------
# Relational core over the TPC-H-ish tables (SURVEY §2.2/2.4/2.5/2.6)
# ---------------------------------------------------------------------------


@query(
    "groupby_count",
    """
    SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
    FROM documents GROUP BY lang
    """,
)
def q_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: group-count by modality analogue (search_cross_modal.py:40-43)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "topk_per_group",
    """
    SELECT lang, doc_id, n_chars, rank FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC)::BIGINT AS rank
      FROM documents
    ) WHERE rank <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: top-k within each group (per-modality display,
    search_cross_modal.py:57-83)."""
    docs = _t(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    out = top_k_per_group(
        docs, ["lang"], k=3, order_col="n_chars", tie_col="doc_id"
    )
    return out.select("lang", "doc_id", "n_chars", F.col("rank").cast("long").alias("rank"))


@query(
    "filter_project",
    """
    SELECT l_orderkey, l_partkey, l_quantity,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity > 40
    ORDER BY l_orderkey, l_partkey, l_quantity
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P8: predicate filter + projection, pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 40))
        .select(
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("net_price"),
        )
        .orderBy("l_orderkey", "l_partkey", "l_quantity")
    )
