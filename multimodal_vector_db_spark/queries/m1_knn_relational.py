"""kNN similarity joins + relational core/joins/set ops/windows.

Split from the original queries.py (72-450); body text unchanged.
Registration order inside this module is preserved; the package
__init__ manifest preserves inter-module order. The driver checks
the FIRST 50 registered queries — see tests/test_registry_window.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.vector import dot
from multimodal_vector_db_spark.operators.knn import (
    knn_join,
    knn_search,
    top_k_per_group,
)

from ._core import ORACLES, REGISTRY, _csv_doubles, _csv_longs, _t, query

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


# ---------------------------------------------------------------------------
# Relational operators: joins / set ops / windows (SURVEY §2.3, §2.5, §2.6)
# ---------------------------------------------------------------------------


@query(
    "captions_join",
    """
    WITH per_order AS (
      SELECT l_orderkey, list_sort(list(l_partkey)) AS partkeys,
             count(*)::BIGINT AS n_lines
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, o.o_orderstatus,
           array_to_string(p.partkeys, ',') AS partkeys,
           p.n_lines
    FROM orders o JOIN per_order p ON o.o_orderkey = p.l_orderkey
    WHERE o.o_totalprice > 50000
    """,
)
def q_captions_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: collect-list group + equi-join (the captions join,
    build_all_indices.py:54-61 — there an O(n^2) Python loop; here one
    shuffle-free broadcast-able aggregation + join)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_partkey")).alias("partkeys"),
        F.count("*").cast("long").alias("n_lines"),
    )
    return (
        orders.where(F.col("o_totalprice") > 50000)
        .join(per_order, orders.o_orderkey == per_order.l_orderkey)
        .select(
            "o_orderkey",
            "o_orderstatus",
            _csv_longs(F.col("partkeys")).alias("partkeys"),
            "n_lines",
        )
    )


@query(
    "anti_join",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM events e
      WHERE e.user_id = c.c_custkey AND e.event_type = 'error'
    )
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/P7: anti-join semantics (hard-delete of tombstoned ids,
    vector_index.py:212-222 — reference's flag is write-only; we filter
    for real)."""
    cust = _t(spark, sf_dir, "customer")
    errs = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .select(F.col("user_id").alias("c_custkey"))
    )
    return cust.join(errs, on="c_custkey", how="left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "semi_join",
    """
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join companion of J6 (EXISTS)."""
    cust = _t(spark, sf_dir, "customer")
    big = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(big, on="c_custkey", how="left_semi").select(
        "c_custkey", "c_acctbal"
    )


@query(
    "union_distinct",
    """
    SELECT n_nationkey FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      UNION
      SELECT s_nationkey AS n_nationkey FROM supplier
    ) ORDER BY n_nationkey
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/E3: union + distinct (the unified-index corpus union,
    build_cross_modal_index.py:264-271)."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    )
    return c.unionByName(s).distinct().orderBy("n_nationkey")


@query(
    "intersect_op",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: set intersection (metrics.py:48-53 id-set overlap)."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "orders_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
)
def q_orders_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: global top-k (TakeOrderedAndProject — no full sort)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "cumulative_window",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           sum(l_quantity) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS running_qty
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def q_cumulative_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: running cumulative sum (the AP precision accumulation
    window, metrics.py:98-105)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.sum("l_quantity").over(w).alias("running_qty"),
    )


@query(
    "result_overlap",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      WHERE vec_id IN (0, 1)
    ),
    ranked AS (
      SELECT q.query_id, e.vec_id AS id,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY {_DOT} DESC, e.vec_id ASC) AS rank
      FROM embeddings e, q
    ),
    top AS (SELECT query_id, id FROM ranked WHERE rank <= 20)
    SELECT count(*)::BIGINT AS n_overlap
    FROM top a JOIN top b ON a.id = b.id
    WHERE a.query_id = 0 AND b.query_id = 1
    """,
)
def q_result_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: top-20 id-set overlap between two result lists
    (benchmark_cross_modal.py:136-146)."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    top = knn_join(
        emb.select(F.col("vec_id").alias("id"), "embedding"), qs, k=20
    ).select("query_id", "id")
    a = top.where(F.col("query_id") == 0).select("id")
    b = top.where(F.col("query_id") == 1).select("id")
    return a.join(b, on="id").agg(F.count("*").cast("long").alias("n_overlap"))


# ---------------------------------------------------------------------------
