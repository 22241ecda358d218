"""Graph operators over similarity/link edges: PageRank, triangles.

Complements ``dedup.connected_components`` (cluster membership) with a
node-importance score — the standard corpus-curation signal for
picking the canonical document inside a near-dup cluster and for
link-graph quality weighting (Page et al. 1999; used by public
pipelines for seed-domain weighting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.util import materialize


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-iteration PageRank:
    ``pr'(v) = (1-d)/N + d · Σ_{u→v} pr(u)/outdeg(u)``
    (dangling nodes contribute nothing — the common sparse-graph
    simplification). ``edges`` is directed ``(src, dst)``; pass both
    directions for an undirected similarity graph.

    Returns ``(id_col, pagerank)`` with pagerank rounded to 6 decimals
    on output only (intermediates stay full-precision).

    Scale shape: per iteration one join rank⋈edges (both sides hash-
    partitioned on the src key — co-partitioned after the first
    iteration, so AQE reuses the exchange) + one groupBy(dst) sum.
    Edges and out-degrees are computed once and materialized; each
    iteration's rank is materialized too, keeping lineage O(1) instead
    of O(iterations) and preventing recompute of the (expensive)
    pair-generation upstream. Fixed iteration count — no driver-side
    convergence collect needed; at 100 TB run until ‖Δpr‖ via a cheap
    1-row agg per iteration if convergence gating is wanted.
    """
    n = nodes.count()
    nodes_only = materialize(nodes.select(F.col(id_col).alias("id")))
    e = materialize(
        edges.select(F.col("src").alias("src"), F.col("dst").alias("dst"))
    )
    deg = materialize(
        e.groupBy("src").agg(F.count("*").cast("double").alias("outdeg"))
    )
    base = F.lit((1.0 - damping) / n)
    ranks = nodes_only.select("id", F.lit(1.0 / n).alias("pr"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("pr") / F.col("outdeg")).alias("c"),
            )
        )
        summed = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = materialize(
            nodes_only.join(summed, "id", "left").select(
                "id",
                (base + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias("pr"),
            )
        )
    return ranks.select(
        F.col("id").alias(id_col), F.round("pr", 6).alias("pagerank")
    )


def triangle_counts(edges: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal (spam farms and template-generated near-dup
    clusters are triangle-dense; organic link neighborhoods are not).

    ``edges`` is ``(src, dst)`` in either or both directions; edges are
    canonicalized to ``a < b`` and deduplicated first. Each triangle
    {a < b < c} is enumerated exactly once as wedge (a-b, a-c) closed
    by edge (b-c), then credited to all three corners.

    Scale shape: the wedge self-join and the closing join are both
    equi-joins on the lower node id — two hash shuffles of the edge
    list, no cross join. The intermediate wedge set is Σ_v C(deg_v, 2);
    for power-law graphs orient edges from low- to high-degree nodes
    first (swap the canonical order for a (degree, id) order) to bound
    it — the triangle SET is identical under any total order, so the
    oracle's id-order enumeration still matches. Returns
    ``(id_col, n_triangles)`` for nodes in ≥1 triangle.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = materialize(e)
    wedge = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.a") == F.col("y.a"))
        .where(F.col("x.b") < F.col("y.b"))
        .select(
            F.col("x.a").alias("u"),
            F.col("x.b").alias("v"),
            F.col("y.b").alias("w"),
        )
    )
    tri = wedge.join(
        e, (F.col("v") == F.col("a")) & (F.col("w") == F.col("b"))
    ).select("u", "v", "w")
    corners = tri.select(
        F.explode(F.array("u", "v", "w")).alias(id_col)
    )
    return corners.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_triangles")
    )
