"""PageRank operator semantics on small hand-checked graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_pagerank_one_iteration_hand_computed(spark):
    # 1→2, 2→1, 3→1: after one iteration from uniform 1/3,
    # pr(1) = 0.05 + 0.85*(1/3 + 1/3), pr(2) = 0.05 + 0.85/3, pr(3) = 0.05
    out = {
        r["doc_id"]: r["pagerank"]
        for r in pagerank(
            _edges(spark, [(1, 2), (2, 1), (3, 1)]),
            _nodes(spark, [1, 2, 3]),
            iterations=1,
        ).collect()
    }
    assert out[1] == pytest.approx(0.05 + 0.85 * (2 / 3), abs=1e-6)
    assert out[2] == pytest.approx(0.05 + 0.85 / 3, abs=1e-6)
    assert out[3] == pytest.approx(0.05, abs=1e-6)


def test_pagerank_conserves_mass_without_dangling(spark):
    # directed 4-cycle: every node has outdeg 1 → total mass stays 1
    # and symmetry keeps every rank at 1/4 through any iteration count
    cycle = [(1, 2), (2, 3), (3, 4), (4, 1)]
    out = pagerank(
        _edges(spark, cycle), _nodes(spark, [1, 2, 3, 4]), iterations=4
    ).collect()
    for r in out:
        assert r["pagerank"] == pytest.approx(0.25, abs=1e-6)


def test_pagerank_hub_outranks_leaves(spark):
    # undirected star centered on 0: the hub must dominate
    star = []
    for leaf in (1, 2, 3, 4):
        star += [(0, leaf), (leaf, 0)]
    out = {
        r["doc_id"]: r["pagerank"]
        for r in pagerank(
            _edges(spark, star), _nodes(spark, [0, 1, 2, 3, 4]), iterations=3
        ).collect()
    }
    assert out[0] > max(out[i] for i in (1, 2, 3, 4)) * 2
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-4)


def test_quantile_filter_keeps_at_least_half_per_source(spark):
    from multimodal_vector_db_spark.queries import q_quality_quantile_filter

    kept = q_quality_quantile_filter(spark, "/root/testdata/sf0.001")
    counts = {
        r["source"]: r["kept"]
        for r in kept.groupBy("source")
        .agg(F.count("*").alias("kept"))
        .collect()
    }
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in totals.items():
        assert counts.get(src, 0) >= n // 2, (src, counts.get(src), n)
        # a threshold filter must never keep everything unless degenerate
        assert counts[src] <= n


def test_triangle_counts_match_bruteforce_random_graph(spark):
    import itertools
    import random

    from multimodal_vector_db_spark.operators.graph import triangle_counts

    rng = random.Random(42)
    n = 14
    edges = [
        (u, v) for u, v in itertools.combinations(range(n), 2)
        if rng.random() < 0.35
    ]
    adj = {i: set() for i in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1

    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "src long, dst long"
    )
    got = {
        r["doc_id"]: r["n_triangles"]
        for r in triangle_counts(df).collect()
    }
    assert got == want
