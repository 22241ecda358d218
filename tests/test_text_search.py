"""BM25 lexical search and connected-components dedup clustering."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.dedup import connected_components
from multimodal_vector_db_spark.operators.text_search import bm25_rank


def test_bm25_ranks_term_dense_docs_first(spark):
    rows = [
        (1, "spark shuffle spark join spark"),
        (2, "spark join"),
        (3, "completely unrelated words here"),
        (4, "join join join join join join"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_rank(docs, ["spark"], k=10).collect()
    # only matching docs returned, highest tf first
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["score"] > out[1]["score"] > 0


def test_bm25_matches_hand_computed_score(spark):
    rows = [(1, "a b"), (2, "a a"), (3, "c d")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["score"] for r in bm25_rank(docs, ["a"], k=10).collect()}
    n, df, k1, b = 3.0, 2.0, 1.2, 0.75
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    # dl == avgdl == 2 for every doc → length norm is exactly 1
    def score(tf):
        return round(idf * (tf * (1 + k1)) / (tf + k1), 6)

    assert out == {1: score(1), 2: score(2)}


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    rows = [
        (1, "x " * 4 + "spark"),
        (2, "x " * 40 + "spark"),
    ]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    out = bm25_rank(docs, ["spark"], k=2).collect()
    assert [r["doc_id"] for r in out] == [1, 2]


def test_connected_components_chain_and_singleton(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 5-6,
    # singleton 7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_without_nodes_covers_edge_endpoints(spark):
    edges = spark.createDataFrame([(10, 3), (3, 7)], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {3: 3, 7: 3, 10: 3}
