"""kNN operator tests mirroring the reference's index unit tests
(``tests/test_vector_index.py``): self-recall, filtered search, batch
shape — on seeded synthetic vectors and the driver's embeddings table."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.knn import (
    knn_join,
    knn_search,
    top_k_per_group,
)


def _corpus(spark, n=100, dim=16, seed=42):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cats = ["A" if i % 2 == 0 else "B" for i in range(n)]
    return (
        spark.createDataFrame(
            [
                (i, cats[i], [float(x) for x in vecs[i]])
                for i in range(n)
            ],
            "id long, category string, embedding array<float>",
        ),
        vecs,
    )


def test_self_recall(spark):
    """test_vector_index.py:28-40: querying with vector 0 returns id 0
    first with similarity ≈ 1."""
    df, vecs = _corpus(spark)
    top = knn_search(df, vecs[0].tolist(), k=5).collect()
    assert top[0]["id"] == 0
    assert abs(top[0]["sim"] - 1.0) < 1e-5
    assert [r["sim"] for r in top] == sorted(
        [r["sim"] for r in top], reverse=True
    )


def test_filtered_search_only_category(spark):
    """test_vector_index.py:101-119: filtered search returns only 'A'."""
    df, vecs = _corpus(spark)
    out = knn_search(
        df, vecs[1].tolist(), k=10, predicate=F.col("category") == "A"
    ).collect()
    assert len(out) == 10
    assert all(r["category"] == "A" for r in out)


def test_batch_search_shape(spark):
    """test_vector_index.py:65-77: k results per query, self-hit first."""
    df, vecs = _corpus(spark)
    queries = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(3)],
        "query_id long, q_emb array<float>",
    )
    out = knn_join(df, queries, k=4).collect()
    assert len(out) == 12
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert rows[0]["id"] == qid  # self-recall
        assert [r["rank"] for r in rows] == [1, 2, 3, 4]


def test_knn_join_matches_knn_search(spark, embeddings):
    """Batch path and single path agree on the driver's table."""
    corpus = embeddings.select(
        F.col("vec_id").alias("id"), "embedding"
    )
    qvec = embeddings.where(F.col("vec_id") == 3).first()["embedding"]
    single = knn_search(corpus, qvec, k=5).collect()
    queries = embeddings.where(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    batch = sorted(knn_join(corpus, queries, k=5).collect(), key=lambda r: r["rank"])
    assert [r["id"] for r in single] == [r["id"] for r in batch]
    assert [r["sim"] for r in single] == [r["sim"] for r in batch]


def test_top_k_per_group_ties_deterministic(spark):
    df = spark.createDataFrame(
        [("g1", 1, 5.0), ("g1", 2, 5.0), ("g1", 3, 4.0), ("g2", 4, 1.0)],
        "g string, id long, sim double",
    )
    out = top_k_per_group(df, ["g"], k=2).collect()
    got = {(r["g"], r["rank"]): r["id"] for r in out}
    # tie on sim=5.0 broken by id asc
    assert got[("g1", 1)] == 1
    assert got[("g1", 2)] == 2
    assert got[("g2", 1)] == 4


def test_knn_join_blocked_matches_exact(spark):
    # the BLAS-blocked scale path must agree with the expression path
    # (recall standard: scores differ in accumulation order only)
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.operators.knn import knn_join, knn_join_blocked

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.select(F.col("vec_id").alias("id"), "embedding").repartition(8)
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    exact = knn_join(corpus, queries, k=10)
    blocked = knn_join_blocked(corpus, queries, k=10)
    a = {(r["query_id"], r["id"]) for r in exact.collect()}
    b = {(r["query_id"], r["id"]) for r in blocked.collect()}
    recall = len(a & b) / len(a)
    assert recall >= 0.99, recall
    # per-query top-1 must agree exactly (no near-ties at rank 1)
    t1a = {r["query_id"]: r["id"] for r in exact.where(F.col("rank") == 1).collect()}
    t1b = {r["query_id"]: r["id"] for r in blocked.where(F.col("rank") == 1).collect()}
    assert t1a == t1b


def test_knn_search_blocked_matches_knn_search(spark):
    """The single-query blocked scorer (engine.search's scale path) must
    return the same winner ids as the HOF plan, sims equal to fp
    tolerance, for several query vectors."""
    from multimodal_vector_db_spark.operators.knn import (
        knn_search,
        knn_search_blocked,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.select(F.col("vec_id").alias("id"), "embedding").repartition(8)
    for qid in (0, 17, 101):
        q = [
            float(x)
            for x in emb.where(F.col("vec_id") == qid).first()["embedding"]
        ]
        hof = knn_search(corpus, q, k=10).collect()
        blk = knn_search_blocked(corpus, q, k=10).collect()
        assert [r["id"] for r in hof] == [r["id"] for r in blk]
        for a, b in zip(hof, blk):
            assert abs(a["sim"] - b["sim"]) < 1e-9


def test_knn_search_blocked_fewer_rows_than_k(spark):
    from multimodal_vector_db_spark.operators.knn import knn_search_blocked

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = (
        emb.where(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("id"), "embedding")
        .repartition(8)  # most partitions empty
    )
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    out = knn_search_blocked(corpus, q, k=10).collect()
    assert len(out) == 3
    assert out[0]["id"] == 0  # self-hit first


class TestTopkRowsHelpers:
    """The partition-then-small-sort top-k selectors must be
    bitwise-identical to the full lexsort they replaced — including
    boundary TIES resolved by ascending id."""

    def test_2d_matches_lexsort_with_ties(self):
        import numpy as np

        from multimodal_vector_db_spark.operators.knn import topk_rows_2d

        rng = np.random.default_rng(5)
        for trial in range(30):
            n, nq, k = 200, 7, 10
            # quantize scores so exact ties (incl. at the k boundary)
            # are common
            S = np.round(rng.standard_normal((n, nq)), 1)
            ids = rng.permutation(n).astype(np.int64)
            got = topk_rows_2d(S, ids, k)
            want = np.lexsort(
                (np.repeat(ids[:, None], nq, axis=1), -S), axis=0
            )[:k]
            assert np.array_equal(got, want), trial
            # ascending variant
            got_a = topk_rows_2d(S, ids, k, ascending=True)
            want_a = np.lexsort(
                (np.repeat(ids[:, None], nq, axis=1), S), axis=0
            )[:k]
            assert np.array_equal(got_a, want_a), trial

    def test_1d_matches_lexsort_with_ties(self):
        import numpy as np

        from multimodal_vector_db_spark.operators.knn import topk_rows_1d

        rng = np.random.default_rng(9)
        for trial in range(50):
            n, k = 300, 12
            s = np.round(rng.standard_normal(n), 1)
            ids = rng.permutation(n).astype(np.int64)
            assert np.array_equal(
                topk_rows_1d(s, ids, k), np.lexsort((ids, -s))[:k]
            ), trial
            assert np.array_equal(
                topk_rows_1d(s, ids, k, ascending=True),
                np.lexsort((ids, s))[:k],
            ), trial

    def test_k_exceeds_n(self):
        import numpy as np

        from multimodal_vector_db_spark.operators.knn import (
            topk_rows_1d,
            topk_rows_2d,
        )

        s = np.array([3.0, 1.0, 2.0])
        ids = np.array([7, 8, 9])
        assert list(topk_rows_1d(s, ids, 10)) == [0, 2, 1]
        S = s[:, None]
        assert topk_rows_2d(S, ids, 10).ravel().tolist() == [0, 2, 1]
