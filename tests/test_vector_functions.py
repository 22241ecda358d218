"""Unit tests for the vector Column-expression library, mirroring the
reference's seeded-synthetic-vector strategy (SURVEY.md §5 layer 1,
``tests/test_vector_index.py:18-26``)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions import vector as V

RNG = np.random.default_rng(42)


def _mkdf(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, v array<float>",
    )


def test_dot_matches_numpy(spark):
    a = RNG.normal(size=16).astype(np.float32)
    b = RNG.normal(size=16).astype(np.float32)
    df = spark.createDataFrame(
        [([float(x) for x in a], [float(x) for x in b])],
        "a array<float>, b array<float>",
    )
    got = df.select(V.dot("a", "b").alias("d")).first()["d"]
    want = float(np.dot(a.astype(np.float64), b.astype(np.float64)))
    assert got == pytest.approx(want, rel=1e-12)


def test_l2_normalize_unit_norm(spark):
    vecs = RNG.normal(size=(5, 8)).astype(np.float32)
    df = _mkdf(spark, vecs)
    norms = df.select(V.l2_norm(V.l2_normalize("v")).alias("n")).collect()
    for r in norms:
        assert r["n"] == pytest.approx(1.0, abs=1e-12)


def test_l2_normalize_zero_vector_safe(spark):
    df = _mkdf(spark, [np.zeros(4, dtype=np.float32)])
    out = df.select(V.l2_normalize("v").alias("v")).first()["v"]
    assert out == [0.0, 0.0, 0.0, 0.0]


def test_cosine_self_is_one(spark):
    v = RNG.normal(size=8).astype(np.float32)
    df = _mkdf(spark, [v])
    got = df.select(V.cosine_similarity("v", "v").alias("c")).first()["c"]
    assert got == pytest.approx(1.0, abs=1e-9)


def test_distance_to_similarity_transforms(spark):
    df = spark.createDataFrame([(0.25,)], "d double")
    # vector_index.py:139-144 semantics
    row = df.select(
        V.distance_to_similarity(F.col("d"), "cosine").alias("cos"),
        V.distance_to_similarity(F.col("d"), "l2").alias("l2"),
        V.distance_to_similarity(F.col("d"), "ip").alias("ip"),
    ).first()
    assert row["cos"] == 0.75
    assert row["l2"] == 0.8
    assert row["ip"] == 0.25


def test_slice_renormalize_matryoshka(spark):
    v = RNG.normal(size=16).astype(np.float32)
    df = _mkdf(spark, [v])
    out = df.select(V.slice_renormalize("v", 4).alias("v")).first()["v"]
    want = v[:4].astype(np.float64)
    want = want / np.linalg.norm(want)
    assert out == pytest.approx(want.tolist(), rel=1e-6)
    assert math.isclose(sum(x * x for x in out), 1.0, rel_tol=1e-12)


def test_nearest_matryoshka_dim():
    assert V.nearest_matryoshka_dim(512) == 512
    assert V.nearest_matryoshka_dim(100) == 128
    assert V.nearest_matryoshka_dim(1) == 32


def test_fp16_round_trip(spark):
    v = RNG.normal(size=8).astype(np.float32)
    df = _mkdf(spark, [v])
    out = df.select(V.fp16_round_trip("v").alias("v")).first()["v"]
    want = v.astype(np.float16).astype(np.float32).tolist()
    assert out == want


def test_mean_max_attention_pool(spark):
    frames = RNG.normal(size=(3, 4)).astype(np.float32)
    df = spark.createDataFrame(
        [([list(map(float, f)) for f in frames],)],
        "frames array<array<float>>",
    )
    row = df.select(
        V.array_mean_pool(F.col("frames")).alias("mean"),
        V.array_max_pool(F.col("frames")).alias("max"),
        V.array_attention_pool(F.col("frames")).alias("attn"),
    ).first()
    f64 = frames.astype(np.float64)
    assert row["mean"] == pytest.approx(f64.mean(axis=0).tolist(), rel=1e-9)
    assert row["max"] == pytest.approx(f64.max(axis=0).tolist(), rel=1e-9)
    norms = np.linalg.norm(f64, axis=1)
    attn = (f64 * (norms / norms.sum())[:, None]).sum(axis=0)
    assert row["attn"] == pytest.approx(attn.tolist(), rel=1e-6)


def test_repetition_metrics_known_values(spark):
    from multimodal_vector_db_spark.functions.text import (
        dup_bigram_fraction,
        tokens,
        top_unigram_fraction,
    )

    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # top 'a' 3/4; bigrams [aa,aa,ab] → dup 1/3
            (2, "x y z w"),          # all unique: top 1/4, dup 0
            (3, "q"),                # single token: no bigrams → NULL
        ],
        ["id", "text"],
    )
    toks = tokens(F.col("text"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            top_unigram_fraction(toks).alias("tf"),
            dup_bigram_fraction(toks).alias("df"),
        ).collect()
    }
    assert abs(rows[1]["tf"] - 0.75) < 1e-9
    assert abs(rows[1]["df"] - (1 / 3)) < 1e-9
    assert abs(rows[2]["tf"] - 0.25) < 1e-9
    assert rows[2]["df"] == 0.0
    assert rows[3]["tf"] == 1.0
    assert rows[3]["df"] is None


def test_hash_split_is_deterministic_and_complete(spark):
    from multimodal_vector_db_spark.queries import REGISTRY

    out1 = REGISTRY["hash_split"](spark, "/root/testdata/sf0.001").collect()
    out2 = REGISTRY["hash_split"](spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert sum(r["n"] for r in out1) == n_docs
    splits = {r["split"] for r in out1}
    assert splits == {"train", "val", "test"}


def test_center_by_group_matches_relational(spark, embeddings):
    # grouped-map applyInPandas (matrix path) must agree with the pure
    # relational form: broadcast per-group means + zip_with subtract
    import numpy as np
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.operators.grouped import (
        center_embeddings_by_group,
    )

    sub = embeddings.where(F.col("vec_id") < 300)
    got = {
        r["vec_id"]: np.array(r["centered"])
        for r in center_embeddings_by_group(sub).collect()
    }

    rows = sub.select("vec_id", "label", "embedding").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            np.array(r["embedding"], dtype=np.float64)
        )
    means = {lbl: np.mean(v, axis=0) for lbl, v in by_label.items()}
    for r in rows:
        want = (
            np.array(r["embedding"], dtype=np.float64) - means[r["label"]]
        ).astype(np.float32)
        assert np.allclose(got[r["vec_id"]], want, atol=1e-6)
    # centered vectors sum to ~zero within each group
    for lbl, vecs in by_label.items():
        ids = [r["vec_id"] for r in rows if r["label"] == lbl]
        s = np.sum([got[i] for i in ids], axis=0)
        assert np.abs(s).max() < 1e-2


def test_reciprocal_rank_known_values(spark):
    """MRR's per-query term: hand-computed positions, including the
    no-hit zero case and first-position hit."""
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.operators.metrics import (
        reciprocal_rank,
    )

    df = spark.createDataFrame(
        [
            (1, [5, 6, 7], [7]),      # first hit at rank 3 -> 1/3
            (2, [5, 6, 7], [5, 7]),   # first hit at rank 1 -> 1.0
            (3, [5, 6, 7], [9]),      # no hit -> 0.0
            (4, [5, 6, 7], [6, 9]),   # first hit at rank 2 -> 0.5
        ],
        "qid long, retrieved array<long>, relevant array<long>",
    )
    got = {
        r["qid"]: r["rr"]
        for r in df.select(
            "qid",
            F.round(
                reciprocal_rank(F.col("retrieved"), F.col("relevant")), 6
            ).alias("rr"),
        ).collect()
    }
    assert got == {1: round(1 / 3, 6), 2: 1.0, 3: 0.0, 4: 0.5}


def test_ordered_metrics_empty_retrieved(spark):
    """Empty ``retrieved`` returns the documented 0.0 for AP / NDCG /
    RR instead of throwing INVALID_ARRAY_INDEX — ``sequence(1, 0)``
    yields the DESCENDING ``[1, 0]``, so an unguarded fold indexes
    element 1 of the empty array (regression for the round-6 advice)."""
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.operators.metrics import (
        average_precision,
        ndcg_at_k,
        reciprocal_rank,
    )

    df = spark.createDataFrame(
        [
            (1, [], [7]),      # empty retrieved, non-empty relevant
            (2, [], []),       # both empty
            (3, [5, 7], [7]),  # sanity: fold still works when non-empty
        ],
        "qid long, retrieved array<long>, relevant array<long>",
    )
    r, rel = F.col("retrieved"), F.col("relevant")
    got = {
        row["qid"]: (row["ap"], row["ndcg"], row["rr"])
        for row in df.select(
            "qid",
            F.round(average_precision(r, rel), 6).alias("ap"),
            F.round(ndcg_at_k(r, rel, 5), 6).alias("ndcg"),
            F.round(reciprocal_rank(r, rel), 6).alias("rr"),
        ).collect()
    }
    import math

    assert got[1] == (0.0, 0.0, 0.0)
    assert got[2] == (0.0, 0.0, 0.0)
    # hit at rank 2: AP = (1/2)/1, NDCG = (1/log2(3)) / (1/log2(2)), RR = 1/2
    assert got[3] == (0.5, round(1.0 / math.log2(3.0), 6), 0.5)
