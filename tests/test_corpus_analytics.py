"""Semantics of the round-2 corpus-analytics operators: triangles,
bloom semi-join, stratified sampling, TF-IDF."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.graph import triangle_counts
from multimodal_vector_db_spark.operators.joins import bloom_semi_join
from multimodal_vector_db_spark.operators.sampling import (
    stratified_exact_sample,
)
from multimodal_vector_db_spark.operators.text_search import tfidf_top_terms


def test_triangle_counts_k4_and_path(spark):
    # K4 on {1,2,3,4}: C(4,3)=4 triangles, each node in exactly 3.
    # Appended path 4-5-6 adds no triangle. Edges given in mixed
    # direction + duplicates to exercise canonicalization.
    edges = spark.createDataFrame(
        [
            (1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (3, 4), (2, 4),
            (4, 5), (5, 6),
        ],
        "src long, dst long",
    )
    got = {
        r["doc_id"]: r["n_triangles"]
        for r in triangle_counts(edges).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_triangle_free(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    assert triangle_counts(edges).count() == 0


def test_bloom_semi_join_no_false_negatives(spark, lineitem):
    supp_keys = list(range(1, 8))
    small = spark.createDataFrame(
        [(k,) for k in supp_keys], "s_suppkey long"
    )
    big = lineitem.select("l_suppkey", "l_orderkey")
    kept = bloom_semi_join(
        big, small, big_key="l_suppkey", small_key="s_suppkey"
    )
    kept_keys = {r["l_suppkey"] for r in kept.select("l_suppkey").distinct().collect()}
    true_keys = {
        r["l_suppkey"]
        for r in big.where(F.col("l_suppkey").isin(supp_keys))
        .select("l_suppkey")
        .distinct()
        .collect()
    }
    # Bloom filters never drop a true member...
    assert true_keys <= kept_keys
    # ...and with m=4096 bits / 7 keys the false-positive rate is tiny:
    # the corpus has O(100) supplier keys, so expect (almost) none.
    n_universe = big.select("l_suppkey").distinct().count()
    assert len(kept_keys) - len(true_keys) <= max(2, n_universe // 20)


def test_bloom_semi_join_big_side_not_shuffled(spark, lineitem):
    small = spark.createDataFrame([(1,), (2,)], "s_suppkey long")
    kept = bloom_semi_join(
        lineitem.select("l_suppkey"), small, "l_suppkey", "s_suppkey"
    )
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # The ONLY exchanges allowed are on the 1-row build side
    # (broadcast + the single-partition agg); the big probe side must
    # be a scan with no hash-partition exchange.
    assert "hashpartitioning(l_suppkey" not in plan


def test_stratified_exact_sample_counts_and_determinism(spark, documents):
    docs = documents.select("doc_id", "lang")
    out1 = stratified_exact_sample(docs, "lang", 7, "doc_id")
    out2 = stratified_exact_sample(docs, "lang", 7, "doc_id")
    per = {
        r["lang"]: r["n"]
        for r in out1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    avail = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n_avail in avail.items():
        assert per.get(lang, 0) == min(7, n_avail)
    # pure function of (ids, stratum, salt, k)
    assert sorted(r["doc_id"] for r in out1.collect()) == sorted(
        r["doc_id"] for r in out2.collect()
    )
    # a different salt draws a different sample (overwhelmingly)
    out3 = stratified_exact_sample(docs, "lang", 7, "doc_id", salt="other:")
    assert sorted(r["doc_id"] for r in out3.collect()) != sorted(
        r["doc_id"] for r in out1.collect()
    )


def test_tfidf_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2)
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"], r["rank"])
        for r in out.collect()
    }

    def score(tf, df, n=3):
        return round(tf * (math.log((n + 1) / (df + 1)) + 1), 6)

    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    assert rows[(1, "apple")] == (2, 1, score(2, 1), 1)
    assert rows[(1, "banana")] == (1, 2, score(1, 2), 2)
    # doc 3: cherry tf=2 df=2, durian tf=1 df=1; ln(2)+1 > ... check order
    s_cherry, s_durian = score(2, 2), score(1, 1)
    want_first = "cherry" if s_cherry > s_durian else "durian"
    assert out.where(
        (F.col("doc_id") == 3) & (F.col("rank") == 1)
    ).first()["term"] == want_first
    # every doc emits at most k rows with dense ranks 1..k
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("rank").alias("mx")
    )
    for r in per_doc.collect():
        assert r["n"] == r["mx"] <= 2


def test_merge_upsert_semantics(spark):
    from multimodal_vector_db_spark.operators.upsert import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 2)],
        "id long, payload string, version long",
    )
    updates = spark.createDataFrame(
        # update id=1 (higher version), tie on id=3 (same version →
        # update wins), insert id=4
        [(1, "a2", 2), (3, "c2", 2), (4, "d", 1)],
        "id long, payload string, version long",
    )
    got = {
        r["id"]: (r["payload"], r["version"])
        for r in merge_upsert(base, updates, "id").collect()
    }
    assert got == {
        1: ("a2", 2),
        2: ("b", 1),
        3: ("c2", 2),
        4: ("d", 1),
    }


def test_merge_upsert_stale_update_ignored(spark):
    from multimodal_vector_db_spark.operators.upsert import merge_upsert

    base = spark.createDataFrame(
        [(1, "new", 5)], "id long, payload string, version long"
    )
    updates = spark.createDataFrame(
        [(1, "old", 3)], "id long, payload string, version long"
    )
    assert merge_upsert(base, updates, "id").first()["payload"] == "new"
