"""Sketch estimator properties: accuracy vs exact, mergeability (the
distributed-correctness property — partial sketches from disjoint
partitions must merge to the whole-data sketch), and sampling bias."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.sketch import (
    cms_build,
    cms_point_query,
    hll_estimate,
    hll_registers,
    kmv_estimate,
    md5_u32,
    md5_u32_hi,
)
from multimodal_vector_db_spark.functions.text import tokens
from multimodal_vector_db_spark.operators.sampling import priority_sample


@pytest.fixture(scope="module")
def toks(spark, documents):
    return documents.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    ).cache()


@pytest.fixture(scope="module")
def ids(spark):
    # sf0.001 has only ~31 distinct tokens — too few to exercise the
    # estimators, so accuracy tests use a 20k-value synthetic universe
    return spark.range(20_000).select(F.col("id").cast("string").alias("v"))


def test_kmv_within_error_bound(ids):
    est, k_used = kmv_estimate(
        ids.select(md5_u32(F.col("v")).alias("h")), k=256
    ).first()[:2]
    assert k_used == 256
    # sigma ~ 1/sqrt(k-2); allow 5 sigma
    assert abs(est - 20_000) / 20_000 < 5 / (254**0.5)


def test_kmv_exact_below_k(toks):
    """Fewer distinct values than k -> the sketch IS the exact count."""
    est, k_used = kmv_estimate(
        toks.select(md5_u32(F.col("tok")).alias("h")), k=256
    ).first()[:2]
    exact = toks.select("tok").distinct().count()
    assert exact < 256 and k_used == exact and est == float(exact)


def test_kmv_merge_equals_whole(toks):
    """k-minima of the union == k-minima of (k-minima(A) ∪ k-minima(B)):
    the property that lets each partition ship only its local sketch."""
    h = toks.select(md5_u32(F.col("tok")).alias("h"))
    a = h.where(F.col("h") % 2 == 0)
    b = h.where(F.col("h") % 2 == 1)
    part_a = a.distinct().orderBy("h").limit(64)
    part_b = b.distinct().orderBy("h").limit(64)
    merged = kmv_estimate(part_a.union(part_b), k=64).first()
    whole = kmv_estimate(h, k=64).first()
    assert merged == whole


def test_hll_within_error_bound(ids):
    regs = hll_registers(
        ids.select(
            md5_u32(F.col("v")).alias("hb"),
            md5_u32_hi(F.col("v")).alias("hr"),
        ),
        p=6,
    )
    est = hll_estimate(regs, p=6).first()["hll_est"]
    # raw HLL sigma ~ 1.04/sqrt(64) = 13%; allow 4 sigma
    assert abs(est - 20_000) / 20_000 < 4 * 1.04 / 8


def test_hll_registers_merge_by_max(toks, spark):
    h = toks.select(
        md5_u32(F.col("tok")).alias("hb"),
        md5_u32_hi(F.col("tok")).alias("hr"),
    ).cache()
    whole = hll_registers(h, p=4)
    a = hll_registers(h.where(F.col("hr") % 2 == 0), p=4)
    b = hll_registers(h.where(F.col("hr") % 2 == 1), p=4)
    merged = (
        a.union(b).groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))
    )
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0
    h.unpersist()


def test_cms_never_undercounts_and_is_tight(toks):
    exact = (
        toks.groupBy(F.col("tok").alias("term"))
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "term")
        .limit(30)
    )
    est = cms_point_query(cms_build(toks, width=512), exact.select("term"))
    rows = exact.join(
        est.withColumnRenamed("item", "term"), on="term"
    ).collect()
    n_total = toks.count()
    assert len(rows) == 30
    for r in rows:
        assert r["cms_n"] >= r["exact_n"]
        # CM guarantee: overshoot <= 2N/w with prob 1-(1/2)^d; be loose
        assert r["cms_n"] - r["exact_n"] <= 4 * n_total / 512


def test_priority_sample_deterministic_and_biased(documents):
    base = documents.select("doc_id", "n_chars")
    s1 = priority_sample(base, "n_chars", "doc_id", k=50).collect()
    s2 = priority_sample(base, "n_chars", "doc_id", k=50).collect()
    assert {r["doc_id"] for r in s1} == {r["doc_id"] for r in s2}
    sample_avg = sum(r["n_chars"] for r in s1) / len(s1)
    corpus_avg = base.agg(F.avg("n_chars")).first()[0]
    # length-weighted sampling must overrepresent long documents
    assert sample_avg > corpus_avg


def test_priority_sample_zero_weight_excluded(spark):
    df = spark.createDataFrame(
        [(i, 0 if i < 90 else 5) for i in range(100)], "id long, w long"
    )
    got = priority_sample(df, "w", "id", k=10).collect()
    assert {r["id"] for r in got} == set(range(90, 100))


def test_sliding_window_covers_each_event_twice(spark):
    from multimodal_vector_db_spark.queries import REGISTRY

    out = REGISTRY["events_sliding_window"](spark, "/root/testdata/sf0.001")
    n_events = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).count()
    assert out.agg(F.sum("n_events")).first()[0] == 2 * n_events


def test_kmv_set_ops_tracks_exact(spark):
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.functions.sketch import (
        kmv_set_ops,
        md5_u32,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    h = md5_u32(F.col("user_id").cast("string"))
    a = ev.where(F.col("event_type") == "view").select(h.alias("h"))
    b = ev.where(F.col("event_type") == "purchase").select(h.alias("h"))
    est = kmv_set_ops(a, b, k=128).first()

    ua = {r["h"] for r in a.distinct().collect()}
    ub = {r["h"] for r in b.distinct().collect()}
    exact_union = len(ua | ub)
    exact_inter = len(ua & ub)
    exact_jac = exact_inter / exact_union

    # k=128 → σ ≈ 9% for the union; Jaccard/intersection compound two
    # estimators, allow a generous envelope
    assert abs(est["union_est"] - exact_union) <= 0.35 * exact_union
    assert abs(est["jaccard_est"] - exact_jac) <= 0.3
    assert abs(est["intersect_est"] - exact_inter) <= max(
        0.5 * exact_inter, 10
    )


def test_cms_per_source_sketches_merge_to_global(spark):
    # Count-Min is LINEAR: summing per-source sketch matrices yields
    # exactly the global sketch — the property that lets 1000 executors
    # sketch independently and merge in O(d*w)
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.functions.sketch import cms_build
    from multimodal_vector_db_spark.functions.text import tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        "source", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    global_sketch = {
        (r["row"], r["bucket"]): r["counter"]
        for r in cms_build(toks.select("tok"), width=128).collect()
    }
    # build per-source sketches with the same coordinates
    from multimodal_vector_db_spark.functions.sketch import cms_rows

    coords = toks.select(
        "source", F.explode(cms_rows(F.col("tok"), width=128)).alias("c")
    ).select("source", "c.row", "c.bucket")
    per_src = coords.groupBy("source", "row", "bucket").agg(
        F.count("*").cast("long").alias("counter")
    )
    merged = {
        (r["row"], r["bucket"]): r["m"]
        for r in per_src.groupBy("row", "bucket")
        .agg(F.sum("counter").cast("long").alias("m"))
        .collect()
    }
    assert merged == global_sketch
