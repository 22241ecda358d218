"""pack_shards: two-phase distributed prefix sum (operators/packing.py).

Contract: shard assignment equals the single-window global formulation,
and is invariant to bucket granularity (the prefix sum is
bucket-agnostic by construction, given a monotone bucket expression).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.packing import (
    hex_prefix_bucket,
    pack_shards,
)

SF_DIR = "/root/testdata/sf0.001"


def _staged(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
        F.size(F.split("text", r"\s+")).cast("long").alias("w"),
    )


def _single_window(df, budget):
    w = Window.orderBy("ord", "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return df.withColumn(
        "shard_id",
        F.floor(F.coalesce(F.sum("w").over(w), F.lit(0)) / budget).cast(
            "long"
        ),
    )


def test_pack_shards_equals_global_window(spark):
    staged = _staged(spark)
    got = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(
            staged, "w", 5000, order_cols=["ord", "doc_id"]
        ).collect()
    }
    want = {
        r["doc_id"]: r["shard_id"]
        for r in _single_window(staged, 5000).collect()
    }
    assert got == want
    assert len(set(want.values())) > 1  # budget actually splits


def test_pack_shards_bucket_granularity_invariant(spark):
    staged = _staged(spark)
    a = pack_shards(
        staged,
        "w",
        5000,
        order_cols=["ord", "doc_id"],
        bucket_expr=hex_prefix_bucket("ord", 1),
    )
    b = pack_shards(
        staged,
        "w",
        5000,
        order_cols=["ord", "doc_id"],
        bucket_expr=hex_prefix_bucket("ord", 3),
    )
    ra = {r["doc_id"]: r["shard_id"] for r in a.collect()}
    rb = {r["doc_id"]: r["shard_id"] for r in b.collect()}
    assert ra == rb


def test_hex_prefix_bucket_is_monotone_in_key_order(spark):
    staged = _staged(spark).withColumn("b", hex_prefix_bucket("ord", 2))
    rows = staged.select("ord", "b").orderBy("ord").collect()
    bs = [r["b"] for r in rows]
    assert bs == sorted(bs)
    assert len(set(bs)) > 10  # actually spreads


def test_context_window_spans_invariants(spark):
    """Concat-with-EOD → fixed-window split: windows are contiguous
    from 0, token counts sum to the exact stream length, every doc
    appears in ≥1 window, and long docs straddle window boundaries."""
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.operators.packing import (
        context_window_spans,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c"),                      # 3 + EOD = 4
            (1, " ".join(["w"] * 13)),         # 13 + 1 = 14 (straddles)
            (2, "x y"),                        # 3
            (3, " ".join(["z"] * 7)),          # 8
        ],
        "doc_id long, text string",
    )
    out = sorted(
        context_window_spans(docs, window=8).collect(),
        key=lambda r: r["window_id"],
    )
    total = 4 + 14 + 3 + 8  # 29 tokens incl. EODs
    assert [r["window_id"] for r in out] == list(range((total + 7) // 8))
    assert sum(r["n_tokens"] for r in out) == total
    assert out[-1]["n_tokens"] == total - 8 * (len(out) - 1)
    # doc 1 (tokens 4..17) straddles windows 0..2
    spans1 = [r for r in out if r["first_doc"] <= 1 <= r["last_doc"]]
    assert [r["window_id"] for r in spans1] == [0, 1, 2]
    # every doc covered
    covered = set()
    for r in out:
        covered.update(range(r["first_doc"], r["last_doc"] + 1))
    assert covered == {0, 1, 2, 3}


def test_context_window_spans_sharded_parallel_form(spark):
    """The sharded (parallel) form: token counts conserve per shard,
    windows are local and contiguous per shard, and every doc lands in
    exactly one shard's stream."""
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.operators.packing import (
        context_window_spans_sharded,
    )

    from pyspark.sql import functions as FF

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).where(FF.col("doc_id") < 300)  # deterministic subset (limit isn't)
    out = context_window_spans_sharded(
        docs, window=64, shard_tokens=2000
    ).collect()
    assert len(out) > 1
    shards = {}
    for r in out:
        shards.setdefault(r["shard_id"], []).append(r)
    assert len(shards) > 1  # the budget actually cut shards
    total_tokens = 0
    for sid, rows in shards.items():
        rows = sorted(rows, key=lambda r: r["window_id"])
        assert [r["window_id"] for r in rows] == list(range(len(rows)))
        assert all(r["n_tokens"] == 64 for r in rows[:-1])
        assert 1 <= rows[-1]["n_tokens"] <= 64
        total_tokens += sum(r["n_tokens"] for r in rows)
    # conservation: sum over all shards == sum over docs of (ntok + 1)
    from multimodal_vector_db_spark.functions.text import tokens

    want = docs.select(
        (F.size(tokens(F.lower("text"))) + 1).cast("long").alias("l")
    ).agg(F.sum("l")).first()[0]
    assert total_tokens == want


def test_context_window_spans_from_lengths_pluggable_core(spark):
    """The lengths-based core (tokenized_context_windows' engine):
    explicit per-doc lengths — including the len1=1 empty-doc floor —
    produce conserved totals, straddle accounting, and a short last
    window."""
    from multimodal_vector_db_spark.operators.packing import (
        context_window_spans_from_lengths,
    )

    # doc 0: 5 tokens, doc 1: empty (EOD only), doc 2: 9, doc 3: 3
    t = spark.createDataFrame(
        [(0, 5), (1, 1), (2, 9), (3, 3)], "doc_id long, len1 long"
    )
    rows = sorted(
        context_window_spans_from_lengths(t, window=8).collect(),
        key=lambda r: r["window_id"],
    )
    # stream = 18 tokens -> windows [0,8) [8,16) [16,18)
    assert [r["window_id"] for r in rows] == [0, 1, 2]
    assert sum(r["n_tokens"] for r in rows) == 18
    assert rows[-1]["n_tokens"] == 2
    # doc 2 spans offsets [6,15): straddles windows 0 and 1
    assert rows[0]["last_doc"] == 2 and rows[1]["first_doc"] == 2
    # empty doc 1 sits wholly in window 0
    assert rows[0]["n_docs"] == 3


def test_context_window_spans_distributed_cumsum_parity(spark):
    """Round 10: the default (distributed two-phase prefix sum) core
    must return bit-identical rows to the single-partition window form
    — and its physical plan must contain NO SinglePartition exchange
    (the 100 TB bottleneck the rewrite removes)."""
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.operators.packing import (
        context_window_spans_from_lengths,
    )

    t = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37 + 1).cast("long").alias("len1"),
    )
    dist = context_window_spans_from_lengths(t, window=64)
    single = context_window_spans_from_lengths(
        t, window=64, distributed=False
    )
    key = lambda r: r["window_id"]  # noqa: E731
    assert sorted(dist.collect(), key=key) == sorted(
        single.collect(), key=key
    )
    # plan guard on the PRE-checkpoint cumsum (the checkpoint truncates
    # lineage to a LogicalRDD scan, which would hide the cumsum's own
    # exchanges and make this assertion vacuous): the distributed form
    # must plan NO SinglePartition exchange where the single-window
    # form plans exactly one
    from multimodal_vector_db_spark.operators.packing import (
        _distributed_cumsum_lengths,
    )

    cum, _total = _distributed_cumsum_lengths(t, materialize=False)
    plan = cum._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    from pyspark.sql import Window as W
    from pyspark.sql import functions as FN

    single_cum = t.withColumn(
        "end_",
        FN.sum("len1").over(
            W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    sp = single_cum._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in sp  # the bottleneck the rewrite removed
    spark.catalog.clearCache()  # release materialize=False's pinned src
