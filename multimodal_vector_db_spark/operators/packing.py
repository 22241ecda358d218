"""Token-budget shard packing — the training-data step after curation:
lay the corpus out in a deterministic pseudo-random order and cut it
into shards of ~``budget`` tokens each (the unit a data loader streams).

Semantics: ``shard_id = floor(exclusive_prefix_sum(weight) / budget)``
over a total deterministic order. A naive formulation is a single
global cumulative window — one partition, one task, dead at scale. The
implementation here is the classic two-phase distributed prefix sum:

1. assign every row a DETERMINISTIC bucket that is monotone in the
   global order (``bucket_expr`` — e.g. a numeric prefix of the
   hash-order key), so bucket b's rows all precede bucket b+1's;
2. per-bucket running sums via a window PARTITIONED by bucket — fully
   parallel, one hash exchange;
3. per-bucket totals → exclusive offsets via a second window over only
   ``n_buckets`` rows (the one sequential step — hundreds of rows even
   on a 1000-executor cluster);
4. broadcast the offsets back and add.

Why not ``repartitionByRange`` + ``spark_partition_id``: range
partitioning samples its input to pick bounds, and the offsets branch
of the plan re-executes that exchange (column pruning makes the two
exchanges non-identical, so no ReusedExchange) with a different
sampling seed — at real data sizes the two branches could disagree on
partition ids. A bucket computed per-row from the data is identical in
every branch, every action, every retry, with no materialization
barrier needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hex_prefix_bucket(col: Column | str, n_chars: int = 2) -> Column:
    """Bucket id from the first ``n_chars`` hex digits of a fixed-width
    lowercase hex key (md5/sha): 16^n_chars buckets, uniform for
    hash-derived keys, and MONOTONE in the key's lexicographic order
    (fixed-width lowercase hex sorts identically to its numeric value)
    — exactly the contract :func:`pack_shards` needs."""
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(col, 1, n_chars), 16, 10).cast("int")


def pack_shards(
    df: DataFrame,
    weight_col: str,
    budget: int,
    order_cols: list[str],
    bucket_expr: Column | None = None,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Assign every row a shard id by cumulative ``weight_col`` budget
    over the total order given by ``order_cols``.

    ``order_cols`` must be a TOTAL order (include a unique id as the
    final key). ``bucket_expr`` must be monotone non-decreasing along
    that order (every row of bucket b sorts before every row of bucket
    b+1); defaults to :func:`hex_prefix_bucket` of the first order
    column, which is correct when that column is a fixed-width hex
    hash (the md5 shuffle-order convention used across this repo).
    """
    if bucket_expr is None:
        bucket_expr = hex_prefix_bucket(order_cols[0])
    stamped = df.withColumn("__b", bucket_expr)

    w_cum = (
        Window.partitionBy("__b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("__b")
    x = stamped.withColumn(
        "__lcum", F.sum(weight_col).over(w_cum)
    ).withColumn("__tot", F.sum(weight_col).over(w_tot))

    # exclusive prefix over per-bucket totals: n_buckets rows, one tiny
    # single-partition window — the only sequential step
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        x.select("__b", "__tot")
        .distinct()
        .withColumn("__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0)))
        .select("__b", "__off")
    )

    return (
        x.join(F.broadcast(offsets), "__b")
        .withColumn(
            shard_col,
            F.floor(
                (F.col("__off") + F.col("__lcum") - F.col(weight_col))
                / F.lit(budget)
            ).cast("long"),
        )
        .drop("__b", "__lcum", "__tot", "__off")
    )


def context_window_spans(
    docs: "DataFrame",
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """GPT-style pretraining sequence packing: concatenate every
    document in ``id_col`` order with ONE end-of-document token
    between them, split the token stream into fixed ``window``-sized
    context windows, and report per window which documents it spans —
    ``(window_id, n_docs, first_doc, last_doc, n_tokens)``. This is
    the op that turns a curated corpus into the actual training
    batches (concat-then-chunk with document-boundary accounting);
    :func:`pack_shards` is its shard-level sibling (docs → whole
    shards), this is the token-level one (docs may STRADDLE windows).

    Exact integer arithmetic end to end: per-doc whitespace token
    counts + 1 EOD each, a cumulative-offset window, and one explode
    of each doc over the windows it touches — linear, SQL-replayable.
    The last window reports its true (possibly short) token count.

    Scale shape: the one total ordering this op fundamentally needs
    (the token stream IS ordered by doc_id) runs as a DISTRIBUTED
    two-phase prefix sum since round 10 — range partition + balanced
    per-partition window + broadcast offsets, no single-partition
    exchange (see :func:`context_window_spans_from_lengths`);
    everything else is a bounded explode (a doc touches
    ⌈(ntok+1)/window⌉ windows) and a window_id groupBy with partial
    aggs. :func:`context_window_spans_sharded` remains the
    shard-SEMANTICS variant (windows never span shards — independent
    training streams), not a performance workaround."""
    from pyspark.sql import Window as W

    from multimodal_vector_db_spark.functions.text import tokens

    # clamp: size() is -1/NULL for NULL text; a doc always contributes
    # at least its EOD token, so len1 >= 1 and every span sequence is
    # ascending (len1 = 0 would make sequence(start/w, (start-1)/w)
    # run BACKWARDS at window boundaries and invent phantom spans)
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        (
            F.greatest(
                F.coalesce(
                    F.size(tokens(F.lower(F.col(text_col)))), F.lit(0)
                ),
                F.lit(0),
            )
            + 1
        )
        .cast("long")
        .alias("len1"),  # +1 = the EOD token
    )
    return context_window_spans_from_lengths(t, window)


def context_window_spans_from_lengths(
    t: "DataFrame", window: int, distributed: bool = True
) -> "DataFrame":
    """The window-span accounting core over precomputed per-doc token
    counts — ``t`` is ``(doc_id, len1)`` with ``len1 >= 1`` (the doc's
    token count INCLUDING its EOD token; the ≥1 invariant keeps every
    span sequence ascending — callers clamp). Factored out so the
    length definition is pluggable: :func:`context_window_spans` feeds
    whitespace-token counts, ``tokenized_context_windows`` feeds REAL
    subword counts from a trained tokenizer — the corpus → tokenizer →
    training-batch handoff a pretraining pipeline ships.

    **The global cumsum is distributed** (round 10, default): the
    total order over doc_id this op fundamentally needs used to run as
    ONE single-partition window — the exact bottleneck a 100 TB corpus
    dies on. It is now a two-phase prefix sum (the same move as the
    bulk-ingest id assigner): range-partition by doc_id, per-partition
    window cumsum (a BALANCED exchange), per-partition totals
    prefix-summed driver-side (one tiny collect — rows =
    #partitions), broadcast back as offsets. Output is bit-identical —
    integer sums are associative — so the DuckDB oracles hold
    unchanged; ``distributed=False`` keeps the single-window plan for
    plan-shape comparison in tests."""
    from pyspark.sql import Window as W

    if distributed:
        cum, total_tokens = _distributed_cumsum_lengths(t)
        total = cum.sparkSession.createDataFrame(
            [(int(total_tokens),)], "n long"
        )
    else:
        cum = t.withColumn(
            "end_",
            F.sum("len1").over(
                W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
            ),
        ).select(
            "doc_id",
            (F.col("end_") - F.col("len1")).alias("start_"),
            "end_",
        )
        total = cum.agg(F.max("end_").alias("n"))
    spans = cum.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.floor(F.col("start_") / window).cast("long"),
                F.floor((F.col("end_") - 1) / window).cast("long"),
            )
        ).alias("window_id"),
        "start_",
        "end_",
    )
    return (
        spans.groupBy("window_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "window_id",
            "n_docs",
            "first_doc",
            "last_doc",
            F.least(
                F.lit(window).cast("long"),
                F.col("n") - F.col("window_id") * window,
            ).alias("n_tokens"),
        )
    )


def _distributed_cumsum_lengths(
    t: "DataFrame", materialize: bool = True
) -> tuple["DataFrame", int]:
    """Two-phase exact prefix sum of ``len1`` in global doc_id order:
    returns ``((doc_id, start_, end_), total_tokens)`` with no
    single-partition exchange. Range partitioning makes each partition
    a CONTIGUOUS doc_id slice, so global position = within-partition
    window cumsum + the prefix-summed totals of the partitions before
    it (ordered by their min doc_id). The partition layout is pinned
    (persist) so the totals job and the offset join observe the same
    slices, then the result is checkpointed and the pin released —
    the same discipline as ``engine.batch_ingest_df``.

    ``materialize=False`` (plan-inspection/testing ONLY) skips the
    checkpoint — which would otherwise truncate the lineage to a
    LogicalRDD scan and hide the cumsum's own exchanges from
    ``.explain`` — and deliberately leaks the persist, because the
    returned frame's offsets are only valid against the pinned
    partition layout; the caller owns the cache's lifetime."""
    from pyspark.sql import Window as W

    src = (
        t.repartitionByRange(F.col("doc_id"))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        parts = (
            src.groupBy("__pid")
            .agg(F.sum("len1").alias("s"), F.min("doc_id").alias("lo"))
            .collect()
        )
        parts.sort(key=lambda r: r["lo"])
        running, offs = 0, []
        for r in parts:
            offs.append((int(r["__pid"]), running))
            running += int(r["s"])
        spark = src.sparkSession
        off_df = F.broadcast(
            spark.createDataFrame(offs or [(0, 0)], "__pid int, __off long")
        )
        w = (
            W.partitionBy("__pid")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        cum = (
            src.join(off_df, "__pid")
            .withColumn("end_", F.col("__off") + F.sum("len1").over(w))
            .select(
                "doc_id",
                (F.col("end_") - F.col("len1")).alias("start_"),
                "end_",
            )
        )
        if materialize:
            cum = cum.localCheckpoint(eager=True)
    finally:
        if materialize:
            src.unpersist()
    return cum, running


def context_window_spans_sharded(
    docs: "DataFrame",
    window: int,
    shard_tokens: int = 1 << 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """The PARALLEL form of :func:`context_window_spans` — the shape a
    100 TB corpus actually runs: :func:`pack_shards` first assigns
    whole documents to token-budgeted shards (its windows are already
    parallel-friendly), then each shard is an INDEPENDENT token stream
    that gets its own cumulative offsets and context windows. The one
    global cumsum of the flat form becomes a per-shard cumsum —
    ``partitionBy(shard)`` instead of a single total order, so the
    only global step left is pack_shards' own bounded shard-offset
    window over the tiny per-shard table.

    Output: ``(shard_id, window_id, n_docs, first_doc, last_doc,
    n_tokens)`` — window ids are LOCAL to the shard (shards are
    independent training streams; that is the point).

    Semantics note: per-shard streams insert a window boundary at each
    shard boundary, so windows never span shards — the standard
    behavior of sharded pretraining data (each shard is shuffled and
    consumed independently)."""
    from pyspark.sql import Window as W

    from multimodal_vector_db_spark.functions.text import tokens

    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(id_col).cast("string")).alias("ord"),
        (
            F.greatest(
                F.coalesce(
                    F.size(tokens(F.lower(F.col(text_col)))), F.lit(0)
                ),
                F.lit(0),
            )
            + 1
        )
        .cast("long")
        .alias("len1"),
    )
    sharded = pack_shards(
        t.select("doc_id", "ord", F.col("len1").alias("w")),
        "w",
        shard_tokens,
        order_cols=["ord", "doc_id"],
    ).select("doc_id", F.col("w").alias("len1"), "shard_id")
    # per-shard streams order by doc_id (the flat form's order within
    # each independent stream)
    cum = sharded.withColumn(
        "end_",
        F.sum("len1").over(
            W.partitionBy("shard_id")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    ).select(
        "shard_id",
        "doc_id",
        (F.col("end_") - F.col("len1")).alias("start_"),
        "end_",
    )
    spans = cum.select(
        "shard_id",
        "doc_id",
        F.explode(
            F.sequence(
                F.floor(F.col("start_") / window).cast("long"),
                F.floor((F.col("end_") - 1) / window).cast("long"),
            )
        ).alias("window_id"),
    )
    totals = cum.groupBy("shard_id").agg(F.max("end_").alias("n"))
    return (
        spans.groupBy("shard_id", "window_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .join(totals, "shard_id")
        .select(
            "shard_id",
            "window_id",
            "n_docs",
            "first_doc",
            "last_doc",
            F.least(
                F.lit(window).cast("long"),
                F.col("n") - F.col("window_id") * window,
            ).alias("n_tokens"),
        )
    )
