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
