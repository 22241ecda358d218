"""Token-budget shard packing — the training-data step after curation:
lay the corpus out in a deterministic pseudo-random order and cut it
into shards of ~``budget`` tokens each (the unit a data loader streams).

Semantics: ``shard_id = floor(exclusive_prefix_sum(weight) / budget)``
over a total deterministic order. A naive formulation is a single
global cumulative window — one partition, one task, dead at scale. The
implementation here is the classic two-phase distributed prefix sum:

1. range-partition the rows on the order key (so partition p holds a
   contiguous slice of the global order);
2. per-partition running sums via a window PARTITIONED by the physical
   partition id — fully parallel;
3. per-partition totals → exclusive offsets via a second window over
   only ``num_partitions`` rows (the one sequential step, 32 rows here,
   1000 rows on a 1000-executor cluster — trivial);
4. broadcast the offsets back and add.

Everything stays in ONE action/lineage: the pid-stamping exchange is
planned once and its shuffle output is shared by the offset branch and
the main branch, so the (sampled, per-plan) range bounds are consistent
between them without a persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(
    df: DataFrame,
    weight_col: str,
    budget: int,
    order_cols: list[str],
    shard_col: str = "shard_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every row a shard id by cumulative ``weight_col`` budget
    over the total order given by ``order_cols``.

    ``order_cols`` must be a TOTAL order (include a unique id as the
    final key): range partitioning plus the in-partition window
    reconstruct the exact global prefix sum only when the order has no
    cross-partition ties.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    stamped = df.repartitionByRange(
        n, *[F.col(c) for c in order_cols]
    ).withColumn("__pid", F.spark_partition_id())

    w_cum = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("__pid")
    x = stamped.withColumn(
        "__lcum", F.sum(weight_col).over(w_cum)
    ).withColumn("__tot", F.sum(weight_col).over(w_tot))

    # exclusive prefix over per-partition totals: num_partitions rows,
    # one tiny single-partition window — the only sequential step
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        x.select("__pid", "__tot")
        .distinct()
        .withColumn("__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0)))
        .select("__pid", "__off")
    )

    return (
        x.join(F.broadcast(offsets), "__pid")
        .withColumn(
            shard_col,
            F.floor(
                (F.col("__off") + F.col("__lcum") - F.col(weight_col))
                / F.lit(budget)
            ).cast("long"),
        )
        .drop("__pid", "__lcum", "__tot", "__off")
    )
