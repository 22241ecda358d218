"""Small operator-level planning helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up if the input has fewer partitions than cores.

    Expression-heavy per-row operators (shingling, hashing, UDF decode)
    are CPU-bound: a single small parquet file arrives as ONE partition
    and would serialize on one core. At real scale inputs already have
    hundreds of splits and this is a no-op — the repartition only fires
    when the scan's parallelism is below the session default, so it
    never forces a full-data shuffle on a large, well-partitioned input.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
