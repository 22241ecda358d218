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
    # df.rdd.getNumPartitions() converts the plan to an RDD — ~35 ms of
    # driver wall per call (measured round 13), paid on every query
    # build. The count is a pure function of the immutable plan, so it
    # is computed once per DataFrame object and stashed on it (scan
    # relations are themselves cached per session — queries/_core.py
    # scan_parquet — so repeated builds of the same query skip the
    # conversion entirely).
    n = getattr(df, "_mvdb_num_partitions", None)
    if n is None:
        n = df.rdd.getNumPartitions()
        df._mvdb_num_partitions = n
    if n < target:
        return df.repartition(target)
    return df


def materialize(df: DataFrame) -> DataFrame:
    """Compute an expensive derived table ONCE and truncate its lineage
    (eager localCheckpoint), so a self-join over it reads the
    materialized result instead of re-running the whole upstream
    pipeline on both sides.

    This is the single biggest lever for the dedup family: a
    signature/shingle table referenced by both sides of a bucket
    self-join would otherwise be computed twice — and at 100 TB you
    would materialize it to the warehouse anyway (this is the in-memory
    analogue; storage spills to disk if it doesn't fit).

    Retention: each call checkpoints fresh RDD blocks; they are freed
    by the ContextCleaner once the returned DataFrame is garbage
    collected. A loop that re-invokes a materializing query (the bench
    does, per sample) therefore holds at most the live iteration's
    blocks plus whatever the cleaner hasn't swept yet — bounded in
    practice (a 16-byte/doc signature table), but callers keeping many
    returned frames alive hold their checkpoints alive too."""
    return df.localCheckpoint(eager=True)
