"""Declared query registry: every implemented operator from SURVEY.md §2
(plus the training-data-pipeline extensions) as a (spark, sf_dir) →
DataFrame callable with a DuckDB-oracle SQL twin.

Register with the :func:`query` decorator; ``REGISTRY`` / ``ORACLES``
feed ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.vector import dot
from multimodal_vector_db_spark.operators.knn import (
    knn_join,
    knn_search,
    top_k_per_group,
)

REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with a per-session RELATION cache — the catalog
    behavior every real engine has (guide §6: table formats keep schema
    and file manifests in metadata precisely so readers never re-derive
    them). ``spark.read.parquet(path)`` re-infers the schema from file
    footers on EVERY call (~130 ms of driver wall for a 32-file table,
    measured round 13) and re-lists the directory; inside the bench's
    timed region that is pure per-execution driver floor, paid once per
    sample per scan.

    Only PLAN metadata is reused: the returned DataFrame is an
    unexecuted scan relation, every action on it still reads the
    parquet data files in full (the noop-sink bench samples and the
    oracle runs recompute from the inputs every time — nothing about
    results or data is cached here). The cache key includes the
    directory mtime, so a rewritten table (new warehouse build, test
    fixture overwrite) misses and re-infers; entries live on the
    session object, so a stopped session's cache dies with it."""
    import os

    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    cache = getattr(spark, "_mvdb_scan_cache", None)
    if cache is None:
        cache = {}
        spark._mvdb_scan_cache = cache
    key = (path, mtime)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(path)
        cache[key] = df
    return df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return scan_parquet(spark, f"{sf_dir}/{name}.parquet")


# Final projections must emit scalars only: the driver's canonicalizer
# (pandas sort_values) crashes on list-typed cells. Array-valued results
# are serialized to one canonical CSV string, with an exactly matching
# rendering on the DuckDB side:
#   integers — Spark array_join(cast array<string>)
#              DuckDB array_to_string(xs, ',')
#   doubles  — fixed-scale DECIMAL(28,9) rendering after round(x, 9)
#              DuckDB array_to_string(list_transform(xs,
#                v -> (round(v, 9)::DECIMAL(28,9))::VARCHAR), ',')
# Both sides compute bit-identical doubles first (sequential folds), so
# the rounded fixed-scale strings agree character-for-character.


def _csv_longs(col) -> F.Column:
    """Canonical scalar serialization of an integer array column."""
    return F.array_join(col.cast("array<string>"), ",")


def _csv_doubles(col, scale: int = 9) -> F.Column:
    """Canonical scalar serialization of a double array column."""
    return F.array_join(
        F.transform(
            col,
            lambda v: F.round(v, scale)
            .cast(f"decimal(28,{scale})")
            .cast("string"),
        ),
        ",",
    )


