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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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


