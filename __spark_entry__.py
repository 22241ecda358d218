"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship cross-modal-style kNN query at
sf0.001; ``queries()`` maps operator names (SURVEY.md §2) to
(spark, sf_dir) → DataFrame callables; ``oracle_sql()`` gives each an
exact DuckDB-runnable ANSI-SQL twin.

Determinism contract shared by every query pair:
- vector math in DOUBLE with per-element float→double cast before
  multiply and a sequential left-to-right fold (bit-identical to
  DuckDB's ``list_dot_product`` over ``DOUBLE[]``);
- every ranking uses the stable tie-breaker ``ORDER BY sim DESC, id``;
- computed columns are explicitly aliased AND explicitly cast so Spark
  and DuckDB schemas agree (BIGINT counts, DOUBLE ratios).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multimodal_vector_db_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: batch kNN similarity
    join (queries = first 5 embedding rows) over the embeddings corpus —
    the engine's defining operator (SURVEY.md §2 J3/W2)."""
    return Q.q_knn_batch(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.REGISTRY


def oracle_sql() -> dict[str, str]:
    return Q.ORACLES
