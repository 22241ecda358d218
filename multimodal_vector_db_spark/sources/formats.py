"""Interchange formats beyond parquet: JSONL and ORC round-trips.

The reference ingests CSV caption/annotation files and a directory
scan (``build_image_index.py:31-48``, ``build_audio_index.py:28-45``;
S1-S3 in SURVEY §2.1, covered by ``sources/corpus.py``). A
training-data pipeline additionally exchanges corpora as JSONL (the
lingua franca of web-scale text dumps) and columnar ORC — both are
first-class Spark datasources, so these wrappers only pin the
conventions that keep round-trips lossless and scans prunable:

- **explicit schemas on read** — schema inference is a full extra pass
  over the data at 100 TB and can silently widen types between dumps;
- **JSONL written uncompressed-splittable or as many files** — a
  single giant gzip JSONL is one task forever; the writer here simply
  inherits the DataFrame's partitioning (one file per partition);
- **ORC keeps predicate pushdown** (same scan pruning contract as
  parquet; asserted in ``tests/test_formats.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: canonical documents-table schema (TESTDATA.md)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a corpus as JSON-lines, one file per partition."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """Read JSON-lines with an explicit schema (no inference pass).

    Without ``schema`` Spark would scan the data once just to infer —
    at scale always pass the schema (or sample one file first)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ORC (columnar, with min/max stripe statistics — the same
    scan-pruning contract as parquet)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
