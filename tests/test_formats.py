"""JSONL / ORC interchange round-trips (sources/formats.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multimodal_vector_db_spark.sources.formats import (
    DOCUMENTS_SCHEMA,
    read_jsonl,
    read_orc,
    write_jsonl,
    write_orc,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _as_sets(df):
    return {tuple(r) for r in df.select(*sorted(df.columns)).collect()}


def test_jsonl_round_trip_lossless(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, p)
    back = read_jsonl(spark, p, DOCUMENTS_SCHEMA)
    assert back.schema == docs.select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).schema
    assert _as_sets(back) == _as_sets(docs)


def test_orc_round_trip_lossless(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "docs_orc")
    write_orc(docs, p)
    back = read_orc(spark, p)
    assert _as_sets(back) == _as_sets(docs)


def test_orc_scan_pushes_filters(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "docs_orc2")
    write_orc(docs, p)
    plan = (
        read_orc(spark, p)
        .where(F.col("lang") == "en")
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)" in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan, plan
