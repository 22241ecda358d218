"""Chunking, inverted index, PII masking, and RRF fusion."""

from __future__ import annotations

from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.text_pipeline import (
    chunk_documents,
    inverted_index,
    mask_digits,
    pseudonymize,
)
from multimodal_vector_db_spark.operators.text_search import (
    rrf_fuse,
    with_rank,
)


def test_chunking_windows_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(25))
    docs = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = {
        r["chunk_id"]: r
        for r in chunk_documents(docs, window=20, stride=10).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert rows[0]["n_tokens"] == 20
    assert rows[0]["chunk_text"].startswith("w0 w1 ")
    # overlap: chunk 1 starts at token 10
    assert rows[1]["chunk_text"].split()[0] == "w10"
    assert rows[1]["n_tokens"] == 15
    # tail window is short, never dropped
    assert rows[2]["chunk_text"] == "w20 w21 w22 w23 w24"


def test_chunking_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(7, "a b c")], "doc_id long, text string")
    rows = chunk_documents(docs, window=20, stride=10).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_id"] == 0 and rows[0]["n_tokens"] == 3


def test_inverted_index_postings_sorted_and_df(spark):
    docs = spark.createDataFrame(
        [(3, "x y"), (1, "x z"), (2, "x y y")],
        "doc_id long, text string",
    )
    rows = {r["term"]: r for r in inverted_index(docs).collect()}
    assert rows["x"]["df"] == 3 and rows["x"]["postings"] == [1, 2, 3]
    # df counts documents, not occurrences
    assert rows["y"]["df"] == 2 and rows["y"]["postings"] == [2, 3]
    assert rows["z"]["postings"] == [1]
    assert inverted_index(docs, min_df=3).count() == 1


def test_mask_digits_and_pseudonym_stability(spark):
    df = spark.createDataFrame(
        [(1, "Customer#000000001"), (2, "Customer#000000002")],
        "k long, name string",
    )
    out = df.select(
        "k",
        mask_digits("name").alias("m"),
        pseudonymize("k", salt="s:").alias("p"),
        pseudonymize("k", salt="s:").alias("p2"),
        pseudonymize("k", salt="other:").alias("q"),
    ).collect()
    for r in out:
        assert r["m"] == "Customer##########"
        assert r["p"] == r["p2"] and len(r["p"]) == 16  # deterministic
        assert r["p"] != r["q"]  # salt changes the pseudonym
    assert out[0]["p"] != out[1]["p"]


def test_rrf_scores_and_cross_source_boost(spark):
    # doc 10 is rank 2 in both lists; doc 1/20 are rank-1 singletons.
    # RRF must put the doubly-retrieved doc first: 2/62 > 1/61.
    lex = spark.createDataFrame(
        [(1, 1), (10, 2), (3, 3)], "doc_id long, rank long"
    )
    dense = spark.createDataFrame(
        [(20, 1), (10, 2), (4, 3)], "doc_id long, rank long"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([lex, dense], k=10).collect()}
    assert out[10]["rank"] == 1 and out[10]["n_sources"] == 2
    assert abs(out[10]["rrf_score"] - round(2 / 62, 6)) < 1e-9
    assert abs(out[1]["rrf_score"] - round(1 / 61, 6)) < 1e-9
    # singleton tie (1/61) broken by doc_id asc
    assert out[1]["rank"] == 2 and out[20]["rank"] == 3


def test_with_rank_orders_and_breaks_ties(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9)], "doc_id long, score double"
    )
    got = {r["doc_id"]: r["rank"] for r in with_rank(df).collect()}
    assert got == {2: 1, 3: 2, 1: 3}


def test_ngram_jaccard_block_guard(spark):
    """The quadratic-expansion guard: a block larger than max_block_rows
    raises at plan-build time; raising the cap (or None) permits it."""
    import pytest as _pytest

    from multimodal_vector_db_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "same block", f"word{i} common tokens here") for i in range(40)],
        "doc_id long, lang string, text string",
    )
    with _pytest.raises(ValueError, match="largest 'lang' block"):
        ngram_jaccard_pairs(docs, block_col="lang", max_block_rows=10)
    with _pytest.raises(ValueError, match="all-pairs over"):
        ngram_jaccard_pairs(docs, max_block_rows=10)
    # permitted when under the cap or explicitly unbounded
    ok = ngram_jaccard_pairs(docs, block_col="lang", max_block_rows=100)
    assert ok.columns == ["id_a", "id_b", "jaccard"]
    unbounded = ngram_jaccard_pairs(docs, max_block_rows=None)
    assert unbounded.count() >= 0
