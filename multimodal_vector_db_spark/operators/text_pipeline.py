"""Corpus-preparation operators: chunking, inverted index, PII masking.

Training-data-pipeline extensions beyond the reference's query surface
(the reference stops at embedding-level retrieval; a 100 TB corpus
pipeline also has to chunk documents for embedding, build lexical
postings, and strip identifiers before training). All pure built-in
expressions — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    window: int = 20,
    stride: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunking with overlap (the RAG/embedding
    prep step): windows of ``window`` tokens every ``stride`` tokens;
    the final window may be short. Returns
    ``(doc_id, chunk_id, n_tokens, chunk_text)``.

    Scale shape: windows are materialized *within the row* via
    ``sequence``/``transform``/``slice`` and then exploded — a narrow
    map with no shuffle at all; output partitioning inherits the scan,
    so chunk → embed pipelines stay co-partitioned by document.
    """
    toks = tokens(text_col)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.lit(0), F.size(toks) - 1),
        F.lit(stride),
    )
    chunks = F.transform(starts, lambda st: F.slice(toks, st + 1, window))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks)
    )
    return exploded.select(
        "doc_id",
        F.col("pos").cast("long").alias("chunk_id"),
        F.size("col").cast("long").alias("n_tokens"),
        F.array_join("col", " ").alias("chunk_text"),
    )


def inverted_index(
    docs: DataFrame,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed inverted-index build: one row per term with document
    frequency and the sorted postings list,
    ``(term, df, postings: array<long>)``.

    Shape: ``explode(array_distinct(tokens))`` → one hash-aggregate on
    the term — the canonical one-shuffle index build with map-side
    combine. At 100 TB the only hazard is stopword skew: the df filter
    prunes AFTER the agg, so genuinely hot terms should be handled by
    salting the groupBy (operators/joins.py:salted_join pattern) or by
    a two-level agg (term, doc_id-bucket) → term.
    """
    term_docs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    )
    agg = term_docs.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
    )
    return agg.where(F.col("df") >= min_df)


def mask_digits(col: Column | str, repl: str = "#") -> Column:
    """Replace every ASCII digit — masks ids, phone-style fields."""
    return F.regexp_replace(col, "[0-9]", repl)


def pseudonymize(col: Column | str, salt: str, length: int = 16) -> Column:
    """Deterministic salted-hash pseudonym for an identifier column:
    ``sha2(salt || value)`` truncated to ``length`` hex chars. Stable
    across runs (joins on the pseudonym still work) while unlinkable
    without the salt. Pure codegen'd expression — no shuffle, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        F.sha2(F.concat(F.lit(salt), c.cast("string")), 256), 1, length
    )
