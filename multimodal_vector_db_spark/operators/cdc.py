"""Content-defined chunking (CDC) over text/binary-ish columns.

Fixed-shingle dedup (``operators/dedup.py``) keys on word n-grams; CDC
instead cuts each document at positions where a rolling window's hash
satisfies a mask — so chunk boundaries are a function of CONTENT, not
offset, and an insertion near the head of a document shifts only the
chunks it touches while every later chunk re-aligns and keeps its
hash. This is the storage/dedup shape used by rsync/LBFS-style systems
and by training-data pipelines to strip shared boilerplate that
appears at different offsets across pages.

Spark-first: boundary detection is a single JVM projection per row —
``filter(sequence(W, len), p -> H(substring(text, p-W+1, W)) % D = 0)``
— no explode, no Python, no shuffle until the chunk-keyed groupBy.
Cost is one hash per character position (the canonical CDC cost
model), linear in corpus bytes; the chunk-stats aggregation shuffles
on chunk key with map-side partial combine. At 100 TB there is no
all-pairs stage anywhere.

Hash basis: ``xxhash64`` for production; ``md5`` (hex-nibble decode,
`functions/text.md5_nibbles`) for oracle-checked queries so the DuckDB
twin can replay boundaries bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.text import md5_nibbles


def _window_hash(win: Column, basis: str) -> Column:
    if basis == "xxhash64":
        return F.xxhash64(win)
    if basis == "md5":
        return md5_nibbles(F.md5(win), 0)
    raise ValueError(f"unknown hash basis {basis!r}")


def chunk_array(
    text: Column,
    window: int = 16,
    divisor: int = 64,
    hash_basis: str = "xxhash64",
) -> Column:
    """ARRAY<STRING> of content-defined chunks whose concatenation is
    exactly ``text``. A boundary closes a chunk at position ``p``
    (1-based, ``p >= window``) when the hash of the trailing ``window``
    chars is ``0 (mod divisor)``; expected chunk length ~``divisor``.
    Texts shorter than ``window`` are a single chunk."""
    bounds = F.when(
        F.length(text) >= window,
        F.filter(
            F.sequence(F.lit(window), F.length(text)),
            lambda p: _window_hash(
                F.substring(text, p - (window - 1), F.lit(window)),
                hash_basis,
            )
            % divisor
            == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.concat(
        F.array(F.lit(1)), F.transform(bounds, lambda b: b + 1)
    )
    ends = F.concat(bounds, F.array(F.length(text)))
    return F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(starts)),
            lambda i: F.substring(
                text,
                F.element_at(starts, i),
                F.element_at(ends, i) - F.element_at(starts, i) + 1,
            ),
        ),
        lambda c: c != "",
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    divisor: int = 64,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """``(id_col, chunk_idx, chunk)`` — one row per chunk, ``chunk_idx``
    0-based in document order (reassembly = concat in idx order)."""
    return df.select(
        id_col,
        F.posexplode(
            chunk_array(
                F.col(text_col),
                window=window,
                divisor=divisor,
                hash_basis=hash_basis,
            )
        ).alias("chunk_idx", "chunk"),
    )


def duplicate_chunk_stats(
    chunks: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Chunks seen more than once: ``(chunk, n_docs, n_occ)``. The
    dedup-storage view of the corpus — shift-resilient, unlike
    fixed-offset shingles. ``id_col`` must match the column the chunks
    were produced with (:func:`cdc_chunks`' own ``id_col``)."""
    return (
        chunks.groupBy("chunk")
        .agg(
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occ"),
        )
        .where(F.col("n_occ") > 1)
    )


def remove_frequent_chunks(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    divisor: int = 64,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """Boilerplate removal: drop every chunk that appears in
    ``>= min_docs`` distinct documents, reassemble the survivors in
    document order → ``(id_col, cleaned)``. Docs reduced to nothing
    come back as empty strings (the caller decides whether to drop
    them). The frequent-chunk set is corpus-bounded and broadcast."""
    chunks = cdc_chunks(
        df,
        id_col=id_col,
        text_col=text_col,
        window=window,
        divisor=divisor,
        hash_basis=hash_basis,
    )
    frequent = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("chunk")
    )
    kept = chunks.join(F.broadcast(frequent), "chunk", "left_anti")
    ids = df.select(id_col).distinct()
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            "",
        ).alias("cleaned")
    )
    return ids.join(reassembled, id_col, "left").select(
        id_col, F.coalesce("cleaned", F.lit("")).alias("cleaned")
    )
