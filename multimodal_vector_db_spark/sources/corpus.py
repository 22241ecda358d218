"""Corpus builders: assemble the engine's `items` table — the Spark
analogue of the reference's build scripts (``build_cross_modal_index.py``
whole-file lifecycle: scan → embed → metadata assembly → union →
add_vectors → save).

Key semantic choices (SURVEY.md §7 Phase 2):
- id assignment is ``row_number() OVER (ORDER BY <stable key>) - 1`` —
  dense, deterministic, matching the reference's monotonic
  ``id_counter`` (``vector_index.py:94-103``) while staying
  oracle-reproducible (NOT ``monotonically_increasing_id``, which is
  partition-layout-dependent).
- every row carries ``space`` ('clap' for audio else 'clip') so the
  query layer can refuse cross-space similarity (``README.md:36``).
- ``deleted`` is a real soft-delete column honored by reads (the
  reference's tombstone is write-only — ``vector_index.py:212-222``
  sets it, nothing reads it; we fix that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from multimodal_vector_db_spark.embedders.fake import fake_embed

MODALITIES = ["image", "video", "audio", "text"]


def space_for_modality(modality_col) -> F.Column:
    """Dual-encoder space rule: audio lives in CLAP space, everything
    else in CLIP space (README.md:36, audio_embedder.py:14-17)."""
    return F.when(modality_col == "audio", F.lit("clap")).otherwise(
        F.lit("clip")
    )


def assign_dense_ids(
    df: DataFrame, order_by: list[str], id_col: str = "id"
) -> DataFrame:
    """Dense deterministic 0-based ids in stable ``order_by`` order."""
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(id_col, F.row_number().over(w) - 1)


def build_items_from_documents(
    docs: DataFrame, dim: int = 64
) -> DataFrame:
    """Build a 4-modality items corpus from the driver's documents
    table, fake-embedded per space — the hermetic stand-in for the
    reference's CLIP/CLAP build pipeline.

    Modality is derived deterministically from doc_id so the corpus has
    the unified-index shape (multiple modalities, one table, partition
    column) without real media files.
    """
    base = docs.select(
        F.col("doc_id"),
        F.col("text"),
        F.col("lang"),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ).alias("modality"),
    )
    base = base.withColumn("space", space_for_modality(F.col("modality")))
    # one embed pass per space, routed by the space column
    clip_emb = fake_embed(F.col("text"), "clip", dim)
    clap_emb = fake_embed(F.col("text"), "clap", dim)
    embedded = base.withColumn(
        "embedding",
        F.when(F.col("space") == "clap", clap_emb).otherwise(clip_emb),
    )
    out = assign_dense_ids(embedded, ["doc_id"])
    return out.select(
        "id",
        "modality",
        "space",
        "embedding",
        F.lit(dim).alias("dim"),
        F.lit(False).alias("deleted"),
        F.col("text").alias("content"),
        "lang",
        F.concat(F.lit("item_"), F.col("id").cast("string")).alias(
            "display_name"
        ),
    )


def union_corpora(*dfs: DataFrame) -> DataFrame:
    """E2: unified-index union across modality corpora
    (``build_cross_modal_index.py:264-271``) — schema-aligned union."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def active(items: DataFrame) -> DataFrame:
    """P7 honored: every read path filters tombstones."""
    return items.where(~F.col("deleted"))


def scan_media_directory(
    spark,
    path: str,
    extensions: list[str],
    modality: str,
) -> DataFrame:
    """S3 directory scan (``build_all_indices.py:109-110``: os.listdir +
    endswith filter) as the ``binaryFile`` source: one glob-filtered
    distributed scan per extension, unioned. Returns
    (path, modification_time, length, content BINARY, modality).

    At 100 TB this is the ingest scan for raw media — file listing is
    driver-side but reading is fully distributed, and the downstream
    decode/embed runs per-partition (multimodal.extract_features).
    """
    dfs = [
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*{ext}")
        .load(path)
        for ext in extensions
    ]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out.withColumn("modality", F.lit(modality))


def parse_wiki_corpus(spark, path: str) -> DataFrame:
    """S4 wiki-corpus parse (``build_text_index.py:25-57``) from raw
    files: whole-file read → split on blank-line separators → first line
    title, rest content → length filters → preview derivation. The
    driver's oracle-checked twin over the documents table is
    ``queries.py:q_string_pipeline``; this is the real file-source form.
    """
    raw = spark.read.text(path, wholetext=True)
    chunks = raw.select(
        F.explode(F.split("value", "\n\n\n")).alias("chunk")
    ).where(F.length(F.trim(F.col("chunk"))) > 0)
    parsed = chunks.select(
        F.trim(F.element_at(F.split(F.trim(F.col("chunk")), "\n", 2), 1)).alias(
            "title"
        ),
        F.trim(F.element_at(F.split(F.trim(F.col("chunk")), "\n", 2), 2)).alias(
            "content"
        ),
    )
    return parsed.where(
        (F.length("content") > 100)
        & (F.length("title") > 0)
        & (F.length("title") < 100)
    ).select(
        "title",
        "content",
        F.when(
            F.length("content") > 200,
            F.concat(F.substring("content", 1, 200), F.lit("...")),
        )
        .otherwise(F.col("content"))
        .alias("preview"),
    )
