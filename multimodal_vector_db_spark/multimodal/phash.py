"""Perceptual image hashing (dHash) + banded near-duplicate join.

Image-level near-dup dedup for multimodal corpora: decode each image,
reduce to a small grayscale grid, and take the difference hash — bit
``(r, c)`` is ``pixel[r][c+1] > pixel[r][c]``. Small pixel
perturbations flip at most a couple of bits, so near-identical images
land within a small Hamming distance while the hash is 56 bits.

Scale shape (the MinHash-LSH analogue for images): hashes are split
into ``4 × 14-bit`` bands and candidate pairs come from an exact-match
band join — by pigeonhole, any pair within Hamming distance 3 shares
at least one band, so NO all-pairs stage exists; the verify step is a
single ``bit_count(xor)`` on the candidates. Decode + hash run in one
Arrow-batched ``mapInPandas`` pass over the binary column (numpy
inside); everything after is JVM built-ins.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: dHash grid: 7 rows × 9 cols → 7×8 = 56 comparison bits (fits BIGINT)
DHASH_ROWS = 7
DHASH_COLS = 9
N_BANDS = 4
BAND_BITS = 14


def dhash56(gray: np.ndarray) -> int:
    """(H, W) uint8 grayscale → 56-bit difference hash. Images not
    already 7×9 are nearest-resized first (the standard pHash recipe)."""
    from multimodal_vector_db_spark.multimodal.codecs import resize_nearest

    if gray.ndim == 3:
        gray = gray[:, :, 0] if gray.shape[2] == 1 else gray.mean(axis=2)
    if gray.shape != (DHASH_ROWS, DHASH_COLS):
        gray = resize_nearest(
            gray[:, :, None].astype(np.uint8), DHASH_ROWS, DHASH_COLS
        )[:, :, 0]
    bits = (gray[:, 1:].astype(np.int16) > gray[:, :-1].astype(np.int16))
    h = 0
    for b, flag in enumerate(bits.reshape(-1)):
        if flag:
            h |= 1 << b
    return h


def image_dhash(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Decode netpbm images from a binary column and emit
    ``(id_col, dhash)`` — one Arrow-batched pass, real codec inside."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def batches(it):
        import pandas as pd

        from multimodal_vector_db_spark.multimodal.codecs import decode_ppm

        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "dhash": pdf[content_col].map(
                        lambda b: dhash56(decode_ppm(bytes(b)))
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, out_schema)


def near_dup_image_pairs(
    hashes: DataFrame,
    max_hamming: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """``(doc_a, doc_b, hamming)`` for pairs within ``max_hamming``
    bits. Banded exact-match join (guaranteed complete for
    ``max_hamming < N_BANDS``), then one-bit-count verify — never
    all-pairs."""
    if max_hamming >= N_BANDS:
        raise ValueError(
            f"max_hamming {max_hamming} needs > {max_hamming} bands "
            f"(have {N_BANDS}) for a complete banded join"
        )
    mask = (1 << BAND_BITS) - 1
    banded = hashes.select(
        F.col(id_col).alias("id"),
        F.col("dhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_k"),
                        (
                            F.shiftright("dhash", k * BAND_BITS)
                            .bitwiseAND(F.lit(mask))
                        ).alias("band_v"),
                    )
                    for k in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("id", "dhash", "band.band_k", "band.band_v")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_k") == F.col("b.band_k"),
                F.col("a.band_v") == F.col("b.band_v"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.bit_count(
                F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)
