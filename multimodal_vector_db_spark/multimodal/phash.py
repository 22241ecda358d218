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


def banded_hamming_pairs(
    hashes: DataFrame,
    total_bits: int,
    n_bands: int,
    max_hamming: int = 1,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """``(doc_a, doc_b, hamming)`` for pairs within ``max_hamming``
    bits of each other. Candidates come from an exact-match join on
    ``n_bands`` bit-slices — by pigeonhole every pair with
    ``hamming < n_bands`` agrees on at least one slice, so the join is
    complete and there is never an all-pairs stage; the verify step is
    one ``bit_count(xor)`` per candidate."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming {max_hamming} needs more than {max_hamming} "
            f"bands (have {n_bands}) for a complete banded join"
        )
    width = -(-total_bits // n_bands)  # ceil
    banded = hashes.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_k"),
                        (
                            F.shiftright(hash_col, k * width)
                            .bitwiseAND(F.lit((1 << width) - 1))
                        ).alias("band_v"),
                    )
                    for k in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "h", "band.band_k", "band.band_v")
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
            F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)


def band_slices(
    hashes: DataFrame,
    total_bits: int,
    n_bands: int,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Explode each hash into its ``n_bands`` bit-slices:
    ``(id, h, band_k, band_v)`` — the persistable fingerprint-index
    layout (write it bucketed on ``(band_k, band_v)`` so history joins
    shuffle-free, the `minhash_band_index` pattern)."""
    width = -(-total_bits // n_bands)
    return hashes.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_k"),
                        (
                            F.shiftright(hash_col, k * width)
                            .bitwiseAND(F.lit((1 << width) - 1))
                        ).alias("band_v"),
                    )
                    for k in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "h", "band.band_k", "band.band_v")


def incremental_near_dup_images(
    batch_hashes: DataFrame,
    index: DataFrame,
    total_bits: int = 56,
    n_bands: int = N_BANDS,
    max_hamming: int = 1,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Dedup an ingest batch against a PERSISTED fingerprint index
    (``band_slices`` layout) without touching historical media:
    ``(batch_id, hist_id, hamming)`` for every batch image within
    ``max_hamming`` of a history image. The corpus-refresh shape for
    the image modality — history cost is one band-key join against a
    ~16 B/row index, media bytes never re-read or re-decoded."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming {max_hamming} needs more than {max_hamming} "
            f"bands (have {n_bands}) for a complete banded join"
        )
    b = band_slices(
        batch_hashes, total_bits, n_bands, id_col=id_col, hash_col=hash_col
    ).alias("b")
    ix = index.alias("ix")
    return (
        b.join(
            ix,
            on=[
                F.col("b.band_k") == F.col("ix.band_k"),
                F.col("b.band_v") == F.col("ix.band_v"),
            ],
        )
        .select(
            F.col("b.id").alias("batch_id"),
            F.col("ix.id").alias("hist_id"),
            F.bit_count(F.col("b.h").bitwiseXOR(F.col("ix.h")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def near_dup_image_pairs(
    hashes: DataFrame,
    max_hamming: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """dHash56 instantiation of :func:`banded_hamming_pairs`
    (4 × 14-bit bands)."""
    return banded_hamming_pairs(
        hashes,
        total_bits=DHASH_ROWS * (DHASH_COLS - 1),
        n_bands=N_BANDS,
        max_hamming=max_hamming,
        id_col=id_col,
        hash_col="dhash",
    )


# ---------------------------------------------------------------------------
# Audio fingerprint: windowed-energy contour over REAL decoded PCM WAV
# ---------------------------------------------------------------------------

#: 64 samples → 16 windows of 4 → 15 energy-comparison bits
AFP_WINDOWS = 16
AFP_WINDOW_LEN = 4


def audio_fingerprint15(x: np.ndarray) -> int:
    """float64 mono samples in [-1, 1] (the `decode_wav` contract) →
    15-bit energy-contour fingerprint. Energies are computed on the
    exact int16 grid (``x * 32768`` round-trips exactly), so the
    fingerprint is integer-exact and replayable in SQL."""
    s = np.rint(np.asarray(x) * 32768.0).astype(np.int64)
    n = AFP_WINDOWS * AFP_WINDOW_LEN
    if len(s) < n:
        s = np.pad(s, (0, n - len(s)))
    e = (s[:n].reshape(AFP_WINDOWS, AFP_WINDOW_LEN) ** 2).sum(axis=1)
    fp = 0
    for b in range(AFP_WINDOWS - 1):
        if e[b + 1] > e[b]:
            fp |= 1 << b
    return fp


def audio_fingerprints(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Decode PCM WAV from a binary column (real codec) and emit
    ``(id_col, afp)`` in one Arrow-batched pass."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("afp", T.LongType()),
        ]
    )

    def batches(it):
        import pandas as pd

        from multimodal_vector_db_spark.multimodal.codecs import decode_wav

        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "afp": pdf[content_col].map(
                        lambda b: audio_fingerprint15(decode_wav(bytes(b))[1])
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, out_schema)


# ---------------------------------------------------------------------------
# Video temporal signature: block-sum contour over REAL decoded Y4M luma
# ---------------------------------------------------------------------------

#: 4 frames of 4×4 luma → 4 2×2-block sums per frame → 16 values →
#: 15 contour bits
VTS_FRAMES = 4
VTS_DIM = 4


def video_signature15(frames: np.ndarray) -> int:
    """(N, 4, 4) uint8 luma frames (the `decode_y4m` contract) →
    15-bit spatio-temporal contour: per frame the four 2×2 block sums
    (row-major), concatenated over frames, then consecutive-greater
    bits. Integer-exact."""
    vals = []
    for f in range(min(len(frames), VTS_FRAMES)):
        fr = frames[f].astype(np.int64)
        for br in range(2):
            for bc in range(2):
                vals.append(
                    int(
                        fr[
                            2 * br : 2 * br + 2, 2 * bc : 2 * bc + 2
                        ].sum()
                    )
                )
    while len(vals) < VTS_FRAMES * 4:
        vals.append(0)
    fp = 0
    for b in range(VTS_FRAMES * 4 - 1):
        if vals[b + 1] > vals[b]:
            fp |= 1 << b
    return fp


def video_signatures(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Decode Y4M video from a binary column (real codec) and emit
    ``(id_col, vts)`` in one Arrow-batched pass."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("vts", T.LongType()),
        ]
    )

    def batches(it):
        import pandas as pd

        from multimodal_vector_db_spark.multimodal.codecs import decode_y4m

        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "vts": pdf[content_col].map(
                        lambda b: video_signature15(decode_y4m(bytes(b))[1])
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, out_schema)
