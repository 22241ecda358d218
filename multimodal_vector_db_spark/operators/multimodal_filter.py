"""Cross-modal consistency filtering (the LAION/DataComp "CLIP score"
gate): embed both sides of every (content, caption) pair, keep pairs
whose cosine clears a threshold.

The real-model form runs the CLIP text/image towers (environment-gated
in ``embedders/real.py``); the oracle-checkable form here uses the
repo's lexical feature-hashing embedder (``functions/text.py``) for
both sides, which preserves exactly what the operator must get right
at scale: a corpus-sized embed pass that stays in whole-stage codegen,
a key-partitioned pair join (never all-pairs), one bit-exact dot per
pair, and a threshold filter.

Scale shape: embeds are explode + (id, bucket) groupBy + dense-map
assembly — linear with map-side combine (the 20×-faster staging of the
HOF form, measured in m8); the pair join shuffles on the pair key
only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.vector import dot, l2_normalize


def bucket_ids(toks: Column, dim: int = 64) -> Column:
    """md5-prefix feature-hash bucket per token → ARRAY<BIGINT>
    (the `hashing_buckets` rule, over an arbitrary token array)."""
    return F.transform(
        toks,
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
            F.lit(dim),
        ),
    )


def hashing_tf_vectors(
    df: DataFrame,
    buckets_col: str,
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """L2-normalized hashing-TF vectors for the whole corpus:
    ``(id_col, v ARRAY<DOUBLE>)``. Explode → codegen'd groupBy count →
    dense vector from a per-doc count map (the corpus-scale staging;
    the all-HOF form re-hashes per lambda step — measured 20× slower
    on a whole-corpus embed)."""
    counts = (
        df.select(id_col, F.explode(buckets_col).alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count("*").alias("cnt"))
    )
    maps = counts.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("b", "cnt"))).alias("m")
    )
    tf = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("m"), i.cast("long")).cast("double"),
            F.lit(0.0),
        ),
    )
    return (
        df.select(id_col)
        .join(maps, id_col, "left")
        .select(
            id_col,
            F.coalesce(tf, F.array_repeat(F.lit(0.0), dim)).alias("tf"),
        )
        .select(id_col, l2_normalize(F.col("tf")).alias("v"))
    )


def clip_score_filter(
    pairs: DataFrame,
    text_vectors: DataFrame,
    image_vectors: DataFrame,
    threshold: float,
    text_key: str = "doc_id",
    image_key: str = "partner_id",
) -> DataFrame:
    """Join each pair to its two embeddings, score with the bit-exact
    dot, keep/flag by threshold: ``(doc_id, partner_id, clip_score,
    kept)``. ``clip_score`` is rounded to 6 dp (the float canon) and
    ``kept`` derives from the ROUNDED value so the decision replays in
    any engine."""
    t = text_vectors.select(
        F.col("id").alias(text_key), F.col("v").alias("tv")
    )
    i = image_vectors.select(
        F.col("id").alias(image_key), F.col("v").alias("iv")
    )
    scored = pairs.join(t, text_key).join(i, image_key)
    sc = F.round(dot("tv", "iv"), 6)
    return scored.select(
        text_key,
        image_key,
        sc.alias("clip_score"),
        F.when(sc >= threshold, 1).otherwise(0).alias("kept"),
    )
