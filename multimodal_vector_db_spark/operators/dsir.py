"""DSIR — Data Selection via Importance Resampling (Xie et al.,
arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
distribution looks like a TARGET corpus, the standard way a 100 TB
pretraining pipeline up-weights "quality" domains (the reference has
no curation tier at all; this extends the engine's corpus-ops family).

Shape of the computation — all relational, fully oracle-checkable:

1. **Featurize**: unigrams + word bigrams, hashed into ``n_buckets``
   via the oracle-portable salted-md5 basis (``functions.sketch.
   md5_u32`` — DuckDB replays it with the instr() nibble decode).
2. **Fit** two hashed bag-of-ngrams models as plain aggregations:
   bucket counts over the target and raw corpora (+1 smoothing).
   The model is ``n_buckets`` rows — broadcast, never shuffled.
3. **Score**: per raw document, the log importance weight
   ``λ(x) = Σ_b c_b(x) · [ln p_target(b) − ln p_raw(b)]``.
4. **Resample**: Gumbel top-k on ``λ`` (sampling ∝ exp(λ) without
   replacement — Efraimidis-Spirakis/Gumbel trick) with the noise
   derived from a salted md5 of the id, so the selected set is a PURE
   FUNCTION of (corpus, target, salts, k) — reproducible across
   engines, re-runs, and re-shards.

Scale: the corpus is touched twice (featurize target, featurize+score
raw), each pass a map-side explode + a map-combinable groupBy on
either the bucket key (≤ n_buckets groups) or the doc id. The only
broadcast is the 2×n_buckets model. Top-k is TakeOrdered — no global
sort. Nothing here is quadratic and no step shuffles document text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.sketch import HASH_RANGE, md5_u32
from multimodal_vector_db_spark.functions.text import (
    tokens,
    word_bigrams_all,
)

#: feature-hash salt (oracle twin: md5('dsir:' || gram))
NGRAM_SALT = "dsir:"
#: Gumbel-noise salt (oracle twin: md5('dsirg:' || id))
GUMBEL_SALT = "dsirg:"


def hashed_ngram_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    hash_impl: str = "md5",
) -> DataFrame:
    """``(id, bucket)`` — one row per unigram/bigram INSTANCE
    (duplicates kept: DSIR counts occurrences, not the distinct set),
    bucketed by a salted hash. ``hash_impl="md5"`` is the
    oracle-portable basis (DuckDB replays it); ``"xxhash64"`` is the
    production basis — JVM-native, no hex-string materialization, same
    pipeline and plan shape (the same convention as the MinHash
    family). Map-side only."""
    toks = tokens(F.col(text_col))
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.concat(toks, word_bigrams_all(toks))).alias("gram"),
    )
    if hash_impl == "xxhash64":
        bucket = F.pmod(
            F.xxhash64(F.lit(NGRAM_SALT), F.col("gram")), F.lit(n_buckets)
        )
    else:
        bucket = md5_u32(F.col("gram"), NGRAM_SALT) % n_buckets
    return grams.select("id", bucket.alias("bucket"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    hash_impl: str = "md5",
) -> DataFrame:
    """Per raw-document DSIR log importance weight:
    ``(id, n_ngrams, log_weight)``.

    ``log_weight = Σ_b c_b(doc) · [ln((t_b+1)/(T+B)) −
    ln((r_b+1)/(R+B))]`` — add-one-smoothed hashed-ngram likelihood
    ratio between the target and raw corpora. Documents with no
    n-grams get weight 0 (a ratio of identical empty products)."""
    spark = raw.sparkSession
    t_cnt = (
        hashed_ngram_buckets(target, text_col, id_col, n_buckets, hash_impl)
        .groupBy("bucket")
        .agg(F.count("*").alias("t_cnt"))
    )
    raw_b = hashed_ngram_buckets(raw, text_col, id_col, n_buckets, hash_impl)
    r_cnt = raw_b.groupBy("bucket").agg(F.count("*").alias("r_cnt"))
    dense = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(t_cnt, "bucket", "left")
        .join(r_cnt, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
    )
    # totals via an unpartitioned window — the table is n_buckets rows
    w = Window.partitionBy()
    model = dense.select(
        "bucket",
        (
            F.log((F.col("t_cnt") + 1).cast("double")
                  / (F.sum("t_cnt").over(w) + n_buckets).cast("double"))
            - F.log((F.col("r_cnt") + 1).cast("double")
                    / (F.sum("r_cnt").over(w) + n_buckets).cast("double"))
        ).alias("lr"),
    )
    scored = (
        raw_b.join(F.broadcast(model), "bucket")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum("lr").alias("log_weight"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def gumbel_key(log_weight: Column, id_col: Column) -> Column:
    """``log_weight + Gumbel(0,1)`` with the noise a pure function of
    the id: ``g = −ln(−ln(u))``, ``u = (md5_u32(id)+0.5)/2^32`` —
    strictly inside (0,1), so the key is always finite. Top-k on this
    key samples ∝ exp(log_weight) without replacement (the Gumbel-max
    trick)."""
    u = (md5_u32(id_col.cast("string"), GUMBEL_SALT).cast("double")
         + F.lit(0.5)) / F.lit(float(HASH_RANGE))
    return log_weight + (-F.log(-F.log(u)))


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    hash_impl: str = "md5",
) -> DataFrame:
    """The full DSIR selection: ``(id, n_ngrams, log_weight, rank)``
    for the k documents sampled ∝ exp(log importance weight).

    Keys are rounded to 6dp before ranking (ties → lower id) so the
    selected set hash-matches across engines despite last-ulp libm
    differences in ln(). ``orderBy().limit(k)`` plans as TakeOrdered —
    per-partition k then one driver merge, no corpus shuffle; the rank
    window runs over the k survivors only."""
    weights = dsir_log_weights(
        raw, target, text_col, id_col, n_buckets, hash_impl
    )
    keyed = weights.withColumn(
        "key", F.round(gumbel_key(F.col("log_weight"), F.col("id")), 6)
    )
    top = keyed.orderBy(F.col("key").desc(), F.col("id").asc()).limit(k)
    w = Window.partitionBy().orderBy(F.col("key").desc(), F.col("id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "id",
        "n_ngrams",
        F.round("log_weight", 6).alias("log_weight"),
        F.col("rank").cast("long").alias("rank"),
    )
