"""Weighted sampling without replacement via priority sampling
(Duffield, Lund & Thorup, JACM 2007).

A training-data pipeline samples documents proportionally to a quality
or length weight. Priority sampling assigns each item the priority
``q_i = w_i / u_i`` with ``u_i`` uniform in (0, 1], then keeps the k
largest priorities — inclusion probability ≈ proportional to weight,
and the scheme admits unbiased subset-sum estimators.

Determinism contract (the whole point of this implementation):
``u_i`` comes from a salted md5 of the item id, so the sample is a
PURE FUNCTION of (ids, weights, salt, k) — re-runs, engine changes and
cluster re-shards produce the same sample (same property as the
`hash_split` query). The priority is computed as ONE IEEE division of
two exactly-representable integers, ``(w * 2^32) / (h + 1)`` — no
transcendental functions (the textbook ``w / u = w / (h/2^32)`` is the
same value; exponential-jump formulations need pow()/ln(), which are
libm-dependent and would break cross-engine hash-matching).

At scale this is a TakeOrdered(k): per-partition k-largest then a
single merge on the driver — no shuffle of the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.sketch import HASH_RANGE, md5_u32


def priority(weight: Column, id_col: Column, salt: str = "ps:") -> Column:
    """q = (w * 2^32) / (h + 1) with h = md5_u32(salt || id) — exact
    integer numerator and denominator (w * 2^32 < 2^53 for w < 2^21),
    one IEEE division, deterministic across engines."""
    h = md5_u32(id_col.cast("string"), salt)
    return (weight.cast("long") * F.lit(HASH_RANGE)).cast("double") / (
        h + F.lit(1)
    ).cast("double")


def priority_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int = 100,
    salt: str = "ps:",
) -> DataFrame:
    """Keep the k rows with the largest priorities (weight-proportional
    sample without replacement). Ties broken by id for full determinism.
    Zero/negative weights get priority 0 and are never sampled before
    any positive-weight row."""
    q = F.when(
        F.col(weight_col) > 0,
        priority(F.col(weight_col), F.col(id_col), salt),
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("_priority", q)
        .orderBy(F.col("_priority").desc(), F.col(id_col))
        .limit(k)
        .drop("_priority")
    )


def stratified_exact_sample(
    df: DataFrame,
    stratum_col: str,
    k_per_stratum: int,
    id_col: str,
    salt: str = "strat:",
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by salted
    md5 order of the id — the exact-count counterpart of Bernoulli
    `sampleBy` (which only hits the target fraction in expectation, a
    real problem for small strata / eval-set carve-outs).

    Deterministic: the sample is a pure function of (ids, stratum,
    salt, k) — reproducible across engines and re-shards, like
    `hash_split`. One shuffle on the stratum key for the row_number
    window; at 100 TB prefer a higher-cardinality stratum or pre-
    aggregate, since a single giant stratum serializes through one
    window partition (salt the window key and take k from the merged
    per-salt heads if that bites).
    """
    from pyspark.sql import Window

    h = md5_u32(F.col(id_col).cast("string"), salt)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k_per_stratum)
        .drop("_rn")
    )
