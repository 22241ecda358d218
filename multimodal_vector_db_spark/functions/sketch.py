"""Mergeable sketch primitives: KMV distinct-count, HyperLogLog
registers, and Count-Min heavy-hitter estimation.

These are the approximate aggregates a 100 TB pipeline runs where exact
`COUNT(DISTINCT)` / full `GROUP BY` would shuffle the whole corpus:
every sketch here reduces to an ordinary Spark aggregation whose partial
(map-side) state IS the sketch, so Catalyst's partial-aggregation pass
makes them mergeable across executors for free — no custom UDAF, no
driver-side state:

- **KMV** (k minimum values; Bar-Yossef et al. 2002): keep the k
  smallest distinct hash values; `TakeOrdered` computes the per-
  partition k-smallest and merges. Estimate `(k-1) * 2^32 / h_(k)`.
- **HyperLogLog** (Flajolet et al. 2007): register = max leading-zero
  rank per bucket; `groupBy(bucket).max(rho)` is exactly the register
  merge rule, so partial aggregation ships 2^p longs per partition.
- **Count-Min** (Cormode & Muthukrishnan 2005): d×w counter matrix via
  `groupBy(row, bucket).count()`; point estimate = min over d rows.

Everything is built on md5 nibble-slices (see `text.md5_nibbles`) so
the DuckDB oracles compute bit-identical hashes — the estimates are
DETERMINISTIC functions of the input set, hash-matched by the
correctness gate (unlike `approx_count_distinct`, whose sketch is
engine-internal). Integer arithmetic end-to-end; each final estimate is
a single IEEE division of two exactly-representable integers.

Reference parity note: the reference engine has no approximate
aggregates (SURVEY §2.4 is exact-only) — this is a scale extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^32, the range of a 32-bit md5 nibble-slice hash.
HASH_RANGE = 1 << 32


def md5_u32(col: Column, salt: str = "") -> Column:
    """Uniform 32-bit hash: first 8 hex nibbles of md5(salt || value).
    `conv` is Spark-side only; oracles use the instr() nibble decode
    (`queries._md5_nibbles_sql`) — both yield the same BIGINT."""
    s = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def md5_u32_hi(col: Column, salt: str = "") -> Column:
    """Second independent 32-bit hash: hex nibbles [8, 16) of the SAME
    md5 digest (one hash computation, two independent 32-bit slices)."""
    s = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("long")


def kmv_estimate(hashes: DataFrame, k: int = 256) -> DataFrame:
    """KMV distinct-count estimate from a one-column DataFrame of
    32-bit hashes (duplicates allowed — deduped here).

    Returns a single row ``(kmv_est double, k_used bigint)``. With
    n >= k distinct values the estimator is ``(k-1) * 2^32 / h_(k)``
    (relative σ ≈ 1/√(k-2)); with fewer the hash count is exact.

    Plan: distinct (map-side partial) → TakeOrdered(k) — the per-
    partition k-minima are the mergeable sketch state.
    """
    hcol = hashes.columns[0]
    kmin = hashes.select(F.col(hcol).alias("h")).distinct().orderBy("h").limit(k)
    return kmin.agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("h").alias("h_k"),
    ).select(
        F.when(
            F.col("k_used") < k, F.col("k_used").cast("double")
        )
        .otherwise(
            F.lit(float(k - 1) * HASH_RANGE) / F.col("h_k").cast("double")
        )
        .alias("kmv_est"),
        "k_used",
    )


def hll_rho(h: Column, width: int = 32) -> Column:
    """HLL rank: leading zeros of a `width`-bit hash, plus one.
    `length(bin(h))` = position of the highest set bit — exact string
    arithmetic, identical in Spark and DuckDB (no floating log2)."""
    return F.when(h == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(h))
    )


def hll_registers(hashes: DataFrame, p: int = 6) -> DataFrame:
    """HLL registers from a DataFrame of (bucket_hash, rank_hash):
    bucket = first hash mod 2^p, register = max rank of the second.
    Returns (bucket, max_rho) — the mergeable sketch (merge = max per
    bucket, which is exactly what partial aggregation does)."""
    b, r = hashes.columns[:2]
    m = 1 << p
    return (
        hashes.select(
            (F.col(b) % m).alias("bucket"), hll_rho(F.col(r)).alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_alpha_m2_scaled(p: int = 6) -> float:
    """The constant ``alpha_m * m^2 * 2^33`` for the raw-estimate
    formula ``est = CONST / sum_j 2^(33 - M_j)``. The harmonic sum is
    scaled by 2^33 (not 2^32) so every term is an EXACT integer even at
    the max rank rho = 33 (hash == 0 → term 2^0) — integer sums are
    order-insensitive, unlike float sums, so Spark and DuckDB agree
    bit-for-bit. Computed once in Python and inlined as the same
    literal into both the Spark plan and the DuckDB oracle."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(2 * HASH_RANGE)


def hll_estimate(registers: DataFrame, p: int = 6) -> DataFrame:
    """Raw HLL estimate from (bucket, max_rho) registers. Empty buckets
    contribute 2^33 (rho=0) to the scaled harmonic sum. No small-range
    correction (linear counting needs ln(), which is libm-dependent and
    breaks cross-engine determinism; raw HLL is exact-deterministic).

    ``pow(2.0, n)`` for n in [0, 33] is an exact double, so the cast
    to long is exact (Spark has no column-shift ``shiftleft``).

    Returns one row ``(hll_est double, n_buckets_used bigint)``.
    """
    m = 1 << p
    const = hll_alpha_m2_scaled(p)
    return registers.agg(
        F.count("*").cast("long").alias("n_buckets_used"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(33) - F.col("max_rho"))
            .cast("long")
        ).alias("s_used"),
    ).select(
        (
            F.lit(const)
            / (
                F.col("s_used")
                + (F.lit(m) - F.col("n_buckets_used"))
                * F.lit(2 * HASH_RANGE)
            ).cast("double")
        ).alias("hll_est"),
        "n_buckets_used",
    )


CMS_SALTS = ("cms0:", "cms1:", "cms2:", "cms3:")


def cms_rows(item: Column, width: int = 512) -> Column:
    """The d=(len(CMS_SALTS)) (row, bucket) coordinates of an item in
    the Count-Min matrix, as ARRAY<STRUCT<row,bucket>> ready to
    explode. One salted md5 per row — independent hash functions (see
    `text.MINHASH_SALTS` for why affine re-mixing is NOT independent)."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                (md5_u32(item, salt) % width).alias("bucket"),
            )
            for r, salt in enumerate(CMS_SALTS)
        ]
    )


def cms_build(items: DataFrame, width: int = 512) -> DataFrame:
    """Build the Count-Min counter matrix from a one-column DataFrame
    of items (with multiplicity). Returns (row, bucket, counter) —
    d×w rows max; merge across partitions/streams = counter addition,
    i.e. plain partial-aggregated SUM."""
    c = items.columns[0]
    return (
        items.select(F.explode(cms_rows(F.col(c), width)).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").cast("long").alias("counter"))
    )


def cms_point_query(
    sketch: DataFrame, candidates: DataFrame, width: int = 512
) -> DataFrame:
    """Estimate the count of each candidate item: min over the d rows
    of its counters (never under-counts; over-counts by at most the
    collision mass εN). Broadcast the candidates (small by construction)
    against the d×w sketch."""
    c = candidates.columns[0]
    coords = candidates.select(
        F.col(c).alias("item"), F.explode(cms_rows(F.col(c), width)).alias("rb")
    ).select("item", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        sketch.join(F.broadcast(coords), on=["row", "bucket"])
        .groupBy("item")
        .agg(F.min("counter").alias("cms_n"))
    )


def kmv_set_ops(
    hashes_a: DataFrame, hashes_b: DataFrame, k: int = 128
) -> DataFrame:
    """KMV sketch set algebra (Beyer et al. 2007): from the two k-min
    sketches alone, estimate |A ∪ B|, Jaccard(A, B) and |A ∩ B|.

    ``K_∪ = k smallest of (K_A ∪ K_B)`` is itself a valid KMV sketch of
    the union (mergeability — the whole point of sketching at 100 TB:
    per-partition sketches union with a TakeOrdered, never re-scanning);
    ``ρ = |K_∪ ∩ K_A ∩ K_B| / |K_∪|`` is an unbiased Jaccard estimate,
    and ``|A ∩ B| ≈ ρ · |A ∪ B|``. Exact rational ρ + one
    multiplication keep the arithmetic engine-exact.

    Returns one row: (union_est, jaccard_est, intersect_est, k_used).
    """
    ha = hashes_a.select(F.col(hashes_a.columns[0]).alias("h"))
    hb = hashes_b.select(F.col(hashes_b.columns[0]).alias("h"))
    ka = ha.distinct().orderBy("h").limit(k)
    kb = hb.distinct().orderBy("h").limit(k)
    ku = ka.unionAll(kb).distinct().orderBy("h").limit(k)
    u = ku.agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("h").alias("h_k"),
    ).select(
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise(
            F.lit(float(k - 1) * HASH_RANGE) / F.col("h_k").cast("double")
        )
        .alias("union_est"),
        "k_used",
    )
    both = ku.join(ka, "h", "left_semi").join(kb, "h", "left_semi")
    rho = both.agg(F.count("*").cast("long").alias("n_both"))
    return (
        u.crossJoin(rho)
        .select(
            F.round("union_est", 4).alias("union_est"),
            F.round(
                F.col("n_both").cast("double") / F.col("k_used"), 6
            ).alias("jaccard_est"),
            F.round(
                (F.col("n_both").cast("double") / F.col("k_used"))
                * F.col("union_est"),
                4,
            ).alias("intersect_est"),
            "k_used",
        )
    )
