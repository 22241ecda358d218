"""Round-12 optimization equivalence pins.

Each rewritten kernel (fused-cast dot family, bit-count SimHash folds,
staged-intersection Jaccard, single-diff _sq_dist) must produce
BIT-IDENTICAL results to the pre-optimization reference form — these
tests keep the reference forms alive as executable specifications so a
future "optimization" cannot silently change values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.text import (
    simhash_from_token_hashes,
    token_hash16,
    tokens,
)
from multimodal_vector_db_spark.functions.vector import (
    dot,
    l2_distance,
    l2_norm,
    to_double_array,
)

_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox jumps over the lazy cat",
    "x",
    "",
    "a a a a a b b b c",
]


def _vec_df(spark, n=64, rows=40):
    return spark.range(rows).select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda j: (
                (F.pmod(F.xxhash64(F.col("id"), j), F.lit(2001)) - 1000)
                / 1000.0
            ).cast("float"),
        ).alias("a"),
        F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda j: (
                (F.pmod(F.xxhash64(F.col("id"), j, F.lit(7)), F.lit(2001)) - 1000)
                / 1000.0
            ).cast("float"),
        ).alias("b"),
    )


def _dot_reference(a, b):
    # the pre-round-12 form: two staged double arrays, zip_with, fold
    return F.aggregate(
        F.zip_with(
            to_double_array(a), to_double_array(b), lambda x, y: x * y
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def test_dot_bitwise_matches_staged_double_array_form(spark):
    df = _vec_df(spark)
    n_diff = df.select(
        (dot(F.col("a"), F.col("b")) != _dot_reference(F.col("a"), F.col("b")))
        .alias("d")
    ).where(F.col("d")).count()
    assert n_diff == 0


def test_l2_norm_and_distance_bitwise_match_reference(spark):
    df = _vec_df(spark)
    ref_norm = F.sqrt(
        F.aggregate(
            to_double_array(F.col("a")), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    ref_dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                to_double_array(F.col("a")),
                to_double_array(F.col("b")),
                lambda x, y: x - y,
            ),
            F.lit(0.0),
            lambda acc, d: acc + d * d,
        )
    )
    n_diff = df.select(
        (
            (l2_norm(F.col("a")) != ref_norm)
            | (l2_distance(F.col("a"), F.col("b")) != ref_dist)
        ).alias("d")
    ).where(F.col("d")).count()
    assert n_diff == 0


def test_sq_dist_bitwise_matches_dot_of_diff_form(spark):
    from multimodal_vector_db_spark.operators.quantization import _sq_dist

    df = _vec_df(spark)

    def ref(a, b):
        diff = F.zip_with(
            a, b, lambda x, y: x.cast("double") - y.cast("double")
        )
        return _dot_reference(diff, diff)

    n_diff = df.select(
        (
            _sq_dist(F.col("a"), F.col("b"))
            != ref(F.col("a"), F.col("b"))
        ).alias("d")
    ).where(F.col("d")).count()
    assert n_diff == 0


def test_simhash_bitcount_folds_match_vote_reference(spark):
    """The round-12 ones-count majority (2·ones > n) must equal the
    ±1-vote fold it replaced, bit for bit, including empty token lists."""

    def simhash_votes_reference(hv, bits=16):
        def voter(shift):
            return lambda acc, x: acc + F.when(
                F.shiftright(x, shift) % 2 == 1, F.lit(1)
            ).otherwise(F.lit(-1))

        out = F.lit(0).cast("long")
        for b in range(bits):
            shift = bits - 1 - b
            votes = F.aggregate(hv, F.lit(0).cast("long"), voter(shift))
            out = out + F.when(votes > 0, F.lit(2**shift)).otherwise(
                F.lit(0)
            ).cast("long")
        return out

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id long, text string"
    )
    hv = docs.select(
        "doc_id",
        F.transform(tokens(F.lower(F.col("text"))), token_hash16).alias("hv"),
    )
    n_diff = hv.select(
        (
            simhash_from_token_hashes(F.col("hv"), 16)
            != simhash_votes_reference(F.col("hv"), 16)
        ).alias("d")
    ).where(F.col("d")).count()
    assert n_diff == 0


def test_minhash_verify_jaccard_matches_array_union_form(spark):
    """|a|+|b|−|inter| (the staged round-12 denominator) must equal
    size(array_union) for the distinct shingle arrays the verify join
    produces — including the empty-array (null jaccard) case."""
    from multimodal_vector_db_spark.functions.text import jaccard
    from multimodal_vector_db_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS * 3)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_candidates(docs, num_hashes=8, bands=4)
    from multimodal_vector_db_spark.operators.dedup import _staged_shingles

    sh = _staged_shingles(docs, "text", "doc_id", 2)
    ref = (
        pairs.select("id_a", "id_b", "jaccard")
        .join(sh.withColumnRenamed("doc_id", "id_a"), on="id_a")
        .withColumnRenamed("shingles", "sa")
        .join(sh.withColumnRenamed("doc_id", "id_b"), on="id_b")
        .withColumnRenamed("shingles", "sb")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            jaccard(F.col("sa"), F.col("sb")).alias("ref_jaccard"),
        )
    )
    bad = ref.where(
        ~(
            (F.col("jaccard") == F.col("ref_jaccard"))
            | (F.col("jaccard").isNull() & F.col("ref_jaccard").isNull())
        )
    ).count()
    assert bad == 0
    assert pairs.count() > 0  # the fixture must actually exercise pairs
