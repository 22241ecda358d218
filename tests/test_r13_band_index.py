"""Round-13: the persisted-band-index dedup path must produce EXACTLY
the in-memory pipeline's output — same candidate set (pure function of
the banded signatures), same exact-Jaccard verify values — for both
hash bases. This is the equivalence that lets the bench time the
production shape (index built at prep, like the IVF index) without
changing what the query computes."""

from __future__ import annotations

from multimodal_vector_db_spark.operators.dedup import (
    band_collision_pairs,
    minhash_band_index,
    minhash_candidates_from_band_index,
    minhash_lsh_candidates,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
    )


def test_band_index_path_matches_pipeline_xxhash(spark, documents):
    full = minhash_lsh_candidates(
        documents, num_hashes=8, bands=4, hash_impl="xxhash64"
    )
    banded = minhash_band_index(
        documents, num_hashes=8, bands=4, hash_impl="xxhash64"
    )
    via_index = minhash_candidates_from_band_index(banded, documents)
    assert _rows(via_index) == _rows(full)


def test_band_index_path_matches_pipeline_md5(spark, documents):
    full = minhash_lsh_candidates(
        documents, num_hashes=16, bands=4, hash_impl="md5"
    )
    banded = minhash_band_index(
        documents, num_hashes=16, bands=4, hash_impl="md5"
    )
    via_index = minhash_candidates_from_band_index(banded, documents)
    assert _rows(via_index) == _rows(full)


def test_band_index_bucketed_table_no_exchange(spark, documents, tmp_path):
    """Written bucketed + re-registered via DDL, the bucket-collision
    aggregation runs WITHOUT a shuffle exchange."""
    import contextlib
    import io
    import re

    banded = minhash_band_index(
        documents, num_hashes=8, bands=4, hash_impl="xxhash64"
    )
    loc = str(tmp_path / "bands")
    spark.sql("DROP TABLE IF EXISTS t_r13_bands")
    (
        banded.write.mode("overwrite")
        .bucketBy(8, "band_key")
        .option("path", loc)
        .saveAsTable("t_r13_bands")
    )
    try:
        cand = band_collision_pairs(
            spark.table("t_r13_bands").select("band_key", "doc_id")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cand.explain("formatted")
        plan = buf.getvalue()
        assert "Bucketed: true" in plan
        # exactly ONE hash exchange: the candidate-pair distinct; the
        # bucket aggregation itself reuses the bucketing
        n_hash_ex = len(re.findall(r"Arguments: hashpartitioning\(", plan))
        assert n_hash_ex == 1, plan
        # and the result still matches the unbucketed aggregation
        direct = band_collision_pairs(banded)
        assert sorted(map(tuple, cand.collect())) == sorted(
            map(tuple, direct.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_r13_bands")
