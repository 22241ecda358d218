"""PQ operator tests (SURVEY §2.9 Q2-Q5; reference quantization.py).

Properties checked (mirroring the reference's implicit contract):
- codes are in [0, n_codes) with one code per subspace;
- a vector that IS a codebook row encodes to its own code in every
  subspace and reconstructs exactly (recon error 0);
- compression ratio formula matches quantization.py:120-124.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.quantization import (
    _sq_dist,
    compression_ratio,
    data_derived_codebooks,
    pq_decode,
    pq_encode_codes,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pq_codebook_rows_encode_to_self(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = data_derived_codebooks(emb, n_subquantizers=4, n_codes=4)
    assert len(books) == 4 and all(len(b) == 4 for b in books)
    assert all(len(c) == 16 for b in books for c in b)

    staged = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 104)).select(
        "vec_id",
        "embedding",
        pq_encode_codes(F.col("embedding"), books).alias("codes"),
    )
    rows = {
        r["vec_id"]: r
        for r in staged.withColumn(
            "err", _sq_dist(F.col("embedding"), pq_decode(F.col("codes"), books))
        ).collect()
    }
    for vec_id, row in rows.items():
        expect = vec_id - 100
        assert row["codes"] == [expect] * 4
        assert row["err"] == 0.0


def test_pq_codes_in_range(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = data_derived_codebooks(emb, n_subquantizers=4, n_codes=4)
    out = emb.select(
        pq_encode_codes(F.col("embedding"), books).alias("codes")
    ).agg(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.max(F.size("codes")).alias("n"),
    ).first()
    assert out["lo"] >= 0 and out["hi"] < 4 and out["n"] == 4


def test_compression_ratio():
    # quantization.py:120-124 — 512-dim fp32 → 8 one-byte codes = 256×
    assert compression_ratio(512, 8) == 256.0
    assert compression_ratio(64, 4) == 64.0


def test_kmeans_codebooks_shapes_and_determinism(spark):
    # Q2 scale path: MLlib KMeans per subspace slice, pinned seed
    from multimodal_vector_db_spark.operators.quantization import (
        kmeans_codebooks,
        pq_encode_codes,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = kmeans_codebooks(emb, n_subquantizers=4, n_codes=8)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    assert all(len(c) == 16 for b in books for c in b)
    books2 = kmeans_codebooks(emb, n_subquantizers=4, n_codes=8)
    assert books == books2  # pinned seed → deterministic centroids
    out = emb.limit(50).select(
        pq_encode_codes(F.col("embedding"), books).alias("codes")
    ).agg(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).first()
    assert out["lo"] >= 0 and out["hi"] < 8


def test_adc_distance_table_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = data_derived_codebooks(emb, n_subquantizers=4, n_codes=4)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]

    from multimodal_vector_db_spark.operators.quantization import (
        adc_distance_table,
    )

    table = adc_distance_table(qvec, books)
    q = np.asarray(qvec, dtype=np.float64)
    for s, book in enumerate(books):
        qs = q[s * 16 : (s + 1) * 16]
        for c, cent in enumerate(book):
            expect = float(np.sum((qs - np.asarray(cent, dtype=np.float64)) ** 2))
            assert abs(table[s][c] - expect) < 1e-9


def test_adc_search_agrees_with_exact_on_decoded_vectors(spark):
    """ADC distance == exact squared L2 against the DECODED vector —
    the defining identity of asymmetric distance computation."""
    from multimodal_vector_db_spark.operators.quantization import (
        adc_search,
        pq_encode,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = data_derived_codebooks(emb, n_subquantizers=4, n_codes=4)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    coded = pq_encode(emb.select("vec_id", "embedding"), books)
    got = adc_search(coded, qvec, books, k=5).collect()
    assert len(got) == 5

    q = F.array(*[F.lit(float(x)) for x in qvec])
    exact = {
        r["vec_id"]: r["d"]
        for r in coded.select(
            "vec_id",
            F.round(
                _sq_dist(pq_decode(F.col("pq_codes"), books), q), 6
            ).alias("d"),
        ).collect()
    }
    for r in got:
        assert abs(r["adc_dist"] - exact[r["vec_id"]]) < 1e-5
    # and the result is the true top-5 of that decoded-distance ranking
    want = sorted(exact.items(), key=lambda kv: (kv[1], kv[0]))[:5]
    assert [r["vec_id"] for r in got] == [vid for vid, _ in want]
