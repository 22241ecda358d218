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


def test_sq8_round_trip_matches_numpy(spark):
    """SQ8 codes and reconstruction agree with the straightforward
    numpy formulation of per-vector affine int8 quantization."""
    import numpy as np

    from multimodal_vector_db_spark.functions.vector import (
        sq8_decode,
        sq8_encode,
        sq8_params,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vmin, scale = sq8_params(F.col("embedding"))
    got = (
        emb.select(
            "vec_id",
            "embedding",
            sq8_encode(F.col("embedding"), vmin, scale).alias("codes"),
            sq8_decode(
                sq8_encode(F.col("embedding"), vmin, scale), vmin, scale
            ).alias("dec"),
        )
        .orderBy("vec_id")
        .collect()
    )
    assert len(got) > 0
    for r in got[:20]:
        v = np.asarray(r["embedding"], dtype=np.float64)
        lo, hi = v.min(), v.max()
        sc = (hi - lo) / 255.0
        if sc == 0:
            want = np.zeros(len(v), dtype=np.int64)
        else:
            want = np.clip(np.floor((v - lo) / sc + 0.5), 0, 255).astype(
                np.int64
            )
        assert list(want) == list(r["codes"])
        dec = lo + want * sc
        assert np.allclose(dec, np.asarray(r["dec"]), atol=0)
        # quantization error bounded by half a step per element
        assert np.abs(dec - v).max() <= sc / 2 + 1e-12


def test_sign_bits_word_matches_numpy_packing(spark):
    """Packed sign words equal the numpy bit-packing of (x > 0)."""
    import numpy as np

    from multimodal_vector_db_spark.functions.vector import sign_bits_word

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = (
        emb.select(
            "vec_id",
            sign_bits_word("embedding", 1, 32).alias("w1"),
            sign_bits_word("embedding", 33, 32).alias("w2"),
            "embedding",
        )
        .orderBy("vec_id")
        .limit(20)
        .collect()
    )
    for r in got:
        v = np.asarray(r["embedding"], dtype=np.float64)
        bits = (v > 0).astype(np.int64)
        w1 = int((bits[:32] * (1 << np.arange(32, dtype=np.int64))).sum())
        w2 = int((bits[32:64] * (1 << np.arange(32, dtype=np.int64))).sum())
        assert (r["w1"], r["w2"]) == (w1, w2)


def test_binary_hamming_recall_beats_random(spark):
    """Hamming top-10 over sign bits should overlap the exact cosine
    top-10 far above the random baseline (~10/n) — sign-bit similarity
    is a crude but real proxy for cosine on centered data."""
    from multimodal_vector_db_spark import queries as Q

    res = Q.REGISTRY["binary_hamming_knn"](spark, SF_DIR)
    exact = Q.REGISTRY["knn_batch"](spark, SF_DIR)
    ham = {(r["query_id"], r["id"]) for r in res.collect()}
    ex = {
        (r["query_id"], r["id"])
        for r in exact.collect()
        if r["query_id"] < 8
    }
    overlap = len(ham & ex) / max(len(ex), 1)
    assert overlap >= 0.2, overlap
