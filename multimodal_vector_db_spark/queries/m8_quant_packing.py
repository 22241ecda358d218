"""Quantized storage tiers, training-order layout, TPC-H join breadth.

Split from the original queries.py (5223-6813); body text unchanged.
Registration order inside this module is preserved; the package
__init__ manifest preserves inter-module order. The driver checks
the FIRST 50 registered queries — see tests/test_registry_window.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.vector import dot
from multimodal_vector_db_spark.operators.knn import (
    knn_join,
    knn_search,
    top_k_per_group,
)

from ._core import ORACLES, REGISTRY, _csv_doubles, _csv_longs, _t, query
from .m1_knn_relational import _DOT
from .m2_text_dedup import _TOKS, _md5_nibbles_sql

# Quantized storage tiers beyond the reference's fp16 (SURVEY §2.9):
# SQ8 affine int8 (4×) and binary sign-bit packing (32×) with Hamming
# search — the standard vector-DB compression ladder, all JVM-side.
# ---------------------------------------------------------------------------


@query(
    "sq8_round_trip",
    """
    WITH d AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    m AS (
      SELECT vec_id, e, list_min(e) AS vmin,
             (list_max(e) - list_min(e)) / 255.0 AS scale
      FROM d
    ),
    c AS (
      SELECT vec_id, e, vmin, scale,
        list_transform(e, x -> CASE WHEN scale = 0 THEN 0::BIGINT
          ELSE least(greatest(floor((x - vmin) / scale + 0.5), 0), 255)::BIGINT
          END) AS codes
      FROM m
    ),
    y AS (
      SELECT vec_id, e, codes,
        list_transform(codes, cd -> vmin + cd * scale) AS dec
      FROM c
    ),
    z AS (
      SELECT vec_id, codes,
        list_transform(dec, (v, i) -> v - e[i]) AS err, e
      FROM y
    )
    SELECT vec_id,
           array_to_string(list_transform(codes, cd -> cd::VARCHAR), ',')
             AS sq8_codes,
           round(sqrt(list_dot_product(err, err) / len(e)), 6) AS rmse
    FROM z
    """,
)
def q_sq8_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar quantization round-trip: per-vector affine int8 codes
    (4× storage vs fp32 — one tier below the reference's 2× fp16,
    vector_index.py:79-91) plus the reconstruction RMSE. Every step is
    a codegen'd expression — floor-based rounding and sequential-fold
    error norms keep it bit-identical to the DuckDB oracle."""
    from multimodal_vector_db_spark.functions.vector import (
        dot as vdot,
        sq8_decode,
        sq8_encode,
        sq8_params,
        to_double_array,
    )

    emb = _t(spark, sf_dir, "embeddings")
    e = to_double_array(F.col("embedding"))
    vmin, scale = sq8_params(F.col("embedding"))
    staged = emb.select(
        "vec_id",
        e.alias("e"),
        sq8_encode(F.col("embedding"), vmin, scale).alias("codes"),
        sq8_decode(
            sq8_encode(F.col("embedding"), vmin, scale), vmin, scale
        ).alias("dec"),
    )
    erred = staged.select(
        "vec_id",
        "codes",
        F.zip_with(F.col("dec"), F.col("e"), lambda v, x: v - x).alias("err"),
    )
    return erred.select(
        "vec_id",
        _csv_longs(F.col("codes")).alias("sq8_codes"),
        F.round(
            F.sqrt(vdot("err", "err") / F.size("err")), 6
        ).alias("rmse"),
    )


@query(
    "binary_hamming_knn",
    """
    WITH w AS (
      SELECT vec_id,
        list_sum(list_transform(embedding[1:32],
          (x, i) -> CASE WHEN x > 0 THEN 2**(i-1) ELSE 0 END))::BIGINT AS w1,
        list_sum(list_transform(embedding[33:64],
          (x, i) -> CASE WHEN x > 0 THEN 2**(i-1) ELSE 0 END))::BIGINT AS w2
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, w1 AS q1, w2 AS q2 FROM w WHERE vec_id < 8
    ),
    s AS (
      SELECT q.query_id, w.vec_id AS id,
             (bit_count(xor(w.w1, q.q1))
              + bit_count(xor(w.w2, q.q2)))::BIGINT AS hamming
      FROM w, q
    ),
    r AS (
      SELECT query_id, id, hamming,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hamming ASC, id ASC) AS rank
      FROM s
    )
    SELECT query_id, id, hamming, rank::BIGINT AS rank
    FROM r WHERE rank <= 10
    """,
)
def q_binary_hamming_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized kNN: sign bits packed into two BIGINT words
    (32× storage compression), Hamming distance = popcount(xor) — the
    coarsest tier of the vector-DB compression ladder, and the cheapest
    possible scan at 100 TB: the 'vector' is 16 bytes and the distance
    is two integer instructions, no float math at all."""
    from multimodal_vector_db_spark.functions.vector import sign_bits_word

    emb = _t(spark, sf_dir, "embeddings")
    words = emb.select(
        "vec_id",
        sign_bits_word("embedding", 1, 32).alias("w1"),
        sign_bits_word("embedding", 33, 32).alias("w2"),
    )
    qs = words.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("w1").alias("q1"),
        F.col("w2").alias("q2"),
    )
    scored = (
        words.select(F.col("vec_id").alias("id"), "w1", "w2")
        .crossJoin(F.broadcast(qs))
        .select(
            "query_id",
            "id",
            (
                F.bit_count(F.col("w1").bitwiseXOR(F.col("q1")))
                + F.bit_count(F.col("w2").bitwiseXOR(F.col("q2")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    out = top_k_per_group(
        scored, ["query_id"], 10, order_col="hamming", ascending=True
    )
    return out.select(
        "query_id", "id", "hamming", F.col("rank").cast("long").alias("rank")
    )


@query(
    "binary_rerank_knn",
    f"""
    WITH w AS (
      SELECT vec_id, embedding,
        list_sum(list_transform(embedding[1:32],
          (x, i) -> CASE WHEN x > 0 THEN 2**(i-1) ELSE 0 END))::BIGINT AS w1,
        list_sum(list_transform(embedding[33:64],
          (x, i) -> CASE WHEN x > 0 THEN 2**(i-1) ELSE 0 END))::BIGINT AS w2
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS q_emb, w1 AS q1, w2 AS q2
      FROM w WHERE vec_id < 8
    ),
    h AS (
      SELECT q.query_id, w.vec_id AS id, w.embedding, q.q_emb,
             (bit_count(xor(w.w1, q.q1))
              + bit_count(xor(w.w2, q.q2))) AS hamming
      FROM w, q
    ),
    shortlist AS (
      SELECT query_id, id, embedding, q_emb,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hamming ASC, id ASC) AS hrank
      FROM h
    ),
    rr AS (
      SELECT query_id, id,
             list_dot_product(embedding::DOUBLE[], q_emb::DOUBLE[]) AS sim
      FROM shortlist WHERE hrank <= 50
    ),
    ranked AS (
      SELECT query_id, id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, id ASC) AS rank
      FROM rr
    )
    SELECT query_id, id, sim, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def q_binary_rerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage search over the binary tier — the production pattern
    for sign-bit quantization: a 16-byte/vector Hamming scan shortlists
    50 candidates per query (integer ops only), then the exact
    dot-product reranks just those 50. At 100 TB the first pass reads
    1/32 of the float corpus bytes and the exact pass touches a
    constant 50 rows per query. Deterministic composition (hamming/id
    and sim/id tie-breaks), so it oracle-checks exactly — no recall
    tolerance needed."""
    from multimodal_vector_db_spark.functions.vector import sign_bits_word

    emb = _t(spark, sf_dir, "embeddings")
    words = emb.select(
        "vec_id",
        "embedding",
        sign_bits_word("embedding", 1, 32).alias("w1"),
        sign_bits_word("embedding", 33, 32).alias("w2"),
    )
    qs = words.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("w1").alias("q1"),
        F.col("w2").alias("q2"),
    )
    # Shortlist carries ONLY (query_id, id): pushing the embedding
    # arrays through the hamming window would shuffle corpus-sized
    # vector payloads; gathering them back via a broadcast semi-join of
    # the (queries × 50)-row shortlist keeps the window exchange at
    # 24 bytes/row. Measured 4× at bench scale (34 → 8 ms/query).
    scored_h = (
        words.select(F.col("vec_id").alias("id"), "w1", "w2")
        .crossJoin(F.broadcast(qs.select("query_id", "q1", "q2")))
        .select(
            "query_id",
            "id",
            (
                F.bit_count(F.col("w1").bitwiseXOR(F.col("q1")))
                + F.bit_count(F.col("w2").bitwiseXOR(F.col("q2")))
            ).alias("hamming"),
        )
    )
    shortlist = top_k_per_group(
        scored_h, ["query_id"], 50, order_col="hamming", ascending=True
    ).select("query_id", "id")
    gathered = (
        emb.select(F.col("vec_id").alias("id"), "embedding")
        .join(F.broadcast(shortlist), on="id")
        .join(F.broadcast(qs.select("query_id", "q_emb")), on="query_id")
    )
    reranked = gathered.select(
        "query_id", "id", dot("embedding", "q_emb").alias("sim")
    )
    out = top_k_per_group(reranked, ["query_id"], 10)
    return out.select(
        "query_id", "id", "sim", F.col("rank").cast("long").alias("rank")
    )


# ---------------------------------------------------------------------------
# Training-order layout: shard packing + source interleaving
# ---------------------------------------------------------------------------


@query(
    "shard_packing",
    rf"""
    WITH t AS (
      SELECT doc_id, md5(doc_id::VARCHAR) AS ord,
             len({_TOKS.format(col="text")})::BIGINT AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM t
    )
    SELECT floor(cum_before / 20000)::BIGINT AS shard_id,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS total_tokens
    FROM c GROUP BY shard_id
    """,
)
def q_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing (operators/packing.py): shuffle the
    corpus into a deterministic pseudo-random order (md5 of the id) and
    cut it into ~20k-token shards — the layout step a data loader
    consumes after curation. The oracle states the semantics as ONE
    global cumulative window; the engine computes the identical prefix
    sum with the two-phase distributed form (deterministic monotone
    hex-prefix buckets → parallel per-bucket windows → 256-row offset
    window), so the sequential step never scales with the corpus."""
    from multimodal_vector_db_spark.functions import text as X
    from multimodal_vector_db_spark.operators.packing import pack_shards

    docs = _t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
        X.token_count("text").alias("n_tokens"),
    )
    packed = pack_shards(
        staged, "n_tokens", 20000, order_cols=["ord", "doc_id"]
    )
    return packed.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@query(
    "training_order_interleave",
    """
    WITH t AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      FROM documents
    ),
    p AS (
      SELECT doc_id, source, rk,
             row_number() OVER (ORDER BY rk, source, doc_id) AS pos
      FROM t
    )
    SELECT pos::BIGINT AS pos, doc_id, source FROM p WHERE pos <= 200
    """,
)
def q_training_order_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-interleaved training order: shuffle within
    each source by hash, then round-robin across sources — every
    source appears once per cycle, the standard mixing layout for
    multi-source training runs. The global position numbering here is
    display-only (first 200 rows); at scale the (rk, source) pair IS
    the order key and sharding uses the prefix-sum form of
    operators/packing.py instead of a global window."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    t = docs.select(
        "doc_id", "source", F.row_number().over(w_src).alias("rk")
    )
    w_pos = Window.orderBy("rk", "source", "doc_id")
    return (
        t.withColumn("pos", F.row_number().over(w_pos).cast("long"))
        .where(F.col("pos") <= 200)
        .select("pos", "doc_id", "source")
    )


@query(
    "embedding_drift",
    """
    WITH g AS (
      SELECT label, vec_id % 2 AS ver,
             list(embedding::DOUBLE[] ORDER BY vec_id) AS vs
      FROM embeddings GROUP BY label, vec_id % 2
    ),
    c AS (
      SELECT label, ver, len(vs)::BIGINT AS n,
        list_transform(
          list_reduce(vs, (a, b) ->
            list_transform(generate_series(1, 64), i -> a[i] + b[i])),
          x -> x / len(vs)) AS c
      FROM g
    )
    SELECT a.label, a.n AS n_a, b.n AS n_b,
           round(list_dot_product(a.c, b.c)
             / (sqrt(list_dot_product(a.c, a.c))
                * sqrt(list_dot_product(b.c, b.c))), 6) AS centroid_cos
    FROM c a JOIN c b ON a.label = b.label AND a.ver = 0 AND b.ver = 1
    """,
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-version drift monitor: split the corpus into two
    deterministic halves (standing in for two embedder versions /
    re-embedding runs), compare per-label centroids by cosine. The
    production check before swapping an index to a new model version —
    a low centroid_cos for a label means that label's region moved and
    its ANN partitions/centroids need rebuilding. Centroids use the
    same deterministic sorted sequential fold as `label_centroids`."""
    from multimodal_vector_db_spark.functions.vector import (
        array_mean_pool,
        cosine_similarity,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cent = (
        emb.withColumn("ver", F.col("vec_id") % 2)
        .groupBy("label", "ver")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("vec_id", "embedding"))),
                lambda s: s["embedding"],
            ).alias("frames"),
        )
        .select("label", "ver", "n", array_mean_pool("frames").alias("c"))
    )
    a = cent.where(F.col("ver") == 0).select(
        "label", F.col("n").alias("n_a"), F.col("c").alias("ca")
    )
    b = cent.where(F.col("ver") == 1).select(
        "label", F.col("n").alias("n_b"), F.col("c").alias("cb")
    )
    return a.join(b, on="label").select(
        "label",
        "n_a",
        "n_b",
        F.round(cosine_similarity("ca", "cb"), 6).alias("centroid_cos"),
    )


@query(
    "maxsim_multivector_search",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      WHERE vec_id < 8
    ),
    scored AS (
      SELECT q.query_id, e.label, e.vec_id, {_DOT} AS sim
      FROM embeddings e, q
    ),
    agg AS (
      SELECT query_id, label,
             max(sim) AS max_sim,
             count(*)::BIGINT AS n_vectors
      FROM scored GROUP BY query_id, label
    ),
    ranked AS (
      SELECT query_id, label, max_sim, n_vectors,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY max_sim DESC, label ASC) AS rank
      FROM agg
    )
    SELECT query_id, label, round(max_sim, 6) AS max_sim, n_vectors,
           rank::BIGINT AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def q_maxsim_multivector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector (late-interaction) retrieval, ColBERT-style MaxSim:
    each label group stands for a DOCUMENT represented by a bag of
    vectors (token/chunk/frame embeddings); a document's score is the
    MAX similarity any of its vectors achieves against the query, and
    documents rank by that score. The Spark shape is the one that
    matters at 100 TB: score every vector in one broadcast pass, then
    max() is a partial-able aggregate — the per-document reduction
    happens map-side, so the shuffle carries one row per (query,
    document), never per vector."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.select("vec_id", "label", "embedding")
        .crossJoin(F.broadcast(qs))
        .select(
            "query_id",
            "label",
            dot("embedding", "q_emb").alias("sim"),
        )
    )
    agg = scored.groupBy("query_id", "label").agg(
        F.max("sim").alias("max_sim"),
        F.count("*").cast("long").alias("n_vectors"),
    )
    out = top_k_per_group(
        agg, ["query_id"], 3, order_col="max_sim", tie_col="label"
    )
    return out.select(
        "query_id",
        "label",
        F.round("max_sim", 6).alias("max_sim"),
        "n_vectors",
        F.col("rank").cast("long").alias("rank"),
    )


@query(
    "media_codec_features",
    """
    WITH h AS (
      SELECT doc_id,
             md5(doc_id::VARCHAR)
               || md5(doc_id::VARCHAR || 'x')
               || md5(doc_id::VARCHAR || 'y') AS hexes
      FROM documents WHERE doc_id < 200
    ),
    m AS (
      SELECT doc_id,
        list_transform(generate_series(0, 2), c ->
          list_sum(list_transform(generate_series(0, 11), k ->
            ('0x' || substring(hexes, 2 * (c + 3 * k) + 1, 2))::BIGINT
          )) / 12.0) AS chan
      FROM h
    )
    SELECT doc_id,
           round(chan[1], 6) AS mean_r,
           round(chan[2], 6) AS mean_g,
           round(chan[3], 6) AS mean_b,
           4.0 / 3.0 AS aspect
    FROM m
    """,
)
def q_media_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under oracle check: build a 4×3 binary PPM per
    document (header + 36 md5-derived payload bytes), push it through
    the actual netpbm codec + pixel featurizer in ``mapInPandas``
    (multimodal/codecs.py — byte parsing, reshape, channel means), and
    let DuckDB re-derive the expected channel means INDEPENDENTLY from
    the hex strings. A decoder bug (stride, channel order, header
    skew) breaks the hash match — this is the decode path's
    correctness gate, not a digest stand-in."""
    from pyspark.sql import types as T

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    d = F.col("doc_id").cast("string")
    hexes = F.concat(
        F.md5(d), F.md5(F.concat(d, F.lit("x"))), F.md5(F.concat(d, F.lit("y")))
    )
    header_hex = "P6\n4 3\n255\n".encode().hex()
    media = docs.select(
        "doc_id",
        F.concat(
            F.unhex(F.lit(header_hex)), F.unhex(F.substring(hexes, 1, 72))
        ).alias("content"),
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
            T.StructField("aspect", T.DoubleType()),
        ]
    )

    def decode_batches(it):
        import pandas as pd

        from multimodal_vector_db_spark.multimodal.codecs import (
            decode_ppm,
            image_features,
        )

        for pdf in it:
            feats = pdf["content"].map(
                lambda b: image_features(decode_ppm(bytes(b)))
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mean_r": feats.map(lambda f: f[0]),
                    "mean_g": feats.map(lambda f: f[1]),
                    "mean_b": feats.map(lambda f: f[2]),
                    "aspect": feats.map(lambda f: f[4]),
                }
            )

    decoded = media.mapInPandas(decode_batches, schema=out_schema)
    return decoded.select(
        "doc_id",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        "aspect",
    )


@query(
    "audio_codec_features",
    """
    WITH h AS (
      SELECT doc_id,
             md5(doc_id::VARCHAR)
               || md5(doc_id::VARCHAR || 'x')
               || md5(doc_id::VARCHAR || 'y') AS hexes
      FROM documents WHERE doc_id < 200
    ),
    s AS (
      SELECT doc_id,
        list_transform(generate_series(0, 23), k ->
          CASE WHEN ('0x' || substring(hexes, 4*k+3, 2))::BIGINT >= 128
               THEN ('0x' || substring(hexes, 4*k+1, 2))::BIGINT
                    + 256 * ('0x' || substring(hexes, 4*k+3, 2))::BIGINT
                    - 65536
               ELSE ('0x' || substring(hexes, 4*k+1, 2))::BIGINT
                    + 256 * ('0x' || substring(hexes, 4*k+3, 2))::BIGINT
          END) AS smp
      FROM h
    )
    SELECT doc_id,
      round(24.0 / 8000.0, 6) AS duration,
      round(sqrt(list_sum(list_transform(smp,
        v -> (v::DOUBLE / 32768) * (v::DOUBLE / 32768))) / 24.0), 6) AS rms,
      round(list_sum(list_transform(generate_series(1, 23), k ->
        abs((CASE WHEN smp[k+1] < 0 THEN 1 ELSE 0 END)
            - (CASE WHEN smp[k] < 0 THEN 1 ELSE 0 END)))) / 23.0, 6) AS zcr
    FROM s
    """,
)
def q_audio_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode under oracle check — the WAV twin of
    `media_codec_features`: build a 24-sample PCM WAV per document
    (fixed RIFF header + md5-derived int16 payload) inside the plan,
    decode it with the actual stdlib-wave codec in ``mapInPandas``
    (multimodal/codecs.py — framing, endianness, sign, [-1,1]
    scaling), and let DuckDB re-derive duration/RMS/zero-crossing-rate
    independently from the hex strings. An endianness or sign bug in
    the decoder breaks the hash match."""
    import struct

    from pyspark.sql import types as T

    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + 48)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", 48)
    )
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    d = F.col("doc_id").cast("string")
    hexes = F.concat(
        F.md5(d), F.md5(F.concat(d, F.lit("x"))), F.md5(F.concat(d, F.lit("y")))
    )
    media = docs.select(
        "doc_id",
        F.concat(F.unhex(F.lit(hdr.hex())), F.unhex(hexes)).alias("content"),
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("duration", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zcr", T.DoubleType()),
        ]
    )

    def decode_batches(it):
        import pandas as pd

        from multimodal_vector_db_spark.multimodal.codecs import (
            audio_features,
            decode_wav,
        )

        for pdf in it:
            feats = pdf["content"].map(
                lambda b: audio_features(*decode_wav(bytes(b)))
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "duration": feats.map(lambda f: f[0]),
                    "rms": feats.map(lambda f: f[1]),
                    "zcr": feats.map(lambda f: f[2]),
                }
            )

    decoded = media.mapInPandas(decode_batches, schema=out_schema)
    return decoded.select(
        "doc_id",
        F.round("duration", 6).alias("duration"),
        F.round("rms", 6).alias("rms"),
        F.round("zcr", 6).alias("zcr"),
    )


@query(
    "video_codec_features",
    """
    WITH h AS (
      SELECT doc_id FROM documents WHERE doc_id < 200
    ),
    f AS (
      SELECT doc_id, unnest(generate_series(0, 1)) AS frame_no FROM h
    ),
    m AS (
      SELECT doc_id, frame_no,
             md5(doc_id::VARCHAR || frame_no::VARCHAR) AS hx
      FROM f
    )
    SELECT doc_id, frame_no::BIGINT AS frame_no,
           round(list_sum(list_transform(generate_series(0, 15), k ->
             ('0x' || substring(hx, 2*k+1, 2))::BIGINT)) / 16.0, 6)
             AS luma_mean
    FROM m
    """,
)
def q_video_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode under oracle check — the Y4M member of the
    codec trio: build a 2-frame 4×4 YUV4MPEG2 stream per document
    (header + FRAME markers + md5-derived luma planes + flat chroma)
    inside the plan, decode it with the actual y4m codec in
    ``mapInPandas`` (multimodal/codecs.py — header parse, plane
    strides, frame framing), and let DuckDB re-derive each frame's
    luma mean independently. A plane-stride or frame-offset bug breaks
    the hash match."""
    from multimodal_vector_db_spark.multimodal.pipeline import (
        video_frames_from_y4m,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    d = F.col("doc_id").cast("string")
    hdr_hex = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n".hex()
    frame_marker = b"FRAME\n".hex()
    chroma = F.substring(F.md5(F.concat(d, F.lit("c"))), 1, 16)
    media = docs.select(
        "doc_id",
        F.concat(
            F.unhex(F.lit(hdr_hex)),
            F.unhex(F.lit(frame_marker)),
            F.unhex(F.md5(F.concat(d, F.lit("0")))),
            F.unhex(chroma),
            F.unhex(F.lit(frame_marker)),
            F.unhex(F.md5(F.concat(d, F.lit("1")))),
            F.unhex(chroma),
        ).alias("content"),
    )
    frames = video_frames_from_y4m(media, id_col="doc_id")
    return frames.select(
        F.col("video_id").alias("doc_id"),
        "frame_no",
        F.round("luma_mean", 6).alias("luma_mean"),
    )


@query(
    "feature_hashing_knn",
    rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS.format(col="lower(text)")} AS toks FROM documents
    ),
    b AS (
      SELECT doc_id,
        list_transform(toks,
          tk -> ('0x' || substring(md5(tk), 1, 8))::BIGINT % 64) AS buckets
      FROM t
    ),
    v AS (
      SELECT doc_id,
        list_transform(generate_series(0, 63),
          i -> len(list_filter(buckets, bk -> bk = i))::DOUBLE) AS tf
      FROM b
    ),
    n AS (
      SELECT doc_id,
        CASE WHEN sqrt(list_dot_product(tf, tf)) = 0 THEN tf
             ELSE list_transform(tf,
               x -> x / sqrt(list_dot_product(tf, tf))) END AS v
      FROM v
    ),
    q AS (SELECT v AS qv FROM n WHERE doc_id = 0)
    SELECT n.doc_id AS id, round(list_dot_product(n.v, q.qv), 6) AS sim
    FROM n, q ORDER BY sim DESC, id ASC LIMIT 10
    """,
)
def q_feature_hashing_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL text embedding + search, fully oracle-checked end to end:
    feature-hashing TF vectors (the HashingTF family — tokens hash to
    64 buckets, counts L2-normalized) computed as pure Column
    expressions, then cosine top-10 against document 0. Unlike the
    digest fake, this is a genuine lexical embedder — documents
    sharing vocabulary score high — and unlike the CLIP path it needs
    no model weights, so the ENTIRE embed→search pipeline is inside
    whole-stage codegen and replayable by the SQL oracle."""
    from multimodal_vector_db_spark.functions.text import (
        hashing_buckets,
        hashing_tf,
    )
    from multimodal_vector_db_spark.functions.vector import l2_normalize

    docs = _t(spark, sf_dir, "documents")
    # Corpus-scale embed: explode bucket ids → codegen'd groupBy count
    # → dense vector from a per-doc count map. The all-HOF form
    # (hashing_tf) evaluates 64×n_tokens interpreted lambda steps per
    # row — fine for one query vector, 20× slower for the whole corpus
    # (measured 40 s → 2 s at sf0.1). Same math, same oracle.
    counts = (
        docs.select(
            "doc_id", F.explode(hashing_buckets("text", 64)).alias("b")
        )
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("cnt"))
    )
    maps = counts.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "cnt"))).alias("m")
    )
    tf = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("m"), i.cast("long")).cast("double"),
            F.lit(0.0),
        ),
    )
    embedded = (
        docs.select("doc_id")
        .join(maps, "doc_id", "left")
        .select("doc_id", F.coalesce(tf, F.array_repeat(F.lit(0.0), 64)).alias("tf"))
        .select("doc_id", l2_normalize(F.col("tf")).alias("v"))
    )
    # the single query vector embeds through the per-row HOF form —
    # one document, no shuffle
    qvec = (
        docs.where(F.col("doc_id") == 0)
        .select(hashing_buckets("text", 64).alias("b"))
        .select(hashing_tf("b", 64).alias("tf"))
        .select(l2_normalize(F.col("tf")).alias("v"))
        .first()[0]
    )
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        embedded.select(
            F.col("doc_id").alias("id"),
            F.round(dot(F.col("v"), q), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("id").asc())
        .limit(10)
    )


@query(
    "cohort_retention",
    """
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week
      FROM events
    ),
    firsts AS (
      SELECT user_id, min(week) AS cohort_week FROM act GROUP BY user_id
    )
    SELECT f.cohort_week,
           (date_diff('day', f.cohort_week, a.week) / 7)::BIGINT
             AS weeks_since,
           count(DISTINCT a.user_id)::BIGINT AS n_users
    FROM act a JOIN firsts f USING (user_id)
    GROUP BY f.cohort_week, weeks_since
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active week,
    counted in each subsequent week — the standard engagement readout
    over the events stream. Two hash aggregations plus an equi-join on
    user_id; every aggregate is partial-able, nothing is windowed, so
    the plan is fully parallel at any scale."""
    ev = _t(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    firsts = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(firsts, on="user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            ).cast("long").alias("weeks_since"),
            "user_id",
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


@query(
    "quality_psi",
    """
    WITH b AS (
      SELECT source, least(n_chars // 100, 10) AS bucket FROM documents
    ),
    counts AS (
      SELECT source, bucket, count(*)::DOUBLE AS cnt
      FROM b GROUP BY source, bucket
    ),
    totals AS (
      SELECT source, sum(cnt) AS tot FROM counts GROUP BY source
    ),
    -- Laplace-smoothed bucket shares over the FULL 0..10 bucket grid
    grid AS (
      SELECT t.source, g.bucket, t.tot,
             coalesce(c.cnt, 0.0) AS cnt
      FROM totals t
      CROSS JOIN (SELECT unnest(generate_series(0, 10)) AS bucket) g
      LEFT JOIN counts c ON c.source = t.source AND c.bucket = g.bucket
    ),
    shares AS (
      SELECT source, bucket, (cnt + 1.0) / (tot + 11.0) AS p
      FROM grid
    ),
    ref AS (SELECT bucket, p AS q FROM shares WHERE source = 'src0'),
    terms AS (
      SELECT s.source, s.bucket, (s.p - r.q) * ln(s.p / r.q) AS term
      FROM shares s JOIN ref r USING (bucket)
      WHERE s.source <> 'src0'
    ),
    folded AS (
      SELECT source, list(term ORDER BY bucket) AS ts FROM terms
      GROUP BY source
    )
    SELECT source,
           round(list_reduce(list_prepend(0.0, ts), (a, x) -> a + x), 6)
             AS psi
    FROM folded
    """,
)
def q_quality_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index of the document-length distribution,
    each source vs the `src0` reference — the standard drift alarm for
    a curation pipeline's input mix (PSI > 0.2 ≈ feed changed). Bucket
    shares are Laplace-smoothed over a fixed grid (empty buckets carry
    signal); the per-source term sum is a SORTED sequential fold so the
    float accumulation order matches the oracle exactly."""
    docs = _t(spark, sf_dir, "documents")
    b = docs.select(
        "source",
        F.least(F.floor(F.col("n_chars") / 100), F.lit(10)).alias("bucket"),
    )
    counts = b.groupBy("source", "bucket").agg(
        F.count("*").cast("double").alias("cnt")
    )
    totals = counts.groupBy("source").agg(F.sum("cnt").alias("tot"))
    grid = (
        totals.crossJoin(
            docs.sparkSession.range(0, 11).select(
                F.col("id").alias("bucket")
            )
        )
        .join(counts, on=["source", "bucket"], how="left")
        .select(
            "source",
            "bucket",
            "tot",
            F.coalesce(F.col("cnt"), F.lit(0.0)).alias("cnt"),
        )
    )
    shares = grid.select(
        "source",
        "bucket",
        ((F.col("cnt") + 1.0) / (F.col("tot") + 11.0)).alias("p"),
    )
    ref = shares.where(F.col("source") == "src0").select(
        "bucket", F.col("p").alias("q")
    )
    terms = (
        shares.where(F.col("source") != "src0")
        .join(F.broadcast(ref), on="bucket")
        .select(
            "source",
            "bucket",
            (
                (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
            ).alias("term"),
        )
    )
    folded = terms.groupBy("source").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "term"))),
            lambda s: s["term"],
        ).alias("ts")
    )
    return folded.select(
        "source",
        F.round(
            F.aggregate(F.col("ts"), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("psi"),
    )


