"""IR metrics, pooling/Matryoshka, product quantization.

Split from the original queries.py (1136-1941); body text unchanged.
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

# IR metrics (SURVEY §2.4 A5-A10) — the evaluation pipeline
# ---------------------------------------------------------------------------

_RANKINGS_CTE = f"""
    q AS (
      SELECT vec_id AS query_id, embedding AS q_emb, label AS qlabel
      FROM embeddings WHERE vec_id < 20
    ),
    ranked AS (
      SELECT q.query_id, e.vec_id AS id,
             row_number() OVER (
               PARTITION BY q.query_id ORDER BY {_DOT} DESC, e.vec_id ASC
             ) AS rank
      FROM embeddings e, q
    ),
    retr AS (
      SELECT query_id, list(id ORDER BY rank) AS retrieved
      FROM ranked WHERE rank <= 10 GROUP BY query_id
    ),
    rel AS (
      SELECT q.query_id, list(e.vec_id ORDER BY e.vec_id) AS relevant
      FROM q JOIN embeddings e ON e.label = q.qlabel
      GROUP BY q.query_id
    ),
    rr AS (
      SELECT retr.query_id, retrieved, relevant
      FROM retr JOIN rel ON retr.query_id = rel.query_id
    )
"""

# NB: scalar fold, not a struct accumulator — DuckDB 1.0 mis-binds
# x.<field> to acc.<field> when both appear in one struct-field expr.
# The cumulative hit count is recomputed per position (k ≤ 10, cheap);
# the term-addition ORDER matches Spark's sequential fold exactly.
_AP_SQL = """
    round(coalesce(list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(generate_series(1, len(retrieved)), i ->
        CASE WHEN list_contains(relevant, retrieved[i])
        THEN len(list_filter(generate_series(1, i),
                 j -> list_contains(relevant, retrieved[j])))::DOUBLE / i
        ELSE 0.0 END)),
      (a, b) -> a + b) / nullif(len(relevant), 0), 0.0), 6)
"""

_NDCG_SQL = """
    round(coalesce(
      list_reduce(list_prepend(0.0,
        list_transform(generate_series(1, least(len(retrieved), 10)), i ->
          CASE WHEN list_contains(relevant, retrieved[i])
               THEN 1.0 / log2(i + 1.0) ELSE 0.0 END)),
        (a, b) -> a + b)
      / nullif(
        list_reduce(list_prepend(0.0,
          list_transform(generate_series(1, least(10, len(relevant))), i ->
            1.0 / log2(i + 1.0))),
          (a, b) -> a + b), 0.0),
      0.0), 6)
"""


@query(
    "metrics_eval",
    f"""
    WITH {_RANKINGS_CTE}
    SELECT query_id,
           round(coalesce(len(list_filter(retrieved[1:10],
             x -> list_contains(relevant, x)))::DOUBLE
             / nullif(len(relevant), 0), 0.0), 6) AS recall,
           round(len(list_filter(retrieved[1:10],
             x -> list_contains(relevant, x)))::DOUBLE / 10.0, 6) AS precision,
           {_AP_SQL} AS ap,
           {_NDCG_SQL} AS ndcg
    FROM rr
    """,
)
def q_metrics_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5-A9 evaluation pipeline: batch kNN (20 queries) → per-query
    recall@10 / precision@10 / AP / NDCG@10 against same-label ground
    truth. Ordered metrics are sequential array folds (metrics.py
    semantics, deterministic accumulation order)."""
    from multimodal_vector_db_spark.operators.metrics import (
        evaluate_rankings,
        rankings_from_knn,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("qlabel"),
    )
    knn = knn_join(
        emb.select(F.col("vec_id").alias("id"), "embedding"),
        qs.select("query_id", "q_emb"),
        k=10,
    )
    retrieved = rankings_from_knn(knn)
    relevant = (
        qs.select("query_id", "qlabel")
        .join(emb, on=(F.col("qlabel") == emb.label))
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list("vec_id")).alias("relevant"))
    )
    return evaluate_rankings(retrieved.join(relevant, on="query_id"), k=10)


@query(
    "map_metric",
    f"""
    WITH {_RANKINGS_CTE}
    SELECT round(avg(ap), 6) AS map FROM (
      SELECT {_AP_SQL} AS ap FROM rr
    )
    """,
)
def q_map_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: MAP — mean of (rounded) per-query AP (metrics.py:112-133)."""
    from multimodal_vector_db_spark.operators.metrics import (
        mean_average_precision,
    )

    per_query = q_metrics_eval(spark, sf_dir)
    return mean_average_precision(per_query)


@query(
    "contamination",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_emb, label AS qlabel
      FROM embeddings WHERE vec_id < 20
    ),
    ranked AS (
      SELECT q.query_id, q.qlabel, e.vec_id AS id, e.label,
             row_number() OVER (
               PARTITION BY q.query_id ORDER BY {_DOT} DESC, e.vec_id ASC
             ) AS rank
      FROM embeddings e, q
    )
    SELECT query_id,
           sum(CASE WHEN label != qlabel THEN 1 ELSE 0 END)::BIGINT
             AS n_contaminated
    FROM ranked WHERE rank <= 10 GROUP BY query_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: contamination count — how many top-10 hits come from a
    different group than the query (benchmark_cross_modal.py:148-155,
    there audio-vs-CLIP modality bleed)."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("qlabel"),
    )
    knn = knn_join(
        emb.select(F.col("vec_id").alias("id"), "embedding", "label"),
        qs.select("query_id", "q_emb"),
        k=10,
        payload_cols=["label"],
    )
    return (
        knn.join(qs.select("query_id", "qlabel"), on="query_id")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("label") != F.col("qlabel"), 1).otherwise(0)
            ).cast("long").alias("n_contaminated")
        )
    )


# ---------------------------------------------------------------------------
# Pooling / Matryoshka / compression (SURVEY §2.4 A3, §2.7 F4, §2.9 Q1)
# ---------------------------------------------------------------------------


@query(
    "label_centroids",
    """
    WITH g AS (
      SELECT label, list(embedding::DOUBLE[] ORDER BY vec_id) AS vs
      FROM embeddings GROUP BY label
    )
    SELECT label,
           array_to_string(list_transform(
             list_transform(
               list_reduce(vs, (a, b) ->
                 list_transform(generate_series(1, 64), i -> a[i] + b[i])),
               x -> x / len(vs)),
             v -> (round(v, 9)::DECIMAL(28,9))::VARCHAR), ',') AS centroid
    FROM g
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: temporal mean pooling (video_embedder.py:145-149) as a grouped
    element-wise array aggregation — frames = same-label embeddings,
    summed in vec_id order (deterministic sequential fold)."""
    from multimodal_vector_db_spark.functions.vector import array_mean_pool

    emb = _t(spark, sf_dir, "embeddings")
    grouped = emb.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("vec_id", "embedding"))),
            lambda s: s["embedding"],
        ).alias("frames")
    )
    return grouped.select(
        "label", _csv_doubles(array_mean_pool(F.col("frames"))).alias("centroid")
    )


@query(
    "matryoshka_knn",
    """
    WITH e AS (
      SELECT vec_id, embedding[1:16]::DOUBLE[] AS v FROM embeddings
    ),
    n AS (
      SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v
      FROM e
    ),
    q AS (SELECT v AS qv FROM n WHERE vec_id = 0)
    SELECT n.vec_id AS id, list_dot_product(n.v, q.qv) AS sim
    FROM n, q
    ORDER BY sim DESC, id ASC LIMIT 10
    """,
)
def q_matryoshka_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: Matryoshka truncate-to-16-dims + renormalize + kNN
    (projection.py:196-220 + README.md:243-248 semantics)."""
    from multimodal_vector_db_spark.functions.vector import slice_renormalize

    emb = _t(spark, sf_dir, "embeddings")
    sliced = emb.select(
        F.col("vec_id").alias("id"),
        slice_renormalize("embedding", 16).alias("embedding"),
    )
    qvec_row = sliced.where(F.col("id") == 0).select("embedding").first()
    q = F.array(*[F.lit(float(x)) for x in qvec_row[0]])
    return (
        sliced.select(
            "id",
            F.aggregate(
                F.zip_with(F.col("embedding"), q, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("id").asc())
        .limit(10)
    )


@query(
    "attention_pooling",
    """
    WITH g AS (
      SELECT label, list(embedding::DOUBLE[] ORDER BY vec_id) AS vs
      FROM embeddings WHERE label < 5 GROUP BY label
    ),
    n AS (
      SELECT label, vs,
             list_transform(vs, v ->
               sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(v, x -> x * x)), (a, b) -> a + b))) AS norms
      FROM g
    ),
    t AS (
      SELECT label, vs, norms,
             list_reduce(list_prepend(0.0::DOUBLE, norms), (a, b) -> a + b) AS total
      FROM n
    )
    SELECT label,
           array_to_string(list_transform(
             list_transform(generate_series(1, 64), i ->
               list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(generate_series(1, len(vs)),
                   j -> vs[j][i] * (norms[j] / total))),
                 (a, b) -> a + b)),
             v -> (round(v, 9)::DECIMAL(28,9))::VARCHAR), ',') AS pooled
    FROM t
    """,
)
def q_attention_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 attention pooling (video_embedder.py:153-158): norm-weighted
    mean over same-label embeddings (frames), sequential vec_id-order
    fold on both engines for bit equality."""
    from multimodal_vector_db_spark.functions.vector import (
        array_attention_pool,
    )

    emb = _t(spark, sf_dir, "embeddings").where(F.col("label") < 5)
    grouped = emb.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("vec_id", "embedding"))),
            lambda s: s["embedding"],
        ).alias("frames")
    )
    return grouped.select(
        "label",
        _csv_doubles(array_attention_pool(F.col("frames"))).alias("pooled"),
    )


@query(
    "matryoshka_multiscale",
    """
    WITH dims AS (SELECT unnest([16, 32, 64]) AS dim),
    sliced AS (
      SELECT e.vec_id, d.dim,
             list_transform(e.embedding[1:d.dim], x -> x::DOUBLE) AS v
      FROM embeddings e, dims d
      WHERE e.vec_id < 50
    ),
    n AS (
      SELECT vec_id, dim, v,
             sqrt(list_dot_product(v, v)) AS nrm
      FROM sliced
    )
    SELECT vec_id, dim,
           array_to_string(list_transform(
             CASE WHEN nrm = 0 THEN v
                  ELSE list_transform(v, x -> x / nrm) END,
             e -> (round(e, 9)::DECIMAL(28,9))::VARCHAR), ',') AS v_scaled
    FROM n
    """,
)
def q_matryoshka_multiscale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 multi-scale expansion (projection.py:222-263): one input row →
    {16, 32, 64}-d truncated+renormalized variants, as an explode over
    the dims array — the per-dim materialized-table build in one plan."""
    from multimodal_vector_db_spark.functions.vector import slice_renormalize

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    exploded = emb.select(
        "vec_id",
        "embedding",
        F.explode(F.array(F.lit(16), F.lit(32), F.lit(64))).alias("dim"),
    )
    out = exploded.select(
        "vec_id",
        "dim",
        _csv_doubles(
            F.when(F.col("dim") == 16, slice_renormalize("embedding", 16))
            .when(F.col("dim") == 32, slice_renormalize("embedding", 32))
            .otherwise(slice_renormalize("embedding", 64))
        ).alias("v_scaled"),
    )
    return out


@query(
    "tokenize_regex",
    r"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks)::BIGINT AS n_tokens,
           len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]+$')))::BIGINT AS n_alpha,
           len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$')))::BIGINT AS n_num
    FROM t
    """,
)
def q_tokenize_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization: alpha runs / digit runs / single
    punctuation as separate tokens (the pre-tokenizer split every BPE
    implementation applies), with per-class counts."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(
        F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
    )
    staged = docs.select("doc_id", toks.alias("toks"))
    return staged.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(
            F.filter(F.col("toks"), lambda x: x.rlike("^[A-Za-z]+$"))
        ).cast("long").alias("n_alpha"),
        F.size(
            F.filter(F.col("toks"), lambda x: x.rlike("^[0-9]+$"))
        ).cast("long").alias("n_num"),
    )


@query(
    "winnow_fingerprint",
    r"""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN length(norm) < 8 THEN md5(norm)
                ELSE list_aggregate(
                  list_transform(generate_series(1, length(norm) - 7),
                                 i -> md5(substr(norm, i, 8))), 'min')
           END AS winnow_fp,
           greatest(length(norm) - 7, 1)::BIGINT AS n_windows
    FROM t
    """,
)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window document fingerprint (winnowing-style): the min
    md5 over all 8-char windows of the normalized text — robust to
    content reordering, the standard near-dup fingerprint for code/text
    plagiarism detection."""
    from multimodal_vector_db_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    staged = docs.select("doc_id", norm.alias("norm"))
    win_min = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.length("norm") - 7),
            lambda i: F.md5(F.col("norm").substr(i, F.lit(8))),
        )
    )
    return staged.select(
        "doc_id",
        F.when(F.length("norm") < 8, F.md5(F.col("norm")))
        .otherwise(win_min)
        .alias("winnow_fp"),
        F.greatest(F.length("norm") - 7, F.lit(1)).cast("long").alias("n_windows"),
    )


@query(
    "fp16_round_trip",
    """
    WITH s1 AS (
      SELECT vec_id,
        list_transform(embedding, xf -> struct_pack(
          x := xf::DOUBLE,
          e0 := CASE WHEN xf = 0 THEN 0
                     ELSE floor(log2(abs(xf::DOUBLE)))::INT END
        )) AS a
      FROM embeddings
    ),
    s2 AS (
      SELECT vec_id,
        list_transform(a, s -> struct_pack(
          x := s.x,
          e := CASE WHEN s.x = 0 THEN 0
                    WHEN abs(s.x) < power(2, s.e0) THEN s.e0 - 1
                    WHEN abs(s.x) >= power(2, s.e0 + 1) THEN s.e0 + 1
                    ELSE s.e0 END
        )) AS a
      FROM s1
    ),
    y AS (
      SELECT vec_id,
        list_transform(a, s ->
          CASE WHEN s.x = 0 THEN s.x
               ELSE round_even(s.x / power(2, greatest(s.e, -14) - 10), 0)
                    * power(2, greatest(s.e, -14) - 10) END) AS fp16_vec
      FROM s2
    )
    SELECT vec_id,
           array_to_string(list_transform(fp16_vec,
             v -> ((v * 16777216)::BIGINT)::VARCHAR), ',') AS fp16_vec,
           round(sqrt(list_dot_product(fp16_vec, fp16_vec)), 6) AS fp16_norm
    FROM y
    """,
)
def q_fp16_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: FP16 storage round-trip (vector_index.py:79-91) — numpy
    ``astype(float16)`` on the Spark side, emulated BIT-EXACTLY in the
    oracle: IEEE round-to-nearest-even at the 10-bit-mantissa quantum
    2^(e-10) (2^-24 flushes into the subnormal range), with a
    floor(log2)+correction exponent that survives log2's ulp error at
    power-of-2 boundaries. fp16 values are exactly representable in
    both float32 and double, so the hashes match with no tolerance."""
    from multimodal_vector_db_spark.functions.vector import (
        fp16_round_trip,
        l2_norm,
    )

    emb = _t(spark, sf_dir, "embeddings")
    staged = emb.select(
        "vec_id", fp16_round_trip("embedding").alias("fp16_vec")
    )
    # fp16 values are exact multiples of 2^-24 (subnormal quantum), so
    # x * 2^24 is an exact integer in both engines — a lossless scalar
    # serialization with no decimal-rounding dependence at all.
    normed = staged.select(
        "vec_id",
        "fp16_vec",
        F.round(l2_norm("fp16_vec"), 6).alias("fp16_norm"),
    )
    return normed.select(
        "vec_id",
        F.array_join(
            F.transform(
                F.col("fp16_vec"),
                lambda v: (v.cast("double") * F.lit(16777216.0))
                .cast("long")
                .cast("string"),
            ),
            ",",
        ).alias("fp16_vec"),
        "fp16_norm",
    )


# ---------------------------------------------------------------------------
# Product quantization (SURVEY §2.9 Q2-Q5) — deterministic codebook path
# ---------------------------------------------------------------------------


@query(
    "pq_encode_decode",
    """
    WITH subs AS (SELECT unnest(generate_series(0, 3)) AS sub),
    cb AS (
      SELECT (e.vec_id - 100)::BIGINT AS code, s.sub,
             list_transform(e.embedding[s.sub*16+1 : s.sub*16+16],
                            x -> x::DOUBLE) AS centroid
      FROM embeddings e, subs s
      WHERE e.vec_id BETWEEN 100 AND 103
    ),
    sl AS (
      SELECT e.vec_id, s.sub,
             list_transform(e.embedding[s.sub*16+1 : s.sub*16+16],
                            x -> x::DOUBLE) AS sl
      FROM embeddings e, subs s
    ),
    scored AS (
      SELECT sl.vec_id, sl.sub, cb.code, cb.centroid,
             list_dot_product(
               list_transform(generate_series(1, 16), i -> sl.sl[i] - cb.centroid[i]),
               list_transform(generate_series(1, 16), i -> sl.sl[i] - cb.centroid[i])
             ) AS d
      FROM sl JOIN cb ON sl.sub = cb.sub
    ),
    best AS (
      SELECT vec_id, sub, code, centroid,
             row_number() OVER (
               PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) AS rn
      FROM scored
    ),
    agg AS (
      SELECT vec_id,
             list(code ORDER BY sub) AS codes,
             flatten(list(centroid ORDER BY sub)) AS decoded
      FROM best WHERE rn = 1 GROUP BY vec_id
    )
    SELECT a.vec_id,
           array_to_string(a.codes, ',') AS codes,
           round(list_dot_product(
             list_transform(generate_series(1, 64), i -> e.embedding[i]::DOUBLE - a.decoded[i]),
             list_transform(generate_series(1, 64), i -> e.embedding[i]::DOUBLE - a.decoded[i])
           ), 6) AS recon_err
    FROM agg a JOIN embeddings e ON a.vec_id = e.vec_id
    """,
)
def q_pq_encode_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3/Q4 (quantization.py:59-118): PQ encode every embedding against
    a deterministic data-derived codebook (4 subspaces × 4 centroids =
    slices of corpus rows 100-103), then decode and report the exact
    reconstruction error. Encoding is one codegen'd projection over a
    broadcast codebook — zero shuffle, the shape of a 100 TB re-encode."""
    from multimodal_vector_db_spark.operators.quantization import (
        _sq_dist,
        data_derived_codebooks,
        pq_decode,
        pq_encode_codes,
    )

    emb = _t(spark, sf_dir, "embeddings")
    books = data_derived_codebooks(emb, n_subquantizers=4, n_codes=4)
    staged = emb.select(
        "vec_id",
        "embedding",
        pq_encode_codes(F.col("embedding"), books).alias("codes"),
    )
    scored = staged.select(
        "vec_id",
        "codes",
        F.round(
            _sq_dist(F.col("embedding"), pq_decode(F.col("codes"), books)), 6
        ).alias("recon_err"),
    )
    return scored.select(
        "vec_id", _csv_longs(F.col("codes")).alias("codes"), "recon_err"
    )


@query(
    "pq_adc_knn",
    """
    WITH subs AS (SELECT unnest(generate_series(0, 3)) AS sub),
    cb AS (
      SELECT (e.vec_id - 100)::BIGINT AS code, s.sub,
             list_transform(e.embedding[s.sub*16+1 : s.sub*16+16],
                            x -> x::DOUBLE) AS centroid
      FROM embeddings e, subs s
      WHERE e.vec_id BETWEEN 100 AND 103
    ),
    q AS (
      SELECT s.sub,
             list_transform(e.embedding[s.sub*16+1 : s.sub*16+16],
                            x -> x::DOUBLE) AS qsl
      FROM embeddings e, subs s WHERE e.vec_id = 0
    ),
    dtab AS (
      SELECT cb.sub, cb.code,
             list_dot_product(
               list_transform(generate_series(1, 16), i -> q.qsl[i] - cb.centroid[i]),
               list_transform(generate_series(1, 16), i -> q.qsl[i] - cb.centroid[i])
             ) AS d
      FROM cb JOIN q ON cb.sub = q.sub
    ),
    sl AS (
      SELECT e.vec_id, s.sub,
             list_transform(e.embedding[s.sub*16+1 : s.sub*16+16],
                            x -> x::DOUBLE) AS sl
      FROM embeddings e, subs s
    ),
    scored AS (
      SELECT sl.vec_id, sl.sub, cb.code,
             list_dot_product(
               list_transform(generate_series(1, 16), i -> sl.sl[i] - cb.centroid[i]),
               list_transform(generate_series(1, 16), i -> sl.sl[i] - cb.centroid[i])
             ) AS d
      FROM sl JOIN cb ON sl.sub = cb.sub
    ),
    best AS (
      SELECT vec_id, sub, code,
             row_number() OVER (
               PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) AS rn
      FROM scored
    ),
    adc AS (
      SELECT b.vec_id, sum(d.d) AS adc_dist
      FROM best b JOIN dtab d ON b.sub = d.sub AND b.code = d.code
      WHERE b.rn = 1 GROUP BY b.vec_id
    )
    SELECT vec_id, round(adc_dist, 6) AS adc_dist
    FROM adc ORDER BY round(adc_dist, 6) ASC, vec_id ASC LIMIT 10
    """,
)
def q_pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN over PQ codes by asymmetric distance computation
    (Jégou et al. TPAMI 2011): driver-side query↔centroid lookup table,
    per-row distance = 4 table lookups, TakeOrderedAndProject(10). The
    search-side counterpart of Q3/Q4 (quantization.py:59-118 +
    vector_index.py:107-160 top-k contract) at 32× smaller corpus
    bytes — the plan a 100 TB PQ-compressed corpus wants."""
    from multimodal_vector_db_spark.operators.quantization import (
        adc_search,
        data_derived_codebooks,
        pq_encode,
    )

    emb = _t(spark, sf_dir, "embeddings")
    books = data_derived_codebooks(emb, n_subquantizers=4, n_codes=4)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    coded = pq_encode(emb.select("vec_id", "embedding"), books)
    return adc_search(coded, qvec, books, k=10)


def _mmr_oracle_sql(k: int = 5, lam: float = 0.5) -> str:
    """Greedy MMR unrolled as k chained CTE stages (the loop is
    sequential but FINITE — each step is one deterministic argmax, so
    no recursion is needed). cos() mirrors reranker.py:135-138 with the
    same epsilon and fold order as the Python driver implementation."""

    def cos(a: str, b: str) -> str:
        return (
            f"(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})) + 1e-8))"
        )

    stages = [
        """
    s1 AS (
      SELECT id, v, sim, 1 AS mmr_rank FROM cand
      ORDER BY sim DESC, rank ASC LIMIT 1
    )"""
    ]
    for step in range(2, k + 1):
        prev = [f"s{j}" for j in range(1, step)]
        froms = ", ".join(prev)
        not_in = ", ".join(f"{p}.id" for p in prev)
        max_sim = (
            f"greatest({', '.join(cos('c.v', f'{p}.v') for p in prev)})"
            if len(prev) > 1
            else cos("c.v", f"{prev[0]}.v")
        )
        stages.append(
            f"""
    s{step} AS (
      SELECT c.id, c.v, c.sim, {step} AS mmr_rank
      FROM cand c, {froms}
      WHERE c.id NOT IN ({not_in})
      ORDER BY ({lam} * c.sim - {1 - lam} * {max_sim}) DESC, c.rank ASC
      LIMIT 1
    )"""
        )
    union = "\n      UNION ALL\n      ".join(
        f"SELECT id, sim, mmr_rank FROM s{j}" for j in range(1, k + 1)
    )
    return f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 3),
    cand AS (
      SELECT id, v, sim, rank FROM (
        SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
               list_dot_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]) AS sim,
               row_number() OVER (
                 ORDER BY list_dot_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]) DESC,
                          e.vec_id ASC) AS rank
        FROM embeddings e, q
      ) WHERE rank <= 20
    ),{",".join(stages)}
    SELECT id, sim, mmr_rank::INT AS mmr_rank FROM ({union})
    """


@query("mmr_rerank", _mmr_oracle_sql(k=5, lam=0.5))
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1/R2 (reranker.py:17-117): distributed kNN generates the top-20
    candidates; driver-side deterministic MMR (λ=0.5) reranks to a
    diverse top-5. Small-N greedy loop stays on the driver by design —
    the heavy candidate generation is the distributed part."""
    from multimodal_vector_db_spark.operators.rerank import rerank

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 3).select("embedding").first()[0]
    top = knn_search(
        emb.select(F.col("vec_id").alias("id"), "embedding"),
        qvec,
        k=20,
        payload_cols=["embedding"],  # MMR needs the vectors to diversify
    )
    cands = [r.asDict() for r in top.collect()]
    picked = rerank(cands, strategy="diversity", top_k=5)
    return spark.createDataFrame(
        [(int(c["id"]), float(c["sim"]), rank + 1) for rank, c in enumerate(picked)],
        "id BIGINT, sim DOUBLE, mmr_rank INT",
    )


@query(
    "distance_transforms",
    f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id AS id, 1.0 - {_DOT} AS dist FROM embeddings e, q
    )
    SELECT id,
           round(1.0 - dist, 6) AS sim_cosine,
           round(1.0 / (1.0 + dist), 6) AS sim_l2,
           round(100.0 / (1.0 + dist), 6) AS sim_pct
    FROM scored ORDER BY sim_cosine DESC, id ASC LIMIT 20
    """,
)
def q_distance_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/F6: the reference's distance→similarity transforms
    (vector_index.py:139-144: cosine 1-d, l2 1/(1+d)) and the demo's
    percentage form (demo_audio_retrieval.py:140: 100/(1+d))."""
    from multimodal_vector_db_spark.functions.vector import (
        distance_to_similarity,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    dist = 1.0 - dot(F.col("embedding"), qlit)
    return (
        emb.select(
            F.col("vec_id").alias("id"),
            F.round(distance_to_similarity(dist, "cosine"), 6).alias("sim_cosine"),
            F.round(distance_to_similarity(dist, "l2"), 6).alias("sim_l2"),
            F.round(100.0 / (1.0 + dist), 6).alias("sim_pct"),
        )
        .orderBy(F.col("sim_cosine").desc(), F.col("id").asc())
        .limit(20)
    )


@query(
    "index_stats",
    """
    SELECT label::BIGINT AS label,
           count(*)::BIGINT AS total_vectors,
           max(len(embedding))::BIGINT AS dimension
    FROM embeddings GROUP BY label
    """,
)
def q_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: index stats (vector_index.py:279-291) — per-partition vector
    count + dimension, the get_stats() surface as one aggregation."""
    emb = _t(spark, sf_dir, "embeddings")
    return emb.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count("*").cast("long").alias("total_vectors"),
        F.max(F.size("embedding")).cast("long").alias("dimension"),
    )


# ---------------------------------------------------------------------------
