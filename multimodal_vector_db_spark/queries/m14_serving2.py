"""Round-7 serving additions: content-based audio retrieval
(``audio_content_knn`` — the torch-free M5/J5 shape, hash-checked end
to end) and OPQ-rotated product quantization (``opq_*`` — the public
serving-quality step ahead of plain PQ/ADC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._core import _t, query
from .m12_curation4 import _afp_media

# ---------------------------------------------------------------------------
# audio_content_knn — audio bytes → exact spectral fingerprint → kNN
# ---------------------------------------------------------------------------

#: 64 int16 samples per doc from the md5-hex derivation shared with the
#: audio dedup family (m12_curation4._afp_media / _AFP_FP): mod-40
#: groups share a base clip and differ in ONE sample — the planted
#: structure retrieval should recover.
_SMP = r"""
      SELECT doc_id,
             list_transform(generate_series(0, 63), i ->
               CASE WHEN ('0x' || substring(hx, 4 * i + 1, 2))::BIGINT
                         + 256 * ('0x' || substring(hx, 4 * i + 3, 2))::BIGINT
                         >= 32768
                    THEN ('0x' || substring(hx, 4 * i + 1, 2))::BIGINT
                         + 256 * ('0x' || substring(hx, 4 * i + 3, 2))::BIGINT
                         - 65536
                    ELSE ('0x' || substring(hx, 4 * i + 1, 2))::BIGINT
                         + 256 * ('0x' || substring(hx, 4 * i + 3, 2))::BIGINT
               END) AS smp
      FROM (
        SELECT doc_id, substring(hexes, 1, 252) || pb AS hx
        FROM (
          SELECT doc_id,
                 md5('af' || (doc_id % 40)::VARCHAR)
                   || md5('af' || (doc_id % 40)::VARCHAR || 'x')
                   || md5('af' || (doc_id % 40)::VARCHAR || 'y')
                   || md5('af' || (doc_id % 40)::VARCHAR || 'z')
                   || md5('af' || (doc_id % 40)::VARCHAR || 'u')
                   || md5('af' || (doc_id % 40)::VARCHAR || 'v')
                   || md5('af' || (doc_id % 40)::VARCHAR || 'w')
                   || md5('af' || (doc_id % 40)::VARCHAR || 'q') AS hexes,
                 substring(md5(doc_id::VARCHAR || 'ap'), 1, 4) AS pb
          FROM documents WHERE doc_id < 200
        )
      )
"""

_AUDIO_KNN_ORACLE = rf"""
    WITH s AS ({_SMP}),
    coef AS (
      SELECT doc_id,
             list_transform(generate_series(0, 63), i ->
               list_sum(list_transform(generate_series(0, 63), n ->
                 CASE WHEN bit_count(CAST(i AS BIGINT) & CAST(n AS BIGINT))
                           % 2 = 0
                      THEN smp[n + 1] ELSE -smp[n + 1] END))::BIGINT) AS c
      FROM s
    ),
    bands AS (
      SELECT doc_id,
             list_transform(generate_series(0, 15), b ->
               c[4 * b + 1] * c[4 * b + 1] + c[4 * b + 2] * c[4 * b + 2]
               + c[4 * b + 3] * c[4 * b + 3]
               + c[4 * b + 4] * c[4 * b + 4]) AS e
      FROM coef
    ),
    rel AS (
      SELECT doc_id,
             list_transform(e, x -> coalesce(
               x::DOUBLE / nullif(list_sum(e), 0)::DOUBLE, 0.0)) AS r
      FROM bands
    ),
    vec AS (
      SELECT doc_id,
             CASE WHEN sqrt(list_dot_product(r, r)) = 0 THEN r
                  ELSE list_transform(r,
                    x -> x / sqrt(list_dot_product(r, r))) END AS v
      FROM rel
    ),
    q AS (SELECT doc_id AS query_id, v AS qv FROM vec WHERE doc_id < 5),
    scored AS (
      SELECT q.query_id, c.doc_id AS id,
             round(list_dot_product(c.v, q.qv), 6) AS sim,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_dot_product(c.v, q.qv) DESC, c.doc_id ASC
             ) AS rank
      FROM vec c CROSS JOIN q
    )
    SELECT query_id, id, sim, rank::BIGINT AS rank
    FROM scored WHERE rank <= 5
"""


@query("audio_content_knn", _AUDIO_KNN_ORACLE)
def q_audio_content_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-based audio retrieval, hash-checked END TO END: one real
    PCM WAV per document → actual ``wave``-codec decode →
    Walsh-Hadamard sequency spectrum → 16 band energies (all
    integer-EXACT — see
    :func:`...multimodal.pipeline.audio_sequency_features` for why the
    WHT and not the rfft log-mel feeds the oracle-checked path) →
    relative band energies (correctly-rounded IEEE division of exact
    integers — identical doubles in any engine) → L2-normalize →
    exact top-5 kNN. This is the reference's query-by-audio shape
    (``audio_embedder.py:327-352``, J5) with the model forward replaced
    by a deterministic real-DSP front-end; the mod-40 clip groups are
    the planted structure retrieval recovers (same-group clips rank
    first — asserted in the pytest). The true log-mel front-end
    (:func:`...multimodal.pipeline.audio_mel_features`) drives the
    companion planted-retrieval pytest, since pocketfft's butterfly
    order is not SQL-replayable."""
    from multimodal_vector_db_spark.functions.vector import l2_normalize
    from multimodal_vector_db_spark.multimodal.pipeline import (
        audio_sequency_features,
    )
    from multimodal_vector_db_spark.operators.knn import knn_join

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    feats = audio_sequency_features(_afp_media(docs))
    rel = F.transform(
        F.col("bands"),
        lambda b: F.coalesce(
            F.try_divide(
                b.cast("double"), F.col("total").cast("double")
            ),
            F.lit(0.0),
        ),
    )
    corpus = feats.select(
        F.col("doc_id").alias("id"), l2_normalize(rel).alias("embedding")
    )
    queries = corpus.where(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = knn_join(corpus, queries, k=5)
    return out.select(
        "query_id",
        "id",
        F.round("sim", 6).alias("sim"),
        F.col("rank").cast("long").alias("rank"),
    )
