"""Round-7 additions past the m13 capstone — serving, tokenizer,
budget, packing, eval and compliance tiers, every query hash-checked:

- ``audio_content_knn`` — content-based audio retrieval (the
  torch-free M5/J5 shape): real WAV decode → integer-exact
  Walsh-Hadamard sequency bands → exact kNN
- ``opq_adc_knn`` / ``opq_ivf_adc_knn`` — parametric OPQ rotation
  (Ge et al. CVPR 2013, persisted fixture) ahead of PQ/ADC and of the
  full residual-IVFADC stack (the FAISS "OPQ,IVF,PQ" factory string)
- ``unigram_prune_iteration`` — the SentencePiece vocab-size control,
  completing the seed → EM → prune → re-EM → apply training loop
- ``temperature_source_mix`` — mT5/UNIMAX temperature sampling with
  exact largest-remainder budget apportionment
- ``context_window_spans`` — GPT-style concat-with-EOD → fixed
  context-window packing with doc-span accounting
- ``bootstrap_map_diff`` — paired bootstrap significance test over
  two retrieval systems (md5-seeded resamples, order-statistic CI)
- ``pii_redaction_stats`` — the compliance scrub (emails/digit runs →
  placeholders) with planted PII and redacted-text digests
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._core import _t, query
from .m2_text_dedup import _TOKS
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


# ---------------------------------------------------------------------------
# OPQ: rotation-optimized product quantization (Ge et al., CVPR 2013)
# ---------------------------------------------------------------------------

import os as _os

_FIXTURES_DIR = _os.path.join(
    _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    ),
    "fixtures",
)


def _opq_rot_path(sf_dir: str) -> str:
    name = _os.path.basename(sf_dir.rstrip("/"))
    return _os.path.join(_FIXTURES_DIR, f"opq_rot_{name}.parquet")


def _rotated_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings rotated through the persisted OPQ fixture:
    ``(vec_id, embedding ARRAY<DOUBLE>)`` with every coordinate the
    sequential-fold ``x·v_j − μ·v_j`` (the pca_matryoshka_knn
    contract, bit-replayable by the oracles' ``coords``/``rvec``
    CTEs). Eagerly checkpointed — the 64-dot rotation subtree feeds
    codebook collects, query collects AND encode scans. A missing
    fixture is a setup error (``python tools/build_fixtures.py``);
    queries never write fixtures at run time."""
    from multimodal_vector_db_spark.functions.vector import dot

    rot_path = _opq_rot_path(sf_dir)
    if not _os.path.exists(rot_path):
        raise FileNotFoundError(
            f"missing persisted OPQ rotation fixture {rot_path}; run "
            f"`python tools/build_fixtures.py`"
        )
    basis = {
        r["comp"]: list(r["v"])
        for r in spark.read.parquet(rot_path).collect()
    }
    mean = basis[-1]
    d = len(mean)
    cols = [basis[j] for j in range(d)]
    mw = []
    for w in cols:
        acc = 0.0
        for a, b in zip(mean, w):
            acc += a * b
        mw.append(acc)

    def rotate(vec_col):
        return F.array(
            *[
                dot(vec_col, F.array(*[F.lit(x) for x in w])) - F.lit(m)
                for w, m in zip(cols, mw)
            ]
        )

    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", rotate(F.col("embedding")).alias("embedding")
    ).localCheckpoint(eager=True)


#: Oracle declared against the sf0.01 rotation fixture ONLY (each sf
#: has its own rotation) — the driver's correctness sf. The rotated
#: corpus then runs EXACTLY the pq_adc_knn oracle: data-derived
#: codebooks from rotated rows 100-103, query = rotated vec 0, ADC.
_OPQ_ADC_ORACLE = rf"""
    WITH basis AS (
      SELECT comp, v
      FROM read_parquet('{_FIXTURES_DIR}/opq_rot_sf0.01.parquet/*.parquet')
    ),
    m AS (SELECT v AS mv FROM basis WHERE comp = -1),
    comps AS (
      SELECT comp, v, list_dot_product(m.mv, v) AS mw
      FROM basis CROSS JOIN m WHERE comp >= 0
    ),
    coords AS (
      SELECT e.vec_id, c.comp,
             list_dot_product(e.embedding::DOUBLE[], c.v) - c.mw AS x
      FROM embeddings e CROSS JOIN comps c
    ),
    rvec AS (
      SELECT vec_id, list(x ORDER BY comp) AS emb FROM coords GROUP BY vec_id
    ),
    subs AS (SELECT unnest(generate_series(0, 3)) AS sub),
    cb AS (
      SELECT (r.vec_id - 100)::BIGINT AS code, s.sub,
             r.emb[s.sub*16+1 : s.sub*16+16] AS centroid
      FROM rvec r, subs s
      WHERE r.vec_id BETWEEN 100 AND 103
    ),
    q AS (
      SELECT s.sub, r.emb[s.sub*16+1 : s.sub*16+16] AS qsl
      FROM rvec r, subs s WHERE r.vec_id = 0
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
      SELECT r.vec_id, s.sub, r.emb[s.sub*16+1 : s.sub*16+16] AS sl
      FROM rvec r, subs s
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
"""


@query("opq_adc_knn", _OPQ_ADC_ORACLE)
def q_opq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ serving, hash-checked: rotate the corpus through the
    PERSISTED parametric-OPQ rotation (Ge et al. CVPR 2013 §4 —
    full-d PCA + eigenvalue-balanced subspace allocation, fitted once
    by tools/build_fixtures.py, committed as
    ``fixtures/opq_rot_<sf>.parquet``), then run the exact
    ``pq_adc_knn`` pipeline in the rotated space: data-derived
    codebooks (rotated rows 100-103), PQ-encode, driver-side ADC
    lookup table for the rotated query (vec 0), TakeOrderedAndProject
    top-10. Rotation coordinates use the ``x·v − μ·v`` sequential-fold
    contract (the ``pca_matryoshka_knn`` pattern), so every distance
    replays bit-for-bit in DuckDB. The oracle is valid at sf0.01 only
    (per-sf rotations); a missing fixture is a setup error
    (``python tools/build_fixtures.py``), never written at query time.
    Scale note: the per-row 64-dot rotation here is the oracle-
    transparent expression form; a 100 TB re-encode ships the
    Arrow-batched matmul (``projection_training.pca_project``) which
    computes the same values.

    bench_detail's ``opq`` section publishes the serving-quality point
    of this query: ADC recall@10 vs exact, OPQ vs plain PQ, same
    codebook budget."""
    from multimodal_vector_db_spark.operators.quantization import (
        adc_search,
        data_derived_codebooks,
        pq_encode,
    )

    rotated = _rotated_embeddings(spark, sf_dir)
    books = data_derived_codebooks(rotated, n_subquantizers=4, n_codes=4)
    qvec = [
        float(x)
        for x in rotated.where(F.col("vec_id") == 0)
        .select("embedding")
        .first()[0]
    ]
    coded = pq_encode(rotated.select("vec_id", "embedding"), books)
    return adc_search(coded, qvec, books, k=10)


# ---------------------------------------------------------------------------
# Unigram-LM vocabulary pruning — the SentencePiece size-control step
# ---------------------------------------------------------------------------

from .m11_curation3 import _UNI_BASE, _uni_viterbi_cte

_PRUNE_KEEP_MULTI = 16


@query(
    "unigram_prune_iteration",
    rf"""
    WITH RECURSIVE {_UNI_BASE},
    {_uni_viterbi_cte("rec", "probs", guard_nulls=False)},
    cnt1 AS (
      SELECT u.piece, sum(wf.freq)::BIGINT AS n
      FROM (SELECT w, seg1 FROM rec WHERE j = length(w)) b
      JOIN wfreq wf ON wf.w = b.w,
           UNNEST(b.seg1) AS u(piece)
      GROUP BY 1
    ),
    -- prune: chars always survive; multi-char pieces capped at the
    -- {_PRUNE_KEEP_MULTI} highest-count (count DESC, piece ASC)
    keepm AS (
      SELECT piece, n FROM cnt1 WHERE length(piece) > 1
      ORDER BY n DESC, piece ASC LIMIT {_PRUNE_KEEP_MULTI}
    ),
    kept AS (
      SELECT piece, n FROM cnt1 WHERE length(piece) = 1
      UNION ALL
      SELECT piece, n FROM keepm
    ),
    tot3 AS (SELECT sum(n)::DOUBLE AS s FROM kept),
    probs3 AS (SELECT piece, n / tot3.s AS p FROM kept, tot3),
    {_uni_viterbi_cte("rec3", "probs3", guard_nulls=True)},
    cnt3 AS (
      SELECT u.piece, sum(wf.freq)::BIGINT AS n
      FROM (SELECT w, seg1 FROM rec3 WHERE j = length(w)) b
      JOIN wfreq wf ON wf.w = b.w,
           UNNEST(b.seg1) AS u(piece)
      GROUP BY 1
    )
    SELECT piece, n FROM cnt3
    """,
)
def q_unigram_prune_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SentencePiece VOCAB-SIZE control under full hash check
    (Kudo 2018 §3.2 — the step between EM rounds that shrinks the
    inventory toward the target): seed model → Viterbi E-step → prune
    (chars always survive; multi-char pieces capped at the 16
    highest-count, deterministic ties) → renormalize survivors
    (exact integer ratios) → Viterbi E-step under the PRUNED model.
    With seed/E/EM-cycle/apply already hash-checked, the full
    SentencePiece training loop — seed → EM → prune → re-EM → apply —
    is now replayed end to end by the DuckDB oracle; pieces evicted by
    the prune re-segment through survivors via the COALESCEd lattice
    (the guard_nulls path). See operators/unigram_lm.py:
    prune_to_vocab."""
    from multimodal_vector_db_spark.operators.unigram_lm import (
        prune_to_vocab,
        seed_probs,
        viterbi_piece_counts,
        word_freqs,
    )

    docs = _t(spark, sf_dir, "documents")
    wf = word_freqs(docs).localCheckpoint(eager=True)  # two E-passes
    probs = seed_probs(wf)
    counts = viterbi_piece_counts(wf, probs).collect()
    probs3 = prune_to_vocab(counts, keep_multi=_PRUNE_KEEP_MULTI)
    return viterbi_piece_counts(wf, probs3).select("piece", "n")


# ---------------------------------------------------------------------------
# OPQ + IVFADC — the full FAISS "OPQ..,IVF..,PQ.." serving stack
# ---------------------------------------------------------------------------

from ._core import ORACLES as _ORACLES

#: the rotation CTEs shared by the OPQ oracles: project every embedding
#: through the committed sf0.01 rotation fixture → ``rvec(vec_id,
#: embedding DOUBLE[])``. The IVFADC replay below is the UNCHANGED
#: ``ann_ivf_adc_knn`` oracle re-pointed at ``rvec`` — the composition
#: is literally the existing end-to-end replay in the rotated space.
_OPQ_RVEC = rf"""basis AS (
      SELECT comp, v
      FROM read_parquet('{_FIXTURES_DIR}/opq_rot_sf0.01.parquet/*.parquet')
    ),
    m AS (SELECT v AS mv FROM basis WHERE comp = -1),
    comps AS (
      SELECT comp, v, list_dot_product(m.mv, v) AS mw
      FROM basis CROSS JOIN m WHERE comp >= 0
    ),
    coords AS (
      SELECT e.vec_id, c.comp,
             list_dot_product(e.embedding::DOUBLE[], c.v) - c.mw AS x
      FROM embeddings e CROSS JOIN comps c
    ),
    rvec AS (
      SELECT vec_id, list(x ORDER BY comp) AS embedding
      FROM coords GROUP BY vec_id
    )"""

_OPQ_IVF_ADC_SQL = (
    "WITH "
    + _OPQ_RVEC
    + ",\n    "
    + _ORACLES["ann_ivf_adc_knn"].split("WITH ", 1)[1].replace(
        "FROM embeddings", "FROM rvec"
    )
)
# Explicit raise, not `assert`: the invariant (every corpus scan of the
# spliced oracle re-pointed at the rotated CTE) must hold under
# `python -O` too — a silently un-replaced reference would yield a
# running but WRONG oracle.
if "FROM embeddings" in _OPQ_IVF_ADC_SQL.split("rvec AS", 1)[1]:
    raise RuntimeError(
        "opq_ivf_adc_knn oracle splice failed: an un-replaced "
        "'FROM embeddings' survives after the rvec CTE — the "
        "ann_ivf_adc_knn oracle text changed shape; update _OPQ_RVEC "
        "composition in m14_serving2.py"
    )


@query("opq_ivf_adc_knn", _OPQ_IVF_ADC_SQL)
def q_opq_ivf_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full FAISS-style compressed-ANN stack — ``OPQ + IVF + PQ``
    (the index-factory string "OPQ64,IVF,PQ4" shape) under hash check:
    rotate the corpus through the persisted parametric-OPQ fixture,
    then run the UNCHANGED residual-IVFADC pipeline in the rotated
    space — coarse cells from fixed rotated rows 200-207, 4×4
    data-derived residual codebooks (rotated rows 100-103), nprobe=2,
    per-(query, cell) residual lookup tables, ADC top-5. The oracle is
    the ``ann_ivf_adc_knn`` end-to-end replay verbatim, re-pointed at
    the rotated CTE — every coarse assignment, residual, code and
    distance replays bit-for-bit. Oracle valid at sf0.01 (per-sf
    rotation fixture), like the other OPQ/PCA queries."""
    from multimodal_vector_db_spark.operators.ann import (
        ivf_adc_build,
        ivf_adc_search,
    )
    from multimodal_vector_db_spark.operators.quantization import (
        data_derived_codebooks,
    )

    rotated = _rotated_embeddings(spark, sf_dir)
    centroids = [
        r["embedding"]
        for r in rotated.where(
            (F.col("vec_id") >= 200) & (F.col("vec_id") < 208)
        ).orderBy("vec_id").select("embedding").collect()
    ]
    books = data_derived_codebooks(rotated, n_subquantizers=4, n_codes=4)
    index = ivf_adc_build(
        rotated.select(F.col("vec_id").alias("id"), "embedding"),
        centroids,
        books,
    )
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in rotated.where(F.col("vec_id") < 5)
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    ]
    out = ivf_adc_search(index, queries, centroids, books, k=5, nprobe=2)
    return out.select(
        "query_id", "id", "adc_dist", F.col("rank").cast("long").alias("rank")
    )


# ---------------------------------------------------------------------------
# Temperature-based source mixing — the mT5/UNIMAX sampling rule
# ---------------------------------------------------------------------------

_MIX_BUDGET = 60  # total docs the mixed corpus may draw


@query(
    "temperature_source_mix",
    rf"""
    WITH t AS (
      SELECT doc_id, source,
             len({_TOKS.format(col="lower(text)")})::BIGINT AS ntok
      FROM documents
    ),
    src AS (
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(ntok)::BIGINT AS n_toks
      FROM t GROUP BY 1
    ),
    w AS (SELECT source, sqrt(n_toks::DOUBLE) AS sw FROM src),
    tot AS (
      SELECT list_sum(list(sw ORDER BY source)) AS s FROM w
    ),
    wt AS (SELECT source, round(sw / tot.s, 6) AS w6 FROM w, tot),
    q0 AS (
      SELECT source, w6,
             floor({_MIX_BUDGET} * w6)::BIGINT AS base,
             {_MIX_BUDGET} * w6 - floor({_MIX_BUDGET} * w6) AS rem
      FROM wt
    ),
    lo AS (SELECT {_MIX_BUDGET} - sum(base)::BIGINT AS k FROM q0),
    ranked AS (
      SELECT source, w6, base, rem,
             row_number() OVER (ORDER BY rem DESC, source ASC) AS rr
      FROM q0
    ),
    quota AS (
      SELECT source, w6,
             (base + CASE WHEN rr <= lo.k THEN 1 ELSE 0 END)::BIGINT
               AS quota
      FROM ranked, lo
    ),
    picked AS (
      SELECT x.source, count(*)::BIGINT AS picked_docs,
             sum(x.ntok)::BIGINT AS picked_tokens
      FROM (
        SELECT t.source, t.ntok,
               row_number() OVER (
                 PARTITION BY t.source ORDER BY t.doc_id) AS rn
        FROM t
      ) x
      JOIN quota ON quota.source = x.source
      WHERE x.rn <= quota.quota
      GROUP BY 1
    )
    SELECT s.source, s.n_docs, s.n_toks, q.w6, q.quota,
           coalesce(p.picked_docs, 0)::BIGINT AS picked_docs,
           coalesce(p.picked_tokens, 0)::BIGINT AS picked_tokens
    FROM src s
    JOIN quota q ON q.source = s.source
    LEFT JOIN picked p ON p.source = s.source
    """,
)
def q_temperature_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing — the multilingual/multi-source
    sampling rule of mT5 / UNIMAX (sample source i with probability
    ``∝ n_i^(1/T)``; here T=2, i.e. ``sqrt`` — chosen deliberately so
    the weight arithmetic is IEEE-correctly-rounded in ANY engine, no
    libm ``pow`` exposure) with EXACT largest-remainder (Hamilton)
    apportionment of a 60-doc budget: floor quotas + the remainder
    ranking hand out every leftover seat deterministically (remainder
    DESC, source ASC). Each source then contributes its quota's
    lowest-id docs. The weight total is an ORDERED fold (list_sum over
    source-sorted weights / the same sequential fold on the Spark
    side) so the float sum is engine-identical; quotas and token
    accounting are integers. Completes the budget tier next to
    `source_mixing` / the funnel's uniform cap — this is the
    temperature knob production mixes actually use."""
    from multimodal_vector_db_spark.functions.text import tokens
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.lower("text"))).cast("long").alias("ntok"),
    )
    src = t.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("ntok").cast("long").alias("n_toks"),
    )
    w = src.select(
        "source", "n_docs", "n_toks",
        F.sqrt(F.col("n_toks").cast("double")).alias("sw"),
    )
    # ordered fold: source-sorted sequential sum, the oracle's
    # list_sum(list(sw ORDER BY source)) bit-for-bit
    tot = w.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "sw"))),
                lambda s: s["sw"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s")
    )
    # the per-source table is tiny; pin it once for its consumers
    wt = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs", "n_toks",
            F.round(F.col("sw") / F.col("s"), 6).alias("w6"),
        )
        .localCheckpoint(eager=True)
    )
    b = float(_MIX_BUDGET)
    q0 = wt.select(
        "source", "n_docs", "n_toks", "w6",
        F.floor(b * F.col("w6")).cast("long").alias("base"),
        (b * F.col("w6") - F.floor(b * F.col("w6"))).alias("rem"),
    )
    lo = q0.agg((F.lit(_MIX_BUDGET) - F.sum("base")).alias("k"))
    ranked = q0.withColumn(
        "rr",
        F.row_number().over(
            Window.orderBy(F.col("rem").desc(), F.col("source").asc())
        ),
    )
    quota = ranked.crossJoin(F.broadcast(lo)).select(
        "source", "n_docs", "n_toks", "w6",
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("k"), 1).otherwise(0)
        ).cast("long").alias("quota"),
    )
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy("doc_id")
    )
    picked = (
        t.withColumn("rn", rn)
        .join(F.broadcast(quota.select("source", "quota")), "source")
        .where(F.col("rn") <= F.col("quota"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("picked_docs"),
            F.sum("ntok").cast("long").alias("picked_tokens"),
        )
    )
    return quota.join(picked, "source", "left").select(
        "source", "n_docs", "n_toks", "w6", "quota",
        F.coalesce("picked_docs", F.lit(0)).cast("long").alias(
            "picked_docs"
        ),
        F.coalesce("picked_tokens", F.lit(0)).cast("long").alias(
            "picked_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# Context-window sequence packing — corpus → training batches
# ---------------------------------------------------------------------------

_CTX_W = 256


@query(
    "context_window_spans",
    rf"""
    WITH t AS (
      -- coalesce mirrors the Spark operator's greatest/coalesce clamp
      -- (packing.py): a NULL-text doc still contributes its EOD token
      SELECT doc_id,
             (coalesce(len({_TOKS.format(col="lower(text)")}), 0) + 1)
               ::BIGINT AS len1
      FROM documents
    ),
    cum AS (
      SELECT doc_id,
             (sum(len1) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - len1)::BIGINT AS start_,
             (sum(len1) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
               AS end_
      FROM t
    ),
    tot AS (SELECT max(end_) AS n FROM cum),
    spans AS (
      SELECT doc_id, u.window_id
      FROM cum,
           UNNEST(generate_series(start_ // {_CTX_W},
                                  (end_ - 1) // {_CTX_W})) AS u(window_id)
    )
    SELECT window_id::BIGINT AS window_id,
           count(*)::BIGINT AS n_docs,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc,
           least({_CTX_W}, tot.n - window_id * {_CTX_W})::BIGINT
             AS n_tokens
    FROM spans, tot
    GROUP BY window_id, tot.n
    """,
)
def q_context_window_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing under hash check: concatenate the
    corpus in doc_id order with one EOD token per document, split into
    fixed 256-token context windows, and account per window which
    documents it spans (docs straddle windows — the real training-batch
    geometry, unlike shard packing's whole-doc placement). Exact
    integer arithmetic: cumulative offsets, a bounded explode of each
    doc over ⌈len/W⌉ windows, one window_id groupBy. See
    operators/packing.py:context_window_spans for the 100 TB note
    (compose after pack_shards so the cumsum is per-shard)."""
    from multimodal_vector_db_spark.operators.packing import (
        context_window_spans,
    )

    return context_window_spans(
        _t(spark, sf_dir, "documents"), window=_CTX_W
    )


# ---------------------------------------------------------------------------
# Paired bootstrap significance test — the eval-tier calibration piece
# ---------------------------------------------------------------------------

from .m3_metrics_compression import _AP_SQL, _RANKINGS_CTE

_BOOT_M = 200  # resamples
_BOOT_N = 20   # queries (vec_id 0..19, so ids index the diff list)


@query(
    "bootstrap_map_diff",
    rf"""
    WITH {_RANKINGS_CTE},
    eb AS (
      SELECT vec_id, embedding[1:16]::DOUBLE[] AS v FROM embeddings
    ),
    nb AS (
      SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v
      FROM eb
    ),
    qb AS (
      SELECT vec_id AS query_id, v AS qv FROM nb WHERE vec_id < {_BOOT_N}
    ),
    ranked_b AS (
      SELECT qb.query_id, nb.vec_id AS id,
             row_number() OVER (
               PARTITION BY qb.query_id
               ORDER BY list_dot_product(nb.v, qb.qv) DESC, nb.vec_id ASC
             ) AS rank
      FROM nb, qb
    ),
    retr_b AS (
      SELECT query_id, list(id ORDER BY rank) AS retrieved
      FROM ranked_b WHERE rank <= 10 GROUP BY query_id
    ),
    ap_a AS (SELECT query_id, {_AP_SQL} AS ap FROM rr),
    rr_b AS (
      SELECT retr_b.query_id, retr_b.retrieved, rel.relevant
      FROM retr_b JOIN rel ON rel.query_id = retr_b.query_id
    ),
    ap_b AS (SELECT query_id, {_AP_SQL} AS ap FROM rr_b),
    diffs AS (
      SELECT a.query_id, round(a.ap - b.ap, 6) AS d
      FROM ap_a a JOIN ap_b b ON a.query_id = b.query_id
    ),
    dl AS (SELECT list(d ORDER BY query_id) AS ds FROM diffs),
    means AS (
      SELECT b,
             round(list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(generate_series(0, {_BOOT_N} - 1), i ->
                 dl.ds[(('0x' || substring(md5(b::VARCHAR || '_'
                         || i::VARCHAR), 1, 8))::BIGINT % {_BOOT_N}) + 1])),
               (x, y) -> x + y) / {_BOOT_N}.0, 6) AS m
      FROM UNNEST(generate_series(0, {_BOOT_M} - 1)) AS t(b), dl
    ),
    stats AS (
      SELECT
        round(list_reduce(list_prepend(0.0::DOUBLE, list(m ORDER BY b)),
          (x, y) -> x + y) / {_BOOT_M}.0, 6) AS mean_diff,
        list_sort(list(m))[{_BOOT_M} // 40 + 1] AS ci_lo,
        list_sort(list(m))[{_BOOT_M} - {_BOOT_M} // 40] AS ci_hi,
        round(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END)::DOUBLE
              / {_BOOT_M}.0, 6) AS frac_positive
      FROM means
    )
    SELECT mean_diff, ci_lo, ci_hi, frac_positive FROM stats
    """,
)
def q_bootstrap_map_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired bootstrap significance test for retrieval quality — the
    standard way to decide whether system A (exact full-dim kNN)
    really beats system B (Matryoshka 16-dim prefix) or the MAP gap is
    query-sampling noise (Sakai SIGIR 2006 / the IR-eval staple). Per
    query: AP under both systems against the same same-label ground
    truth; 200 deterministic bootstrap resamples of the 20-query set
    (resample indices are md5-derived — seeded randomness as data, the
    repo's standard trick); per-resample mean AP-difference; report
    the mean difference, the exact 2.5%/97.5% order-statistic CI, and
    the fraction of resamples favoring A. Every arithmetic step is the
    rounded sequential-fold canon, so the whole test — rankings, APs,
    resampling, CI — replays bit-for-bit in DuckDB."""
    from multimodal_vector_db_spark.functions.vector import (
        slice_renormalize,
    )
    from multimodal_vector_db_spark.operators.knn import knn_join
    from multimodal_vector_db_spark.operators.metrics import (
        average_precision,
        rankings_from_knn,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus_a = emb.select(F.col("vec_id").alias("id"), "embedding")
    qs_a = emb.where(F.col("vec_id") < _BOOT_N).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    sliced = emb.select(
        "vec_id", slice_renormalize("embedding", 16).alias("v")
    )
    corpus_b = sliced.select(
        F.col("vec_id").alias("id"), F.col("v").alias("embedding")
    )
    qs_b = sliced.where(F.col("vec_id") < _BOOT_N).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q_emb")
    )
    relevant = (
        emb.where(F.col("vec_id") < _BOOT_N)
        .select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql"))
        .join(emb.select("vec_id", "label"), F.col("ql") == F.col("label"))
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list("vec_id")).alias("relevant"))
    )

    def ap_of(corpus, qs):
        retr = rankings_from_knn(knn_join(corpus, qs, k=10))
        return retr.join(relevant, "query_id").select(
            "query_id",
            F.round(
                average_precision(F.col("retrieved"), F.col("relevant")), 6
            ).alias("ap"),
        )

    diffs = (
        ap_of(corpus_a, qs_a)
        .join(
            ap_of(corpus_b, qs_b).withColumnRenamed("ap", "ap_b"),
            "query_id",
        )
        .select(
            "query_id",
            F.round(F.col("ap") - F.col("ap_b"), 6).alias("d"),
        )
    )
    ds = [
        float(r["d"]) for r in diffs.orderBy("query_id").collect()
    ]  # 20 canon-rounded doubles, ordered by query_id
    d_lit = F.array(*[F.lit(x) for x in ds])
    means = (
        spark.range(_BOOT_M)
        .select(F.col("id").alias("b"))
        .select(
            "b",
            F.round(
                F.aggregate(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(_BOOT_N - 1)),
                        lambda i: F.element_at(
                            d_lit,
                            (
                                F.conv(
                                    F.substring(
                                        F.md5(
                                            F.concat(
                                                F.col("b").cast("string"),
                                                F.lit("_"),
                                                i.cast("string"),
                                            )
                                        ),
                                        1,
                                        8,
                                    ),
                                    16,
                                    10,
                                ).cast("long")
                                % _BOOT_N
                                + 1
                            ).cast("int"),
                        ),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / float(_BOOT_N),
                6,
            ).alias("m"),
        )
    )
    lo_i, hi_i = _BOOT_M // 40 + 1, _BOOT_M - _BOOT_M // 40
    return means.agg(
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("b", "m"))),
                    lambda s: s["m"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / float(_BOOT_M),
            6,
        ).alias("mean_diff"),
        F.element_at(F.array_sort(F.collect_list("m")), lo_i).alias("ci_lo"),
        F.element_at(F.array_sort(F.collect_list("m")), hi_i).alias("ci_hi"),
        F.round(
            F.sum(F.when(F.col("m") > 0, 1).otherwise(0)).cast("double")
            / float(_BOOT_M),
            6,
        ).alias("frac_positive"),
    )


# ---------------------------------------------------------------------------
# PII redaction — the compliance pass every released corpus runs
# ---------------------------------------------------------------------------

#: Regexes restricted to the RE2 ∩ java.util.regex common subset
#: (character classes, +, {m,}) so both engines match identically.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_DIGITS = r"[0-9]{7,}"


@query(
    "pii_redaction_stats",
    rf"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' contact user' || doc_id::VARCHAR
                       || '@example.com or call 55512' || doc_id::VARCHAR
                       || '99 now'
                  ELSE text END AS text
      FROM documents
    ),
    r AS (
      SELECT doc_id, text,
             regexp_replace(
               regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_DIGITS}', '<NUM>', 'g') AS cleaned
      FROM t
    )
    SELECT doc_id,
           (length(text)
             - length(regexp_replace(text, '{_PII_EMAIL}', '', 'g')))
             ::BIGINT AS email_chars,
           len(regexp_extract_all(text, '{_PII_EMAIL}'))::BIGINT
             AS n_emails,
           len(regexp_extract_all(
             regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_DIGITS}'))::BIGINT AS n_digit_runs,
           length(cleaned)::BIGINT AS n_chars_cleaned,
           md5(cleaned) AS cleaned_md5
    FROM r
    """,
)
def q_pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every released pretraining
    corpus runs (emails and long digit runs → placeholder tokens; the
    C4/RefinedWeb-style scrub). The synthetic docs carry no PII, so
    every 3rd document gets a deterministic planted email + number
    (identical derivation in both engines) and the query reports, per
    doc, matched-span accounting and the md5 of the REDACTED text — a
    regex-dialect or replacement-order bug breaks the hash. Patterns
    are restricted to the RE2 ∩ java.util.regex common subset so both
    engines match the same spans; one JVM-side projection, no shuffle
    (the 100 TB shape: redaction is map-only)."""
    docs = _t(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 55512"),
            F.col("doc_id").cast("string"),
            F.lit("99 now"),
        ),
    ).otherwise(F.col("text"))
    t = docs.select("doc_id", planted.alias("text"))
    no_email = F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>")
    cleaned = F.regexp_replace(no_email, _PII_DIGITS, "<NUM>")
    return t.select(
        "doc_id",
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), _PII_EMAIL, ""))
        ).cast("long").alias("email_chars"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(_PII_DIGITS), 0))
        .cast("long")
        .alias("n_digit_runs"),
        F.length(cleaned).cast("long").alias("n_chars_cleaned"),
        F.md5(cleaned).alias("cleaned_md5"),
    )
