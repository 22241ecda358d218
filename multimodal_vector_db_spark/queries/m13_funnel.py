"""Round-7 capstone: the END-TO-END multimodal training-data funnel.

``multimodal_training_pipeline`` composes the per-modality gates that
rounds 4-6 oracle-checked in isolation — text exact dedup, image dHash
near-dup, audio energy-contour near-dup, video block-sum near-dup,
CLIP-score cross-modal consistency, source-reputation blocklisting,
per-source token-budget capping — into ONE declarative funnel with
per-stage survivor accounting. This is the reference's whole build
pipeline (``build_cross_modal_index.py:59-281``: scan → decode → embed
→ assemble → union) recast as what a 100 TB pretraining pipeline
actually runs between scan and train: curation.

Funnel contract (each stage filters the previous stage's survivors; a
document carries FOUR facets — text, one real P5 image, one real PCM
WAV clip, one real Y4M stream — and is dropped if ANY facet fails its
gate, the conservative LAION-style rule):

  stage 0  ingest            every document (doc_id < 200 — the id
                             range the deterministic media derivations
                             cover; production: the whole corpus)
  stage 1  text_exact_dedup  lowest-id survivor per normalized-text
                             fingerprint (md5, digest-keyed shuffle)
  stage 2  image_near_dedup  dropped iff a LOWER-id doc's dHash56 is
                             within Hamming 1 (banded join, real
                             netpbm decode — "matches anything already
                             admitted", the streaming-refresh rule
                             made deterministic by id order)
  stage 3  audio_near_dedup  same rule over the 15-bit energy-contour
                             fingerprint of the real WAV bytes
  stage 4  video_near_dedup  same rule over the 15-bit block-sum
                             contour of the real Y4M bytes
  stage 5  clip_score_gate   kept iff the (content, caption) cosine
                             ≥ 0.8 (every 4th pair deliberately
                             mismatched — the LAION/DataComp gate)
  stage 6  source_reputation sources whose surviving docs' mean token
                             count falls below 0.9× the global mean
                             are blocklisted and anti-joined out
  stage 7  budget_mix        temperature source mix (round 8; was a
                             uniform cap=1): per-source weights
                             ∝ sqrt(surviving tokens) (mT5/UNIMAX
                             T=2), Hamilton largest-remainder
                             apportionment of a 16-doc budget, each
                             source contributing its quota's
                             lowest-id docs — the mix rule a
                             production pretraining run uses

Output: one row per stage — ``(stage, stage_name, n_docs, n_tokens,
n_sources)`` — the funnel report every curation run publishes. Every
count is exact and integer, so the DuckDB oracle replays the ENTIRE
funnel (pixels → hash bits → pair joins → gate decisions → caps)
bit-for-bit.

Scale shape (the point of composing, not just reporting): every stage
is linear — digest/fingerprint aggregations, banded Hamming equi-joins
(never all-pairs), one broadcast blocklist, one per-source window. The
media facets are decoded ONCE into 7-15 byte fingerprints; stages 2-8
never touch media bytes again. The per-doc flag table is computed in
one pass and the two data-dependent stages (reputation, budget) operate
on the tiny per-source rollup. See SCALE_PROBE.json row
``multimodal_training_pipeline`` for the 16× wall ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._core import _t, query
from .m2_text_dedup import _TOKS
from .m12_curation4 import (
    _afp_media,
    _phash_media,
    _vts_media,
    afp_fp_subquery,
    phash_fp_subquery,
    vts_fp_subquery,
)

#: stage-7 TOTAL doc budget, Hamilton-apportioned across surviving
#: sources by temperature-T sampling weights (T=2 ⇒ sqrt — the
#: IEEE-exact case the oracle replays); round 8 replaced the round-7
#: uniform cap=1 with the mix rule a production run actually uses
#: (the `temperature_source_mix` machinery composed into the capstone)
_FUNNEL_BUDGET = 16
_FUNNEL_T = 2.0
_STAGES = [
    "ingest",
    "text_exact_dedup",
    "image_near_dedup",
    "audio_near_dedup",
    "video_near_dedup",
    "clip_score_gate",
    "source_reputation",
    "budget_mix",
]

# The three fingerprint derivations compose m12_curation4's
# _PHASH_HS / _AFP_FP / _VTS_FP fragments VERBATIM (nested-WITH
# derived tables, so they slot into one outer WITH block without
# CTE-name collisions) — one definition per derivation, the
# _UNI_BASE/_uni_viterbi_cte sharing pattern; the two oracles cannot
# drift.

_IM_FP = f"SELECT doc_id, h FROM {phash_fp_subquery()}"
_AU_FP = f"SELECT doc_id, h FROM {afp_fp_subquery()}"
_VI_FP = f"SELECT doc_id, h FROM {vts_fp_subquery()}"

# hashing-TF feature vector over a token list (m12's _HTF, restated)
_FN_HTF = r"""
      SELECT doc_id,
        list_transform(generate_series(0, 63),
          i -> len(list_filter(
            list_transform(toks,
              tk -> ('0x' || substring(md5(tk), 1, 8))::BIGINT % 64),
            bk -> bk = i))::DOUBLE) AS tf
"""

# The funnel CTE chain through the stage-7 survivor set, shared
# between the funnel report oracle below and m15's composed
# curated-training-batches oracle (which tokenizes the s7 survivors).
# The docs CTE is named ``fd`` (not ``t``) so the chain composes with
# the unigram family's _uni_base_over fragment without collisions.
_FUNNEL_CTES = rf"""fd AS (
      SELECT doc_id, source,
             {_TOKS.format(col="lower(text)")} AS toks,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id < 200
    ),
    tkeep AS (SELECT min(doc_id) AS doc_id FROM fd GROUP BY fp),
    im AS ({_IM_FP}),
    im_drop AS (
      SELECT DISTINCT b.doc_id FROM im b JOIN im a ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.h, b.h)) <= 1
    ),
    au AS ({_AU_FP}),
    au_drop AS (
      SELECT DISTINCT b.doc_id FROM au b JOIN au a ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.h, b.h)) <= 1
    ),
    vi AS ({_VI_FP}),
    vi_drop AS (
      SELECT DISTINCT b.doc_id FROM vi b JOIN vi a ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.h, b.h)) <= 1
    ),
    ch AS (SELECT doc_id, toks[1:(len(toks) + 1) // 2] AS toks FROM fd),
    cvf AS ({_FN_HTF} FROM fd),
    cvh AS ({_FN_HTF} FROM ch),
    cnf AS (
      SELECT doc_id,
        CASE WHEN sqrt(list_dot_product(tf, tf)) = 0 THEN tf
             ELSE list_transform(tf,
               x -> x / sqrt(list_dot_product(tf, tf))) END AS v
      FROM cvf
    ),
    cnh AS (
      SELECT doc_id,
        CASE WHEN sqrt(list_dot_product(tf, tf)) = 0 THEN tf
             ELSE list_transform(tf,
               x -> x / sqrt(list_dot_product(tf, tf))) END AS v
      FROM cvh
    ),
    ck AS (
      SELECT p.doc_id,
             CASE WHEN round(list_dot_product(a.v, b.v), 6) >= 0.8
                  THEN 1 ELSE 0 END AS kept
      FROM (SELECT doc_id,
                   CASE WHEN doc_id % 4 = 0 THEN doc_id + 1
                        ELSE doc_id END AS partner_id
            FROM fd) p
      JOIN cnf a ON a.doc_id = p.doc_id
      JOIN cnh b ON b.doc_id = p.partner_id
    ),
    flags AS (
      SELECT fd.doc_id, fd.source, len(fd.toks)::BIGINT AS ntok,
             CASE WHEN tk.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f1,
             CASE WHEN i.doc_id IS NULL THEN 1 ELSE 0 END AS f2,
             CASE WHEN a.doc_id IS NULL THEN 1 ELSE 0 END AS f3,
             CASE WHEN v.doc_id IS NULL THEN 1 ELSE 0 END AS f4,
             coalesce(ck.kept, 0) AS f5
      FROM fd
      LEFT JOIN tkeep tk ON tk.doc_id = fd.doc_id
      LEFT JOIN im_drop i ON i.doc_id = fd.doc_id
      LEFT JOIN au_drop a ON a.doc_id = fd.doc_id
      LEFT JOIN vi_drop v ON v.doc_id = fd.doc_id
      -- LEFT join: a doc whose mismatch partner is absent from the
      -- corpus cannot validate cross-modal consistency — it fails the
      -- clip GATE (f5=0) but must still count in the ingest stage
      LEFT JOIN ck ON ck.doc_id = fd.doc_id
    ),
    s5 AS (
      SELECT * FROM flags
      WHERE f1 = 1 AND f2 = 1 AND f3 = 1 AND f4 = 1 AND f5 = 1
    ),
    srcrep AS (
      SELECT source, sum(ntok)::BIGINT AS ssum, count(*)::BIGINT AS sn
      FROM s5 GROUP BY 1
    ),
    grep_ AS (
      SELECT sum(ssum)::BIGINT AS gsum, sum(sn)::BIGINT AS gn FROM srcrep
    ),
    blocked AS (
      SELECT source FROM srcrep, grep_
      WHERE ssum::DOUBLE / sn < 0.9 * (gsum::DOUBLE / gn)
    ),
    s6 AS (
      SELECT * FROM s5
      WHERE source NOT IN (SELECT source FROM blocked)
    ),
    -- stage 7: temperature-quota budget mix (mT5/UNIMAX rule, T=2):
    -- per-source weights ∝ sqrt(surviving tokens), ordered-fold
    -- normalization, Hamilton largest-remainder apportionment of the
    -- {_FUNNEL_BUDGET}-doc budget, each source contributing its
    -- quota's lowest-id docs
    s6w AS (
      SELECT source, sqrt(sum(ntok)::DOUBLE) AS sw FROM s6 GROUP BY 1
    ),
    s6tot AS (SELECT list_sum(list(sw ORDER BY source)) AS s FROM s6w),
    q0 AS (
      SELECT source,
             floor({_FUNNEL_BUDGET} * round(sw / s6tot.s, 6))::BIGINT
               AS base,
             {_FUNNEL_BUDGET} * round(sw / s6tot.s, 6)
               - floor({_FUNNEL_BUDGET} * round(sw / s6tot.s, 6)) AS rem
      FROM s6w, s6tot
    ),
    lo AS (SELECT {_FUNNEL_BUDGET} - sum(base)::BIGINT AS k FROM q0),
    rankedq AS (
      SELECT source, base, rem,
             row_number() OVER (ORDER BY rem DESC, source ASC) AS rr
      FROM q0
    ),
    quota AS (
      SELECT source,
             (base + CASE WHEN rr <= lo.k THEN 1 ELSE 0 END)::BIGINT
               AS quota
      FROM rankedq, lo
    ),
    s7 AS (
      SELECT x.doc_id FROM (
        SELECT doc_id, source,
               row_number() OVER (
                 PARTITION BY source ORDER BY doc_id) AS rn
        FROM s6
      ) x JOIN quota ON quota.source = x.source
      WHERE x.rn <= quota.quota
    )"""

_FUNNEL_ORACLE = rf"""
    WITH {_FUNNEL_CTES},
    reach AS (
      SELECT f.doc_id, f.source, f.ntok,
             CASE WHEN f.f1 = 0 THEN 0
                  WHEN f.f2 = 0 THEN 1
                  WHEN f.f3 = 0 THEN 2
                  WHEN f.f4 = 0 THEN 3
                  WHEN f.f5 = 0 THEN 4
                  WHEN f.source IN (SELECT source FROM blocked) THEN 5
                  WHEN f.doc_id NOT IN (SELECT doc_id FROM s7) THEN 6
                  ELSE 7 END AS reach
      FROM flags f
    ),
    stages(stage, stage_name) AS (
      VALUES (0, 'ingest'), (1, 'text_exact_dedup'),
             (2, 'image_near_dedup'), (3, 'audio_near_dedup'),
             (4, 'video_near_dedup'), (5, 'clip_score_gate'),
             (6, 'source_reputation'), (7, 'budget_mix')
    )
    SELECT s.stage::BIGINT AS stage, s.stage_name,
           count(r.doc_id)::BIGINT AS n_docs,
           coalesce(sum(r.ntok), 0)::BIGINT AS n_tokens,
           count(DISTINCT r.source)::BIGINT AS n_sources
    FROM stages s LEFT JOIN reach r ON r.reach >= s.stage
    GROUP BY 1, 2
"""


@query("multimodal_training_pipeline", _FUNNEL_ORACLE)
def q_multimodal_training_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The capstone funnel — see the module docstring for the stage
    contract. Every gate is the already-oracle-checked operator run in
    place: :func:`...dedup.dedup_keep_first`'s digest rule,
    :func:`...phash.near_dup_image_pairs` /
    :func:`...phash.banded_hamming_pairs` over the REAL decoded media
    bytes, :func:`...multimodal_filter.clip_score_filter`, the
    integer-ratio source-reputation rule of
    ``training_data_pipeline``, and a per-source budget window. The
    reference's build pipeline (``build_cross_modal_index.py:59-281``)
    is the scan→assemble skeleton of this flow; the curation stages
    are the 100 TB extension tier composed end to end."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return multimodal_funnel(
        docs,
        _phash_media(docs),
        _afp_media(docs),
        _vts_media(docs),
    )


def multimodal_funnel(
    docs: DataFrame,
    im_media: DataFrame,
    au_media: DataFrame,
    vi_media: DataFrame,
    budget: int = _FUNNEL_BUDGET,
    temperature: float = _FUNNEL_T,
) -> DataFrame:
    """The funnel core over an arbitrary documents frame plus its three
    media facets (``(doc_id, content binary)`` each) — the registered
    query binds the oracle-pinned derivations; scale probes feed
    replicated corpora with a scaled facet-group modulus.

    ``budget``/``temperature`` parameterize the stage-7 mix: sources
    are weighted ``(surviving tokens)^(1/T)`` and the total doc budget
    is Hamilton-apportioned across them. Only ``temperature=2.0``
    (sqrt — correctly-rounded IEEE in every engine) is oracle-
    replayable; other T values route through libm ``pow`` and are for
    production use, not hash checks."""
    flags, blocked, s7 = _funnel_frames(
        docs, im_media, au_media, vi_media, budget, temperature
    )
    spark = docs.sparkSession

    reach = (
        flags.join(F.broadcast(blocked), "source", "left")
        .join(s7, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "ntok",
            F.when(F.col("f1").isNull(), 0)
            .when(F.col("d2").isNotNull(), 1)
            .when(F.col("d3").isNotNull(), 2)
            .when(F.col("d4").isNotNull(), 3)
            .when(F.col("f5") == 0, 4)
            .when(F.col("b6").isNotNull(), 5)
            .when(F.col("k7").isNull(), 6)
            .otherwise(7)
            .alias("reach"),
        )
    )

    stage_names = F.array(*[F.lit(n) for n in _STAGES])
    stages = spark.range(len(_STAGES)).select(
        F.col("id").cast("long").alias("stage"),
        F.element_at(stage_names, F.col("id").cast("int") + 1).alias(
            "stage_name"
        ),
    )
    return (
        stages.join(
            reach, F.col("reach") >= F.col("stage"), "left"
        )
        .groupBy("stage", "stage_name")
        .agg(
            F.count("doc_id").cast("long").alias("n_docs"),
            F.coalesce(F.sum("ntok"), F.lit(0)).cast("long").alias(
                "n_tokens"
            ),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
    )


def funnel_survivor_ids(
    docs: DataFrame,
    im_media: DataFrame,
    au_media: DataFrame,
    vi_media: DataFrame,
    budget: int = _FUNNEL_BUDGET,
    temperature: float = _FUNNEL_T,
) -> DataFrame:
    """``(doc_id)`` frame of the funnel's terminal (stage-7) survivors
    — the curated corpus a downstream tokenizer/packer consumes (m15's
    ``curated_training_batches``)."""
    _flags, _blocked, s7 = _funnel_frames(
        docs, im_media, au_media, vi_media, budget, temperature
    )
    return s7.select("doc_id")


def _funnel_frames(
    docs: DataFrame,
    im_media: DataFrame,
    au_media: DataFrame,
    vi_media: DataFrame,
    budget: int,
    temperature: float,
) -> tuple:
    """The shared stage machinery: returns ``(flags, blocked, s7)`` —
    the per-doc gate-flag table (pinned), the broadcastable source
    blocklist, and the stage-7 survivor picks ``(doc_id, k7)``."""
    from multimodal_vector_db_spark.functions.text import (
        fingerprint,
        tokens,
    )
    from multimodal_vector_db_spark.multimodal.phash import (
        audio_fingerprints,
        banded_hamming_pairs,
        image_dhash,
        near_dup_image_pairs,
        video_signatures,
    )
    from multimodal_vector_db_spark.operators.multimodal_filter import (
        bucket_ids,
        clip_score_filter,
        hashing_tf_vectors,
    )

    spark = docs.sparkSession

    t = docs.select(
        "doc_id",
        "source",
        tokens(F.lower("text")).alias("toks"),
        fingerprint("text").alias("fp"),
    )

    # stage 1: lowest-id survivor per normalized-text digest
    tkeep = (
        t.groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(1).alias("f1"))
    )

    # stages 2-4: drop any doc with a LOWER-id near-dup facet — the
    # banded Hamming joins emit (doc_a < doc_b) pairs; doc_b is the
    # later arrival, exactly the streaming-admission drop rule
    def drop_marker(pairs: DataFrame, name: str) -> DataFrame:
        return (
            pairs.select(F.col("doc_b").alias("doc_id"))
            .distinct()
            .select("doc_id", F.lit(1).alias(name))
        )

    im_drop = drop_marker(
        near_dup_image_pairs(image_dhash(im_media), max_hamming=1),
        "d2",
    )
    au_drop = drop_marker(
        banded_hamming_pairs(
            audio_fingerprints(au_media),
            total_bits=15, n_bands=2, max_hamming=1, hash_col="afp",
        ),
        "d3",
    )
    vi_drop = drop_marker(
        banded_hamming_pairs(
            video_signatures(vi_media),
            total_bits=15, n_bands=2, max_hamming=1, hash_col="vts",
        ),
        "d4",
    )

    # stage 5: CLIP-score consistency (content = half-token crop of the
    # partner doc; every 4th pair deliberately mismatched)
    full = t.select("doc_id", bucket_ids(F.col("toks")).alias("bks"))
    half = t.select(
        "doc_id",
        bucket_ids(
            F.slice("toks", 1, ((F.size("toks") + 1) / 2).cast("int"))
        ).alias("bks"),
    )
    fv = hashing_tf_vectors(full, "bks").withColumnRenamed("doc_id", "id")
    hv = hashing_tf_vectors(half, "bks").withColumnRenamed("doc_id", "id")
    pairs = t.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.col("doc_id") + 1)
        .otherwise(F.col("doc_id"))
        .alias("partner_id"),
    )
    ck = clip_score_filter(pairs, fv, hv, threshold=0.8).select(
        "doc_id", F.col("kept").alias("f5")
    )

    flags = (
        t.select("doc_id", "source", F.size("toks").cast("long").alias("ntok"))
        .join(tkeep, "doc_id", "left")
        .join(im_drop, "doc_id", "left")
        .join(au_drop, "doc_id", "left")
        .join(vi_drop, "doc_id", "left")
        # LEFT: a doc whose mismatch partner is absent (id gaps in a
        # probe corpus) fails the clip GATE instead of silently
        # vanishing from every stage including ingest
        .join(ck, "doc_id", "left")
        .withColumn("f5", F.coalesce(F.col("f5"), F.lit(0)))
    )
    # flag table is one narrow row per doc and feeds FOUR consumers
    # (reputation rollup, budget window, reach, final agg) — pin it so
    # the fingerprint/clip subtrees run once, not once per consumer
    flags = flags.localCheckpoint(eager=True)

    s5 = flags.where(
        (F.col("f1") == 1)
        & F.col("d2").isNull()
        & F.col("d3").isNull()
        & F.col("d4").isNull()
        & (F.col("f5") == 1)
    )

    # stage 6: per-source reputation rollup (tiny) → broadcast blocklist
    srcrep = s5.groupBy("source").agg(
        F.sum("ntok").cast("long").alias("ssum"),
        F.count("*").cast("long").alias("sn"),
    )
    glob = srcrep.agg(
        F.sum("ssum").cast("long").alias("gsum"),
        F.sum("sn").cast("long").alias("gn"),
    )
    blocked = (
        srcrep.crossJoin(F.broadcast(glob))
        .where(
            F.col("ssum").cast("double") / F.col("sn")
            < 0.9 * (F.col("gsum").cast("double") / F.col("gn"))
        )
        .select("source", F.lit(1).alias("b6"))
    )

    # stage 7: temperature-quota budget mix — per-source weights
    # ∝ tokens^(1/T) over the stage-6 survivors, ordered-fold
    # normalization, Hamilton largest-remainder apportionment of the
    # total doc budget, each source keeping its quota's lowest ids.
    # Every frame below is n_sources rows (tiny): the single-partition
    # windows/folds are the same justified driver-bound tail as
    # temperature_source_mix (PLANS.md).
    s6 = s5.join(F.broadcast(blocked), "source", "left_anti")
    tokd = F.sum("ntok").cast("double")
    sw = (
        F.sqrt(tokd)
        if temperature == 2.0
        else F.pow(tokd, 1.0 / temperature)
    )
    s6w = s6.groupBy("source").agg(sw.alias("sw"))
    tot = s6w.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "sw"))),
                lambda s: s["sw"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s")
    )
    b = float(budget)
    w6 = F.round(F.col("sw") / F.col("s"), 6)
    q0 = s6w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(b * w6).cast("long").alias("base"),
        (b * w6 - F.floor(b * w6)).alias("rem"),
    )
    lo = q0.agg((F.lit(budget) - F.sum("base")).alias("k"))
    rankedq = q0.withColumn(
        "rr",
        F.row_number().over(
            Window.orderBy(F.col("rem").desc(), F.col("source").asc())
        ),
    )
    quota = rankedq.crossJoin(F.broadcast(lo)).select(
        "source",
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("k"), 1).otherwise(0)
        ).cast("long").alias("quota"),
    )
    s7 = (
        s6.select(
            "doc_id",
            "source",
            F.row_number()
            .over(Window.partitionBy("source").orderBy("doc_id"))
            .alias("rn"),
        )
        .join(F.broadcast(quota), "source")
        .where(F.col("rn") <= F.col("quota"))
        .select("doc_id", F.lit(1).alias("k7"))
    )
    return flags, blocked, s7
