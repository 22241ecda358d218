"""ANN accelerators, cross-modal routing, BM25 + dedup clustering.

Split from the original queries.py (2622-3433); body text unchanged.
Registration order inside this module is preserved; the package
__init__ manifest preserves inter-module order. The driver checks
the FIRST 50 registered queries — see tests/test_registry_window.py.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.vector import dot
from multimodal_vector_db_spark.operators.knn import (
    knn_join,
    knn_search,
    top_k_per_group,
)

from ._core import ORACLES, REGISTRY, _csv_doubles, _csv_longs, _t, query

# ANN accelerators (SURVEY §4: the Spark-idiomatic replacement for HNSW)
# ---------------------------------------------------------------------------


@query(
    "ann_lsh_knn",
    """
    WITH hp AS (
      SELECT vec_id AS hid, embedding::DOUBLE[] AS hv
      FROM embeddings WHERE vec_id < 4
    ),
    b AS (
      SELECT e.vec_id, e.embedding,
             sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], hp.hv) >= 0
                 THEN (1 << hp.hid) ELSE 0 END)::BIGINT AS bucket
      FROM embeddings e CROSS JOIN hp
      GROUP BY e.vec_id, e.embedding
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS q_emb, bucket
      FROM b WHERE vec_id < 10
    ),
    scored AS (
      SELECT q.query_id, b.vec_id AS id,
             list_dot_product(b.embedding::DOUBLE[], q.q_emb::DOUBLE[]) AS sim
      FROM b JOIN q ON b.bucket = q.bucket
    ),
    ranked AS (
      SELECT query_id, id, sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, id ASC) AS rank
      FROM scored
    )
    SELECT query_id, id, sim, rank::BIGINT AS rank FROM ranked WHERE rank <= 5
    """,
)
def q_ann_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN: sign-pattern bucket (4 fixed
    hyperplanes) → bucket equi-join → per-query top-5. The scale path:
    with the corpus stored partitionBy(bucket), this is partition
    pruning — each query touches ~1/16 of the data."""
    from multimodal_vector_db_spark.operators.ann import (
        add_hyperplane_buckets,
        lsh_bucket_knn,
    )

    emb = _t(spark, sf_dir, "embeddings")
    hyperplanes = [
        r["embedding"]
        for r in emb.where(F.col("vec_id") < 4)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = lsh_bucket_knn(
        emb.select(F.col("vec_id").alias("id"), "embedding"),
        queries,
        hyperplanes,
        k=5,
    )
    return out.select(
        "query_id", "id", "sim", F.col("rank").cast("long").alias("rank")
    )


@query(
    "ann_ivf_fixed_knn",
    """
    WITH cent AS (
      SELECT (vec_id - 200)::BIGINT AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id BETWEEN 200 AND 207
    ),
    scored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             list_dot_product(e.embedding::DOUBLE[], c.cv) AS sim
      FROM embeddings e CROSS JOIN cent c
    ),
    asg AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rn
        FROM scored) WHERE rn = 1
    ),
    qprobe AS (
      SELECT vec_id AS query_id, embedding AS q_emb, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rn
        FROM scored WHERE vec_id < 10) WHERE rn <= 2
    ),
    cand AS (
      SELECT q.query_id, a.vec_id AS id,
             list_dot_product(a.embedding::DOUBLE[], q.q_emb::DOUBLE[]) AS sim
      FROM asg a JOIN qprobe q ON a.cid = q.cid
    ),
    ranked AS (
      SELECT query_id, id, sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, id ASC) AS rank
      FROM cand
    )
    SELECT query_id, id, sim, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def q_ann_ivf_fixed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with deterministic data-derived centroids (corpus rows
    200-207), fully oracle-checked: assignment (max-dot, ties → highest
    cid), nprobe=2 probing, cluster-pruned top-5. Same plan as the
    KMeans-trained variant — only the quantizer fit differs (and at
    scale the corpus is partitionBy(cluster_id), making the probe a
    partition-pruned scan)."""
    from multimodal_vector_db_spark.operators.ann import ivf_assign, ivf_search

    emb = _t(spark, sf_dir, "embeddings")
    centroids = [
        r["embedding"]
        for r in emb.where(
            (F.col("vec_id") >= 200) & (F.col("vec_id") < 208)
        ).orderBy("vec_id").select("embedding").collect()
    ]
    corpus = emb.select(F.col("vec_id").alias("id"), "embedding")
    assigned = ivf_assign(corpus, centroids)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = ivf_search(assigned, queries, centroids, k=5, nprobe=2)
    return out.select(
        "query_id", "id", "sim", F.col("rank").cast("long").alias("rank")
    )


@query(
    "json_extract_stats",
    """
    SELECT event_type,
           count(*)::BIGINT AS n,
           sum(CASE WHEN json_extract_string(props, '$.k')::BIGINT > 50
                    THEN 1 ELSE 0 END)::BIGINT AS n_high,
           round(avg(json_extract_string(props, '$.k')::BIGINT), 6) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def q_json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props: JSON path extraction inside aggregation —
    the schemaless-metadata escape hatch (the reference's metadata dicts,
    vector_index.py:24) queried relationally."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(k > 50, 1).otherwise(0)).cast("long").alias("n_high"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )


#: committed MLlib-KMeans centroid fixture (tools/build_fixtures.py) —
#: the fit/serve split that closes the last rows-only ANN entry: the
#: KMeans FIT stays recall-validated (tests/test_ann.py), while
#: assignment + nprobe'd search through the PERSISTED centroids is
#: exact relational arithmetic both engines replay bit-for-bit. Oracle
#: declared for the sf0.01 correctness gate only (each sf has its own
#: fixture, like pca_basis).
_IVF_FIXTURES_DIR = _os.path.join(
    _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    ),
    "fixtures",
)


@query(
    "ann_ivf_knn",
    f"""
    WITH cent AS (
      SELECT cluster_id AS cid, v AS cv, list_dot_product(v, v) AS cc
      FROM read_parquet(
        '{_IVF_FIXTURES_DIR}/ivf_centroids_sf0.01.parquet/*.parquet')
    ),
    xd AS (
      SELECT vec_id, embedding,
             list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS xx
      FROM embeddings
    ),
    scored AS (
      SELECT x.vec_id, x.embedding, c.cid,
             x.xx - 2 * list_dot_product(x.embedding::DOUBLE[], c.cv) + c.cc
               AS d
      FROM xd x CROSS JOIN cent c
    ),
    asg AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY d ASC, cid DESC) AS rn
        FROM scored) WHERE rn = 1
    ),
    qprobe AS (
      SELECT vec_id AS query_id, embedding AS q_emb, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY d ASC, cid DESC) AS rn
        FROM scored WHERE vec_id < 10) WHERE rn <= 2
    ),
    cand AS (
      SELECT q.query_id, a.vec_id AS id,
             list_dot_product(a.embedding::DOUBLE[], q.q_emb::DOUBLE[]) AS sim
      FROM asg a JOIN qprobe q ON a.cid = q.cid
    ),
    ranked AS (
      SELECT query_id, id, sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, id ASC) AS rank
      FROM cand
    )
    SELECT query_id, id, sim, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def q_ann_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the TRAINED (MLlib KMeans, 8 clusters, seed 42)
    coarse quantizer, fully hash-checked (round 10): the fit is
    persisted once by ``tools/build_fixtures.py`` as a committed
    centroid fixture, and this query replays assignment + probing +
    cluster-pruned top-5 through it. Assignment uses the MLlib L2 rule
    the engine's serving path uses (``nearest_centroid(metric="l2")``
    semantics: min distance, ties → higher cid), with the distance
    decomposed as ``x·x − 2·x·c + c·c`` on the sequential-fold dot
    contract so the DuckDB oracle matches bit-for-bit. Queries probe
    their nprobe=2 nearest cells by the same rule; candidates score
    with the exact dot. (Reference: IVF serving over a trained
    quantizer, quantization.py:28-57 fit + vector_index.py search; the
    live-fit variant of this plan is the engine's ``build_ann_index``
    route, recall-validated in tests/test_ann.py.) The oracle is valid
    at sf0.01 only — each sf has its own committed fixture; a missing
    fixture is a setup error fixed by ``python
    tools/build_fixtures.py``."""
    fix = _os.path.join(
        _IVF_FIXTURES_DIR,
        f"ivf_centroids_{_os.path.basename(sf_dir.rstrip('/'))}.parquet",
    )
    if not _os.path.exists(fix):
        raise FileNotFoundError(
            f"ann_ivf_knn: missing IVF centroid fixture {fix}; run "
            "`python tools/build_fixtures.py` (queries never write "
            "fixtures at run time)"
        )
    cent = sorted(
        (int(r["cluster_id"]), list(r["v"]))
        for r in spark.read.parquet(fix).collect()
    )
    # c·c driver-side with the same sequential left-to-right fold the
    # oracle's list_dot_product uses (Python float IS IEEE double)
    cc = []
    for _, v in cent:
        acc = 0.0
        for a in v:
            acc += a * a
        cc.append(acc)

    emb = _t(spark, sf_dir, "embeddings")
    xx = dot("embedding", "embedding")

    def dist_pairs():
        # (−d, cid) structs: array_max picks min distance, ties → the
        # HIGHER cid — the same rule as the SQL (d ASC, cid DESC)
        return F.array(
            *[
                F.struct(
                    (
                        -(
                            (
                                xx
                                - F.lit(2.0)
                                * dot(
                                    "embedding",
                                    F.array(*[F.lit(x) for x in v]),
                                )
                            )
                            + F.lit(ccj)
                        )
                    ).alias("nd"),
                    F.lit(cid).alias("cid"),
                )
                for (cid, v), ccj in zip(cent, cc)
            ]
        )

    assigned = emb.select(
        F.col("vec_id").alias("id"),
        "embedding",
        F.array_max(dist_pairs())["cid"].alias("cid"),
    )
    probes = (
        emb.where(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(
                F.transform(
                    F.slice(F.reverse(F.array_sort(dist_pairs())), 1, 2),
                    lambda s: s["cid"],
                )
            ).alias("cid"),
        )
    )
    cand = assigned.join(F.broadcast(probes), "cid").select(
        "query_id", "id", dot("embedding", "q_emb").alias("sim")
    )
    out = top_k_per_group(cand, ["query_id"], k=5)
    return out.select(
        "query_id", "id", "sim", F.col("rank").cast("long").alias("rank")
    )


# ---------------------------------------------------------------------------
# Cross-modal routing — the system's signature query (SURVEY §3.3)
# ---------------------------------------------------------------------------


@query(
    "cross_modal_routed",
    """
    WITH m AS (
      SELECT vec_id, embedding,
             (['image','video','audio','text'])[(label % 4) + 1] AS modality
      FROM embeddings
    ),
    qc AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
    qa AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 1),
    scored AS (
      SELECT m.vec_id AS id, m.modality,
             CASE WHEN m.modality = 'audio'
                  THEN list_dot_product(m.embedding::DOUBLE[], qa.v)
                  ELSE list_dot_product(m.embedding::DOUBLE[], qc.v)
             END AS sim
      FROM m, qc, qa
    ),
    ranked AS (
      SELECT modality, id, sim,
             row_number() OVER (
               PARTITION BY modality ORDER BY sim DESC, id ASC) AS rank
      FROM scored
    )
    SELECT modality, id, sim, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def q_cross_modal_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 compare_modalities as ONE plan: dual-space query vectors
    (CLIP for image/video/text, CLAP for audio) routed by modality,
    then top-k per modality — replacing the reference's two k=10000
    over-fetch searches + Python routing (search_cross_modal.py:107-173)
    with a single scan, no over-fetch."""
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("video"), F.lit("audio"), F.lit("text")),
        (F.col("label") % 4 + 1).cast("int"),
    )
    # ONE collect fetches both query vectors (round 12): two separate
    # first() calls were two driver-blocking jobs per execution — the
    # second scan is pure scheduling overhead at any scale (guide §5:
    # minimize driver round-trips on the query path).
    qrows = {
        r["vec_id"]: r["embedding"]
        for r in emb.where(F.col("vec_id").isin(0, 1))
        .select("vec_id", "embedding")
        .collect()
    }
    q_clip = qrows[0]
    q_clap = qrows[1]
    lit = lambda v: F.array(*[F.lit(float(x)) for x in v])  # noqa: E731
    scored = emb.select(
        F.col("vec_id").alias("id"),
        modality.alias("modality"),
        F.when(
            modality == "audio", dot(F.col("embedding"), lit(q_clap))
        )
        .otherwise(dot(F.col("embedding"), lit(q_clip)))
        .alias("sim"),
    )
    w = Window.partitionBy("modality").orderBy(
        F.col("sim").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("modality", "id", "sim", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# BM25 lexical search + dedup clustering (training-data-pipeline extensions)
# ---------------------------------------------------------------------------

_BM25_TERMS = ["spark", "join", "window", "vector"]

from multimodal_vector_db_spark.operators.text_search import (  # noqa: E402
    bm25_oracle_sql,
    bm25_rank,
)


@query("bm25_search", bm25_oracle_sql(_BM25_TERMS, k=10))
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for a fixed 4-term query: per-term tf as
    within-row array expressions (no explode), corpus stats as one
    broadcast row, fixed-order float fold for oracle-exact scores."""
    return bm25_rank(_t(spark, sf_dir, "documents"), _BM25_TERMS, k=10)


@query(
    "dedup_clusters",
    r"""
    WITH RECURSIVE t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(toks)),
                                          i -> toks[i] || ' ' || toks[i+1])) AS shingles
      FROM t
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))::DOUBLE
        / (len(a.shingles) + len(b.shingles)
           - len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))) >= 0.03
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
    )
    SELECT id AS doc_id, min(label)::BIGINT AS cluster_id
    FROM reach GROUP BY id
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: n-gram Jaccard pairs (≥0.03, lang-blocked) →
    connected components by distributed min-label propagation; every doc
    labeled with the min doc_id of its component (the canonical
    survivor). The oracle computes the same fixpoint as a recursive-CTE
    transitive closure — feasible at oracle scale, while the Spark path
    is O(diameter) shuffle rounds and holds at 100 TB."""
    from multimodal_vector_db_spark.operators.dedup import (
        connected_components,
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
    return connected_components(pairs, nodes=docs.select("doc_id"))


@query(
    "ann_ivf_adc_knn",
    """
    WITH cent AS (
      SELECT (vec_id - 200)::BIGINT AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id BETWEEN 200 AND 207
    ),
    subs AS (SELECT unnest(generate_series(0, 3)) AS sub),
    cb AS (
      SELECT (e.vec_id - 100)::BIGINT AS code, s.sub,
             list_transform(e.embedding[s.sub*16+1 : s.sub*16+16],
                            x -> x::DOUBLE) AS centroid
      FROM embeddings e, subs s WHERE e.vec_id BETWEEN 100 AND 103
    ),
    casg AS (
      SELECT vec_id, embedding, cid, cv FROM (
        SELECT e.vec_id, e.embedding, c.cid, c.cv,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cv) DESC,
                          c.cid DESC) AS rn
        FROM embeddings e CROSS JOIN cent c) WHERE rn = 1
    ),
    rsl AS (
      SELECT a.vec_id, a.cid, s.sub,
             list_transform(generate_series(1, 16),
               i -> a.embedding[s.sub*16 + i]::DOUBLE - a.cv[s.sub*16 + i]) AS rsl
      FROM casg a, subs s
    ),
    codes AS (
      SELECT vec_id, cid, sub, code FROM (
        SELECT r.vec_id, r.cid, r.sub, cb.code,
               row_number() OVER (PARTITION BY r.vec_id, r.sub
                 ORDER BY list_dot_product(
                   list_transform(generate_series(1, 16), i -> r.rsl[i] - cb.centroid[i]),
                   list_transform(generate_series(1, 16), i -> r.rsl[i] - cb.centroid[i])
                 ) ASC, cb.code ASC) AS rn
        FROM rsl r JOIN cb ON r.sub = cb.sub) WHERE rn = 1
    ),
    qprobe AS (
      SELECT query_id, q_emb, cid, cv FROM (
        SELECT e.vec_id AS query_id, e.embedding AS q_emb, c.cid, c.cv,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cv) DESC,
                          c.cid DESC) AS rn
        FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < 5) WHERE rn <= 2
    ),
    dtab AS (
      SELECT q.query_id, q.cid, s.sub, cb.code,
             list_dot_product(
               list_transform(generate_series(1, 16),
                 i -> (q.q_emb[s.sub*16 + i]::DOUBLE - q.cv[s.sub*16 + i]) - cb.centroid[i]),
               list_transform(generate_series(1, 16),
                 i -> (q.q_emb[s.sub*16 + i]::DOUBLE - q.cv[s.sub*16 + i]) - cb.centroid[i])
             ) AS d
      FROM qprobe q, subs s JOIN cb ON cb.sub = s.sub
    ),
    adc AS (
      SELECT d.query_id, k.vec_id AS id, sum(d.d) AS dist
      FROM codes k
      JOIN dtab d ON k.cid = d.cid AND k.sub = d.sub AND k.code = d.code
      GROUP BY d.query_id, k.vec_id
    ),
    ranked AS (
      SELECT query_id, id, round(dist, 6) AS adc_dist,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(dist, 6) ASC, id ASC) AS rank
      FROM adc
    )
    SELECT query_id, id, adc_dist, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def q_ann_ivf_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (Jégou et al. TPAMI 2011 §V): coarse IVF cells (fixed
    centroids, rows 200-207) + PQ over the RESIDUAL v − centroid (4×4
    data-derived codebooks, rows 100-103), nprobe=2, per-(query, cell)
    residual lookup tables, ADC top-5. The full FAISS-style
    compressed-ANN pipeline as one Spark plan: index build is a
    shuffle-free projection; search is broadcast LUT join + fixed-order
    fold + per-query top-k — at 100 TB the index is 32× smaller than
    the corpus and probes prune at the scan via partitionBy(cluster)."""
    from multimodal_vector_db_spark.operators.ann import (
        ivf_adc_build,
        ivf_adc_search,
    )
    from multimodal_vector_db_spark.operators.quantization import (
        data_derived_codebooks,
    )

    emb = _t(spark, sf_dir, "embeddings")
    centroids = [
        r["embedding"]
        for r in emb.where(
            (F.col("vec_id") >= 200) & (F.col("vec_id") < 208)
        ).orderBy("vec_id").select("embedding").collect()
    ]
    books = data_derived_codebooks(emb, n_subquantizers=4, n_codes=4)
    index = ivf_adc_build(
        emb.select(F.col("vec_id").alias("id"), "embedding"),
        centroids,
        books,
    )
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.where(F.col("vec_id") < 5)
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    ]
    out = ivf_adc_search(index, queries, centroids, books, k=5, nprobe=2)
    return out.select(
        "query_id", "id", "adc_dist", F.col("rank").cast("long").alias("rank")
    )


from multimodal_vector_db_spark.operators.text_search import (  # noqa: E402
    rrf_fuse,
    with_rank,
)

_HYBRID_RRF_ORACLE = f"""
    WITH lex AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
      FROM ({bm25_oracle_sql(_BM25_TERMS, k=20)})
    ),
    q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
    dense AS (
      SELECT doc_id, rank FROM (
        SELECT e.vec_id AS doc_id,
               row_number() OVER (
                 ORDER BY list_dot_product(e.embedding::DOUBLE[], q.v) DESC,
                          e.vec_id ASC) AS rank
        FROM embeddings e, q) WHERE rank <= 20
    ),
    unioned AS (
      SELECT doc_id, rank FROM lex
      UNION ALL
      SELECT doc_id, rank FROM dense
    ),
    fused AS (
      SELECT doc_id,
             round(sum(1.0 / (60 + rank)), 6) AS rrf_score,
             count(*)::BIGINT AS n_sources
      FROM unioned GROUP BY doc_id
    )
    SELECT doc_id, rrf_score, n_sources, rank FROM (
      SELECT doc_id, rrf_score, n_sources,
             row_number() OVER (
               ORDER BY rrf_score DESC, doc_id ASC)::BIGINT AS rank
      FROM fused) WHERE rank <= 10
    """


@query("hybrid_rrf_search", _HYBRID_RRF_ORACLE)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-20 + dense-embedding top-20
    (query = vec_id 0, doc_id ≡ vec_id), fused by reciprocal-rank
    fusion (k0=60, Cormack 2009), final top-10. The two candidate
    generators are independent scans fused by a single groupBy over
    ≤40 rows — at 100 TB each retriever does its own distributed
    top-k (TakeOrderedAndProject / window) and fusion cost stays
    constant."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = with_rank(bm25_rank(docs, _BM25_TERMS, k=20)).select(
        "doc_id", "rank"
    )
    qv = emb.where(F.col("vec_id") == 0).first()["embedding"]
    dense_scored = emb.select(
        F.col("vec_id").alias("doc_id"),
        dot(
            F.col("embedding"), F.array(*[F.lit(float(x)) for x in qv])
        ).alias("sim"),
    )
    dense = with_rank(
        dense_scored.orderBy(F.desc("sim"), F.asc("doc_id")).limit(20),
        order_col="sim",
    ).select("doc_id", "rank")
    fused = rrf_fuse([lex, dense], k=10)
    return fused.select("doc_id", "rrf_score", "n_sources", "rank")


from multimodal_vector_db_spark.operators.text_pipeline import (  # noqa: E402
    chunk_documents,
    inverted_index,
    mask_digits,
    pseudonymize,
)


@query(
    "doc_chunking",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, greatest(0, len(toks) - 1), 10)) AS st
      FROM t
    )
    SELECT doc_id, (st // 10)::BIGINT AS chunk_id,
           len(toks[st+1 : st+20])::BIGINT AS n_tokens,
           array_to_string(toks[st+1 : st+20], ' ') AS chunk_text
    FROM s
    """,
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (window=20, stride=10) — the
    embed-prep step for RAG / long-doc pipelines. Windows are built
    within the row (sequence → slice) and exploded: zero shuffles, and
    chunks stay co-partitioned with their source documents."""
    return chunk_documents(
        _t(spark, sf_dir, "documents"), window=20, stride=10
    )


@query(
    "inverted_index",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\s+'),
                                       x -> x != '')) AS toks
      FROM documents
    ),
    posting AS (
      SELECT unnest(toks) AS term, doc_id FROM t
    )
    SELECT term, count(*)::BIGINT AS df,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
    FROM posting GROUP BY term HAVING count(*) >= 100
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: explode distinct terms per doc → one
    hash-agg on term → (term, df, sorted postings). The classic
    one-shuffle index build with map-side combine; df filter keeps the
    oracle output bounded (common terms only)."""
    idx = inverted_index(_t(spark, sf_dir, "documents"), min_df=100)
    return idx.select(
        "term", "df", _csv_longs(F.col("postings")).alias("postings")
    )


@query(
    "pii_pseudonymize",
    """
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
           substr(sha256('pii-salt:' || c_custkey::VARCHAR), 1, 16)
             AS pseudonym
    FROM customer
    """,
)
def q_pii_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing before training: digits masked out of the display
    name, identity replaced by a salted-sha256 pseudonym (stable for
    joins, unlinkable without the salt). Pure codegen'd projection —
    no shuffle, pushdown-friendly."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        mask_digits("c_name").alias("masked_name"),
        pseudonymize("c_custkey", salt="pii-salt:").alias("pseudonym"),
    )


_QUALITY_SQL = r"""
      SELECT doc_id, source,
             round((least(len(toks)::DOUBLE / 50.0, 1.0)
                    + (1.0 - least(abs(coalesce(len(list_filter(toks, x -> list_contains(
                        ['the','a','and','of','to','in','is','it'], lower(x))))::DOUBLE
                        / nullif(len(toks), 0), 0.0) - 0.3) / 0.3, 1.0))
                    + (1.0 - least(coalesce((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')))::DOUBLE
                        / nullif(length(text), 0), 0.0) * 2.0, 1.0))) / 3.0, 6) AS quality
      FROM (SELECT doc_id, source, text,
                   list_filter(string_split_regex(text, '\s+'), t -> t != '') AS toks
            FROM documents)
"""


@query(
    "quality_quantile_filter",
    f"""
    WITH s AS ({_QUALITY_SQL}),
    m AS (
      SELECT source, round(quantile_cont(quality, 0.5), 6) AS source_median
      FROM s GROUP BY source
    )
    SELECT s.doc_id, s.source, s.quality, m.source_median
    FROM s JOIN m USING (source)
    WHERE s.quality >= m.source_median
    """,
)
def q_quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile gating (the 'keep the best half of every
    domain' curation rule — a per-domain threshold beats one global
    cutoff because sources have different score distributions). Exact
    median per source (one partial-agg shuffle over ~|sources| rows)
    broadcast back against the scored scan — the corpus itself never
    re-shuffles."""
    from multimodal_vector_db_spark.functions import text as X

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", X.quality_score("text").alias("quality")
    )
    med = scored.groupBy("source").agg(
        F.round(F.percentile("quality", F.lit(0.5)), 6).alias("source_median")
    )
    return (
        scored.join(F.broadcast(med), "source")
        .where(F.col("quality") >= F.col("source_median"))
        .select("doc_id", "source", "quality", "source_median")
    )


@query(
    "vocab_stats",
    r"""
    WITH ex AS (
      SELECT source, doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'), t -> t != '')) AS term
      FROM documents
    )
    SELECT source,
           count(DISTINCT doc_id)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_tokens,
           count(DISTINCT term)::BIGINT AS vocab,
           round(count(DISTINCT term)::DOUBLE / count(*), 6) AS type_token_ratio
    FROM ex GROUP BY source
    """,
)
def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus vocabulary profile (n_docs, token volume,
    vocabulary size, type-token ratio) — the standard corpus-health
    dashboard numbers. One explode + one hash-agg; distinct-aggregates
    expand internally to a two-level agg with map-side combine, which
    is exactly the scalable shape."""
    from multimodal_vector_db_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    ex = docs.select(
        "source", "doc_id", F.explode(tokens("text")).alias("term")
    )
    return ex.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_tokens"),
        F.countDistinct("term").alias("vocab"),
        F.round(
            F.countDistinct("term").cast("double") / F.count("*"), 6
        ).alias("type_token_ratio"),
    )


@query(
    "doc_pagerank",
    r"""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(toks)),
                                          i -> toks[i] || ' ' || toks[i+1])) AS shingles
      FROM t
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))::DOUBLE
        / (len(a.shingles) + len(b.shingles)
           - len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))) >= 0.03
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
    deg AS (SELECT s, count(*)::DOUBLE AS outdeg FROM edges GROUP BY s),
    p0 AS (SELECT doc_id AS id, 1.0 / nn.n AS pr FROM documents, nn),
    c1 AS (
      SELECT e.d AS id, sum(p.pr / g.outdeg) AS sc
      FROM edges e JOIN p0 p ON e.s = p.id JOIN deg g ON g.s = e.s
      GROUP BY e.d
    ),
    p1 AS (
      SELECT d0.doc_id AS id,
             (1.0 - 0.85) / nn.n + 0.85 * coalesce(c1.sc, 0.0) AS pr
      FROM documents d0 LEFT JOIN c1 ON c1.id = d0.doc_id, nn
    ),
    c2 AS (
      SELECT e.d AS id, sum(p.pr / g.outdeg) AS sc
      FROM edges e JOIN p1 p ON e.s = p.id JOIN deg g ON g.s = e.s
      GROUP BY e.d
    ),
    p2 AS (
      SELECT d0.doc_id AS id,
             (1.0 - 0.85) / nn.n + 0.85 * coalesce(c2.sc, 0.0) AS pr
      FROM documents d0 LEFT JOIN c2 ON c2.id = d0.doc_id, nn
    ),
    c3 AS (
      SELECT e.d AS id, sum(p.pr / g.outdeg) AS sc
      FROM edges e JOIN p2 p ON e.s = p.id JOIN deg g ON g.s = e.s
      GROUP BY e.d
    ),
    p3 AS (
      SELECT d0.doc_id AS id,
             (1.0 - 0.85) / nn.n + 0.85 * coalesce(c3.sc, 0.0) AS pr
      FROM documents d0 LEFT JOIN c3 ON c3.id = d0.doc_id, nn
    )
    SELECT id AS doc_id, round(pr, 6) AS pagerank FROM p3
    """,
)
def q_doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 3 fixed iterations) over the undirected
    near-dup similarity graph (n-gram Jaccard ≥ 0.03, lang-blocked) —
    node importance for picking canonical docs inside dup clusters and
    weighting sources. The oracle unrolls the same three iterations as
    chained CTEs; the Spark path materializes edges/degrees once and
    keeps per-iteration lineage O(1), so iteration count scales without
    plan blowup."""
    from multimodal_vector_db_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from multimodal_vector_db_spark.operators.graph import pagerank

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
    # symmetrize in one pass — a unionAll of two selects would run the
    # (expensive) Jaccard pair join twice
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                ),
                F.struct(
                    F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return pagerank(edges, docs.select("doc_id"), iterations=3)


@query(
    "event_interval_join",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type, epoch_us(ts)::BIGINT AS us
      FROM events
    ),
    v AS (SELECT event_id AS left_id, user_id, us AS l_us FROM e
          WHERE event_type = 'view'),
    p AS (SELECT event_id AS right_id, user_id, us AS r_us FROM e
          WHERE event_type = 'purchase')
    SELECT v.left_id, p.right_id, v.user_id,
           (p.r_us - v.l_us)::BIGINT AS gap_us
    FROM v JOIN p ON v.user_id = p.user_id
     AND p.r_us >= v.l_us AND p.r_us <= v.l_us + 600000000
    """,
)
def q_event_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join (view→purchase attribution within 10
    minutes, per user) — the time-bounded theta-join family the
    reference lacks. Runs as an equi-join on user_id with the time
    bound as a post-join filter (one co-partitioned shuffle); the SAME
    operator is streamable: with watermarks the interval bound lets
    Spark expire stream-stream join state (`streaming/ingest.py:
    interval_join`)."""
    from multimodal_vector_db_spark.streaming.ingest import interval_join

    events = _t(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view")
    purchases = events.where(F.col("event_type") == "purchase")
    return interval_join(views, purchases, gap_seconds=600)


# ---------------------------------------------------------------------------
