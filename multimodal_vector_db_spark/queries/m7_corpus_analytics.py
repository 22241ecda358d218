"""Corpus analytics: TF-IDF, OLAP cube, window family, divergence.

Split from the original queries.py (3924-5222); body text unchanged.
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
from .m2_text_dedup import _SHINGLES, _TOKS, _md5_nibbles_sql

# Corpus analytics round 2: TF-IDF, OLAP cube, window family, divergence,
# graph triangles, bloom semi-join, stratified sampling
# ---------------------------------------------------------------------------


@query(
    "tfidf_top_terms",
    rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS.format(col="lower(text)")} AS toks FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM t)
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    n AS (SELECT count(*)::DOUBLE AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             round(tf.tf * (ln((n.n + 1) / (dfreq.df + 1)) + 1), 6) AS tfidf
      FROM tf, dfreq, n WHERE tf.term = dfreq.term
    ),
    ranked AS (
      SELECT doc_id, term, tf, df, tfidf,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored
    )
    SELECT doc_id, term, tf, df, tfidf, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF keyword extraction: top-3 terms per document
    (sklearn smooth_idf form), ranked on round(score, 6) with a term
    tie-break so the winner set is engine-independent."""
    from multimodal_vector_db_spark.operators.text_search import (
        tfidf_top_terms,
    )

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


@query(
    "cube_lang_source",
    """
    SELECT coalesce(lang, 'ALL') AS lang,
           coalesce(source, 'ALL') AS source,
           count(*)::BIGINT AS n_docs,
           round(sum(n_chars)::DOUBLE / count(*), 6) AS avg_chars,
           (grouping(lang) * 2 + grouping(source))::BIGINT AS gid
    FROM documents GROUP BY CUBE (lang, source)
    """,
)
def q_cube_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (lang, source): all 2^2 grouping sets in one pass —
    the OLAP companion of `rollup_stats`. The average is declared as
    exact-integer sum ÷ count (one IEEE division) so both engines hit
    identical doubles regardless of accumulation order; grouping nulls
    are labeled 'ALL' (data keys are non-null here). Spark executes a
    single shuffle with partial aggregation per grouping set (Expand +
    hash agg), not four scans."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.cube("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(
                F.sum("n_chars").cast("double") / F.count("*"), 6
            ).alias("avg_chars"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "n_docs",
            "avg_chars",
            "gid",
        )
    )


@query(
    "window_family",
    """
    WITH e AS (
      SELECT event_id, user_id, value, epoch_us(ts)::BIGINT AS us
      FROM events WHERE user_id < 40
    )
    SELECT event_id, user_id,
           (row_number() OVER w)::BIGINT AS rn,
           (ntile(4) OVER w)::BIGINT AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           round(lag(value, 1) OVER w, 6) AS prev_value,
           round(lead(value, 1) OVER w, 6) AS next_value,
           round(value - first_value(value) OVER w, 6) AS delta_from_first
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    """,
)
def q_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic window-function family over per-user event streams:
    row_number / ntile / percent_rank / cume_dist / lag / lead /
    first_value, one shuffle on user_id shared by every function (all
    declared over the SAME window spec, so Catalyst plans a single
    Window operator). percent_rank and cume_dist are exact rationals
    (one division), deterministic under the total (us, event_id)
    order."""
    from pyspark.sql import Window

    from multimodal_vector_db_spark.streaming.ingest import ts_micros

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 40)
    e = ev.select(
        "event_id", "user_id", "value", ts_micros(ev).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.round(F.lag("value", 1).over(w), 6).alias("prev_value"),
        F.round(F.lead("value", 1).over(w), 6).alias("next_value"),
        F.round(
            F.col("value") - F.first("value").over(w), 6
        ).alias("delta_from_first"),
    )


_KL_LANGS = ["de", "en", "es", "fr", "zh"]


def _kl_sql() -> str:
    counts = ",\n             ".join(
        f"sum(CASE WHEN lang = '{l}' THEN 1 ELSE 0 END)::BIGINT AS c_{l}"
        for l in _KL_LANGS
    )
    gcounts = ",\n             ".join(
        f"sum(CASE WHEN lang = '{l}' THEN 1 ELSE 0 END)::BIGINT AS g_{l}"
        for l in _KL_LANGS
    )
    terms = "\n        + ".join(
        f"(CASE WHEN c_{l} > 0 THEN (c_{l}::DOUBLE / n) * "
        f"ln((c_{l}::DOUBLE / n) / (g_{l}::DOUBLE / g_n)) ELSE 0 END)"
        for l in _KL_LANGS
    )
    return f"""
    WITH per AS (
      SELECT source,
             {counts},
             count(*)::BIGINT AS n
      FROM documents GROUP BY source
    ),
    corp AS (
      SELECT {gcounts},
             count(*)::BIGINT AS g_n
      FROM documents
    )
    SELECT source, n AS n_docs,
           round({terms}, 6) AS kl
    FROM per, corp
    """


@query("source_lang_divergence", _kl_sql())
def q_source_lang_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the language distribution against
    the corpus-wide distribution — the drift/skew detector that flags
    a source whose language mix departs from the mixture target.

    Determinism: the lang domain is a fixed explicit list, so the sum
    over languages is a fixed left-associated 5-term expression chain
    (never a cross-row float aggregation whose order the engine picks);
    every p and q is one exact-integer division. Executes as one
    partial-aggregated shuffle on source plus a broadcast 1-row corpus
    total."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        *[
            F.sum(F.when(F.col("lang") == l, 1).otherwise(0))
            .cast("long")
            .alias(f"c_{l}")
            for l in _KL_LANGS
        ],
        F.count("*").cast("long").alias("n"),
    )
    corp = docs.agg(
        *[
            F.sum(F.when(F.col("lang") == l, 1).otherwise(0))
            .cast("long")
            .alias(f"g_{l}")
            for l in _KL_LANGS
        ],
        F.count("*").cast("long").alias("g_n"),
    )

    def term(l: str):
        p = F.col(f"c_{l}").cast("double") / F.col("n")
        q = F.col(f"g_{l}").cast("double") / F.col("g_n")
        return F.when(F.col(f"c_{l}") > 0, p * F.log(p / q)).otherwise(
            F.lit(0.0)
        )

    kl = term(_KL_LANGS[0])
    for l in _KL_LANGS[1:]:
        kl = kl + term(l)
    return per.crossJoin(F.broadcast(corp)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(kl, 6).alias("kl"),
    )


_JACCARD_PAIRS_SQL = rf"""
    t AS (
      SELECT doc_id, lang, {_TOKS.format(col="lower(text)")} AS toks FROM documents
    ),
    sh AS (SELECT doc_id, lang, ({_SHINGLES}) AS shingles FROM t),
    pairs AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE round(len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))::DOUBLE
             / (len(a.shingles) + len(b.shingles)
                - len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))),
             6) >= 0.03
    )
"""


@query(
    "doc_triangles",
    rf"""
    WITH {_JACCARD_PAIRS_SQL},
    wedge AS (
      SELECT x.ida AS u, x.idb AS v, y.idb AS w
      FROM pairs x JOIN pairs y ON x.ida = y.ida AND x.idb < y.idb
    ),
    tri AS (
      SELECT u, v, w FROM wedge JOIN pairs p ON wedge.v = p.ida AND wedge.w = p.idb
    ),
    corners AS (SELECT unnest([u, v, w]) AS doc_id FROM tri)
    SELECT doc_id, count(*)::BIGINT AS n_triangles
    FROM corners GROUP BY doc_id
    """,
)
def q_doc_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle counts over the n-gram-Jaccard near-dup
    graph — template/spam clusters are triangle-dense, organic
    near-dups are not. Wedge-join enumeration, each triangle once
    (`operators/graph.py:triangle_counts`)."""
    from multimodal_vector_db_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from multimodal_vector_db_spark.operators.graph import triangle_counts

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
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    return triangle_counts(edges)


def _bloom_pos_sql(key_expr: str, i: int, m_bits: int = 4096) -> str:
    return (
        _md5_nibbles_sql(f"md5('bf{i}:' || {key_expr}::VARCHAR)", 0)
        + f" % {m_bits}"
    )


@query(
    "bloom_semi_join",
    f"""
    WITH build AS (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5),
    bits AS (
      SELECT array_agg(DISTINCT p) AS bits FROM (
        SELECT unnest([{_bloom_pos_sql("s_suppkey", 0)},
                       {_bloom_pos_sql("s_suppkey", 1)},
                       {_bloom_pos_sql("s_suppkey", 2)}]) AS p
        FROM build
      )
    )
    SELECT l.l_suppkey, count(*)::BIGINT AS n_rows
    FROM lineitem l, bits b
    WHERE list_has_all(b.bits, [{_bloom_pos_sql("l.l_suppkey", 0)},
                                {_bloom_pos_sql("l.l_suppkey", 1)},
                                {_bloom_pos_sql("l.l_suppkey", 2)}])
    GROUP BY l.l_suppkey
    """,
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join: keep lineitem rows whose supplier is
    (probably) in the nation<5 supplier set — the big side is filtered
    by a broadcast bit-set with NO shuffle of lineitem, the explicit
    form of runtime row-level filter pushdown
    (`operators/joins.py:bloom_semi_join`). False positives are part of
    the declared semantics (the oracle re-derives the identical md5 bit
    positions, so the hash-match covers them too); an exact join
    afterwards only touches the surviving fraction."""
    from multimodal_vector_db_spark.operators.joins import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").where(F.col("s_nationkey") < 5)
    kept = bloom_semi_join(
        li.select("l_suppkey"),
        supp.select("s_suppkey"),
        big_key="l_suppkey",
        small_key="s_suppkey",
        m_bits=4096,
        k_hashes=3,
    )
    return kept.groupBy("l_suppkey").agg(
        F.count("*").cast("long").alias("n_rows")
    )


@query(
    "stratified_sample",
    f"""
    WITH h AS (
      SELECT doc_id, lang, source,
             {_md5_nibbles_sql("md5('strat:' || doc_id::VARCHAR)", 0)} AS h
      FROM documents
    ),
    r AS (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
      FROM h
    )
    SELECT doc_id, lang, source FROM r WHERE rn <= 20
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k stratified sample: exactly 20 documents per language by
    salted-md5 order — the deterministic exact-count counterpart of
    Bernoulli `sampleBy` (`operators/sampling.py:
    stratified_exact_sample`), reproducible across engines and
    re-shards."""
    from multimodal_vector_db_spark.operators.sampling import (
        stratified_exact_sample,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_exact_sample(
        docs, stratum_col="lang", k_per_stratum=20, id_col="doc_id"
    )


@query(
    "event_funnel",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts)::BIGINT AS us FROM events
    ),
    v AS (SELECT user_id, min(us) AS v_us FROM e WHERE event_type = 'view'
          GROUP BY user_id),
    c AS (SELECT e.user_id, min(us) AS c_us
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.us >= v.v_us
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(us) AS p_us
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.us >= c.c_us
          GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v)::BIGINT AS n_view_users,
           (SELECT count(*) FROM c)::BIGINT AS n_click_users,
           (SELECT count(*) FROM p)::BIGINT AS n_purchase_users
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view → click-after-view →
    purchase-after-click, per user): the sequential-pattern aggregation
    of event analytics. Three stage aggregations, each a shuffle on
    user_id over an already-reduced per-user table — co-partitioned
    after the first, so AQE reuses the exchange; integer-µs
    comparisons end-to-end."""
    from multimodal_vector_db_spark.streaming.ingest import ts_micros

    ev = _t(spark, sf_dir, "events")
    e = ev.select("user_id", "event_type", ts_micros(ev).alias("us"))
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("us") >= F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("us") >= F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    return (
        v.agg(F.count("*").cast("long").alias("n_view_users"))
        .crossJoin(c.agg(F.count("*").cast("long").alias("n_click_users")))
        .crossJoin(
            p.agg(F.count("*").cast("long").alias("n_purchase_users"))
        )
    )


@query(
    "weekly_deltas",
    """
    WITH w AS (
      SELECT event_type, date_trunc('week', ts)::DATE AS week_start,
             count(*)::BIGINT AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week_start, n_events,
           (n_events - lag(n_events) OVER (
              PARTITION BY event_type ORDER BY week_start))::BIGINT AS delta,
           round((n_events - lag(n_events) OVER (
              PARTITION BY event_type ORDER BY week_start))::DOUBLE
             / lag(n_events) OVER (
              PARTITION BY event_type ORDER BY week_start), 6) AS pct_change
    FROM w
    """,
)
def q_weekly_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week reporting rollup: per event type, weekly counts
    with lag delta and percent change — the downsample-then-compare
    shape of a metrics pipeline. One agg shuffle + one window on the
    (already tiny) weekly table; exact integers into one division."""
    from pyspark.sql import Window

    from multimodal_vector_db_spark.streaming.ingest import with_event_time

    ev = with_event_time(_t(spark, sf_dir, "events"))
    # DuckDB's date_trunc('week') yields a DATE — normalize to DATE on
    # both sides so the value canon matches
    weekly = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("week", "event_time")).alias("week_start"),
    ).agg(F.count("*").cast("long").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("week_start")
    prev = F.lag("n_events").over(w)
    return weekly.select(
        "event_type",
        "week_start",
        "n_events",
        (F.col("n_events") - prev).cast("long").alias("delta"),
        F.round(
            (F.col("n_events") - prev).cast("double") / prev, 6
        ).alias("pct_change"),
    )


@query(
    "fuzzy_name_match",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    blocked AS (
      SELECT p_name, split_part(p_name, ' ', -1) AS noun FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name)::BIGINT AS dist
    FROM blocked a JOIN blocked b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy (edit-distance) self-join over part names — the
    record-linkage primitive. Blocking on the head noun turns the
    quadratic all-pairs into per-block pairs (the standard linkage
    design: block on a cheap stable key, pay levenshtein only inside
    the block); dedup to DISTINCT names first so the pair space scales
    with vocabulary, not rows."""
    names = (
        _t(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("noun", F.element_at(F.split("p_name", " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("long")
            .alias("dist"),
        )
        .where(F.col("dist") <= 4)
    )


@query(
    "merge_upsert_docs",
    """
    WITH merged AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000 ELSE n_chars END
               AS n_chars
      FROM documents
    )
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars
    FROM merged GROUP BY source
    """,
)
def q_merge_upsert_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 merge/upsert (`operators/upsert.py`): a change set
    (every 7th document re-processed with +1000 chars, version 2) is
    merged latest-version-wins into the base corpus; the per-source
    rollup proves every update landed exactly once and nothing else
    moved. The oracle states the post-merge truth directly — the
    mechanics under test live on the Spark side."""
    from multimodal_vector_db_spark.operators.upsert import merge_upsert

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    base = docs.withColumn("version", F.lit(1))
    updates = (
        docs.where(F.col("doc_id") % 7 == 0)
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .withColumn("version", F.lit(2))
    )
    merged = merge_upsert(base, updates, key_col="doc_id")
    return merged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "integrity_audit",
    """
    SELECT 'orders.custkey->customer' AS relationship,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))::BIGINT AS n_orphans
    UNION ALL
    SELECT 'lineitem.orderkey->orders',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))::BIGINT
    UNION ALL
    SELECT 'lineitem.partkey->part',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))::BIGINT
    UNION ALL
    SELECT 'lineitem.suppkey->supplier',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))::BIGINT
    UNION ALL
    SELECT 'events.user_id->customer',
           (SELECT count(*) FROM events e
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = e.user_id))::BIGINT
    """,
)
def q_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign-key
    relationship in the warehouse — the standing data-quality gate of
    a pipeline. Each check is a LEFT ANTI join with the dimension side
    broadcast, so the fact tables are single narrow scans (no
    shuffle); the five audits union into one result."""
    fk = [
        ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
    ]
    parts = []
    for label, fact, fcol, dim, dcol in fk:
        f_df = _t(spark, sf_dir, fact).select(F.col(fcol).alias("k"))
        d_df = _t(spark, sf_dir, dim).select(F.col(dcol).alias("k"))
        orphans = f_df.join(F.broadcast(d_df), "k", "left_anti")
        parts.append(
            orphans.agg(
                F.lit(label).alias("relationship"),
                F.count("*").cast("long").alias("n_orphans"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


_PROFILE_COLS = [
    ("event_id", "num"),
    ("user_id", "num"),
    ("value", "num"),
    ("event_type", "str"),
    ("props", "str"),
]


def _profile_sql() -> str:
    rows = []
    for col, kind in _PROFILE_COLS:
        if kind == "num":
            mn, mx = f"min({col})::DOUBLE", f"max({col})::DOUBLE"
            mns, mxs = "NULL::VARCHAR", "NULL::VARCHAR"
        else:
            mn, mx = "NULL::DOUBLE", "NULL::DOUBLE"
            mns, mxs = f"min({col})", f"max({col})"
        rows.append(
            f"SELECT '{col}' AS column_name, count(*)::BIGINT AS n_rows,"
            f" (count(*) - count({col}))::BIGINT AS n_null,"
            f" count(DISTINCT {col})::BIGINT AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num,"
            f" {mns} AS min_str, {mxs} AS max_str FROM events"
        )
    return "\nUNION ALL\n".join(rows)


@query("table_profile", _profile_sql())
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profiling of the events table: row/null/
    distinct counts plus typed min/max per column — the first query any
    pipeline runs against a new source. Spark evaluates all five
    columns' profiles in one logical pass (the multi-distinct
    aggregate compiles to a single Expand, like CUBE — not five
    scans); numeric and string extrema are kept in separate typed
    columns so the cross-engine canon never depends on float
    formatting."""
    ev = _t(spark, sf_dir, "events")
    outs = []
    for col, kind in _PROFILE_COLS:
        base = [
            F.lit(col).alias("column_name"),
            F.count("*").cast("long").alias("n_rows"),
            (F.count("*") - F.count(col)).cast("long").alias("n_null"),
            F.count_distinct(F.col(col)).cast("long").alias("n_distinct"),
        ]
        if kind == "num":
            base += [
                F.min(col).cast("double").alias("min_num"),
                F.max(col).cast("double").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            ]
        else:
            base += [
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.min(col).alias("min_str"),
                F.max(col).alias("max_str"),
            ]
        outs.append(ev.agg(*base))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@query(
    "knn_l2",
    """
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 7),
    scored AS (
      SELECT e.vec_id AS id, e.label,
             round(list_distance(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6)
               AS dist
      FROM embeddings e, q
    )
    SELECT id, label, dist, round(1.0 / (1.0 + dist), 6) AS sim
    FROM scored ORDER BY dist ASC, id ASC LIMIT 10
    """,
)
def q_knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN under the L2 metric — the reference's ``space='l2'``
    index family (vector_index.py:34-44) with its ``1/(1+d)``
    similarity transform (vector_index.py:139-144). Same shuffle-free
    TakeOrderedAndProject plan as the cosine path; ranking on
    round(dist, 6) absorbs the last-ulp difference between engines'
    distance folds."""
    from multimodal_vector_db_spark.operators.knn import knn_search_l2

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 7).select("embedding").first()[0]
    return knn_search_l2(
        emb.select(F.col("vec_id").alias("id"), "label", "embedding"),
        qvec,
        k=10,
    )


@query(
    "tpch_q13",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    join (customers with zero orders must appear with c_count = 0)
    into a double aggregation. The outer join shuffles both sides on
    the key once; the second groupBy runs over the tiny per-customer
    table. count(o_orderkey) counts only matched rows — the null-
    preserving subtlety the outer join exists for."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


@query(
    "tpch_q14",
    """
    SELECT round(
      100.00 * sum(CASE WHEN p_name LIKE '%widget%'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0 END)
      / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue share): conditional-sum ratio
    over a fact⋈dim join — the dimension broadcasts, the date predicate
    pushes to the lineitem scan, and the whole query reduces map-side
    to one row per partition before a single-row final agg."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.agg(
        F.round(
            100.0
            * F.sum(
                F.when(F.col("p_name").like("%widget%"), rev).otherwise(0.0)
            )
            / F.sum(rev),
            6,
        ).alias("promo_revenue")
    )


@query(
    "training_data_pipeline",
    rf"""
    WITH staged AS (
      SELECT doc_id, source,
             {_md5_nibbles_sql("md5(doc_id::VARCHAR)", 0)} % 100 AS bucket,
             {_TOKS.format(col="lower(text)")} AS toks,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    quality AS (SELECT * FROM staged WHERE len(toks) >= 30),
    keep AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY fp),
    deduped AS (
      SELECT q.* FROM quality q JOIN keep k ON q.doc_id = k.doc_id
    ),
    train AS (SELECT * FROM deduped WHERE bucket < 80),
    test_grams AS (
      SELECT DISTINCT unnest(
        CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
             ELSE list_distinct(list_transform(
               generate_series(1, len(toks)-2),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        END) AS gram
      FROM staged WHERE bucket >= 90
    ),
    contaminated AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, unnest(
              CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
                   ELSE list_distinct(list_transform(
                     generate_series(1, len(toks)-2),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              END) AS gram
            FROM train) t
      JOIN test_grams g ON t.gram = g.gram
    ),
    final AS (
      SELECT tr.* FROM train tr
      WHERE NOT EXISTS (SELECT 1 FROM contaminated c
                        WHERE c.doc_id = tr.doc_id)
    ),
    srcrep AS (
      SELECT source, sum(len(toks))::BIGINT AS s_sum,
             count(*)::BIGINT AS s_n
      FROM quality GROUP BY 1
    ),
    grep_ AS (
      SELECT sum(s_sum)::BIGINT AS g_sum, sum(s_n)::BIGINT AS g_n
      FROM srcrep
    ),
    blocked AS (
      SELECT source FROM srcrep, grep_
      WHERE s_sum::DOUBLE / s_n < 0.9 * (g_sum::DOUBLE / g_n)
    ),
    gated AS (
      SELECT * FROM final
      WHERE source NOT IN (SELECT source FROM blocked)
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(len(toks))::BIGINT AS total_tokens
    FROM gated GROUP BY source
    """,
)
def q_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end curation pipeline — the north-star flow
    run as ONE declarative plan: quality gate (≥30 tokens) → exact
    dedup (lowest-id survivor) → deterministic train split (md5 bucket
    < 80) → 3-gram decontamination against the held-out test split
    (bucket ≥ 90) → source-reputation gate (round 6: sources whose
    quality-stage mean token count falls below 0.9× the global mean
    are blocklisted and anti-joined out — the in-funnel form of
    `source_reputation_gate`, exact integer-ratio arithmetic so the
    comparison replays bit-for-bit) → per-source accounting. Every
    stage is an operator already oracle-checked in isolation;
    composing them costs eight exchanges total (the fingerprint agg +
    its semi-join, both sides of the gram join, the final agg, and the
    reputation stage's per-source agg + two singleton rollup hops over
    the tiny source table — bounded by a plan test) because
    the quality/split filters are narrow and Catalyst pipelines them
    into the scans."""
    from multimodal_vector_db_spark.functions import text as X
    from multimodal_vector_db_spark.operators.dedup import dedup_keep_first

    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    staged = docs.select(
        "doc_id",
        "source",
        "text",
        bucket.alias("bucket"),
        X.tokens(F.lower(F.col("text"))).alias("toks"),
    )
    quality = staged.where(F.size("toks") >= 30)
    deduped = dedup_keep_first(quality)
    train = deduped.where(F.col("bucket") < 80)
    # production gram basis: shingle the ALREADY-tokenized column (no
    # second regex pass) and join on xxhash64 of the gram — an 8-byte
    # key instead of a ~25-char string for the join + both distincts.
    # Same semantics as the oracle's string-gram join up to 64-bit hash
    # collisions (~n²/2⁶⁵ ≈ 10⁻⁹ at this gram count; the standard
    # decontamination basis at 100 TB, where string grams would
    # dominate shuffle bytes).
    def grams(df):
        return F.explode(
            F.transform(
                X.word_shingles_from_tokens(F.col("toks"), 3),
                lambda g: F.xxhash64(g),
            )
        ).alias("gram")

    test_grams = (
        staged.where(F.col("bucket") >= 90).select(grams(staged)).distinct()
    )
    train_grams = train.select("doc_id", grams(train))
    contaminated = (
        train_grams.join(test_grams, "gram").select("doc_id").distinct()
    )
    final = train.join(contaminated, "doc_id", "left_anti")
    # source-reputation stage: exact int-ratio means (sum/count, ONE
    # IEEE division each) so both engines compare identical doubles
    srcrep = quality.groupBy("source").agg(
        F.sum(F.size("toks")).cast("long").alias("s_sum"),
        F.count("*").cast("long").alias("s_n"),
    )
    glob = srcrep.agg(
        F.sum("s_sum").cast("long").alias("g_sum"),
        F.sum("s_n").cast("long").alias("g_n"),
    )
    blocked = (
        srcrep.crossJoin(F.broadcast(glob))
        .where(
            F.col("s_sum").cast("double") / F.col("s_n")
            < 0.9 * (F.col("g_sum").cast("double") / F.col("g_n"))
        )
        .select("source")
    )
    gated = final.join(F.broadcast(blocked), "source", "left_anti")
    return gated.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size("toks")).cast("long").alias("total_tokens"),
    )


@query(
    "kmv_set_ops",
    rf"""
    WITH a AS (
      SELECT DISTINCT {_md5_nibbles_sql("md5(user_id::VARCHAR)", 0)} AS h
      FROM events WHERE event_type = 'view'
    ),
    b AS (
      SELECT DISTINCT {_md5_nibbles_sql("md5(user_id::VARCHAR)", 0)} AS h
      FROM events WHERE event_type = 'purchase'
    ),
    ka AS (SELECT h FROM a ORDER BY h LIMIT 128),
    kb AS (SELECT h FROM b ORDER BY h LIMIT 128),
    ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
           ORDER BY h LIMIT 128),
    u AS (
      SELECT CASE WHEN count(*) < 128 THEN count(*)::DOUBLE
                  ELSE 545460846592.0 / max(h)::DOUBLE END AS union_est,
             count(*)::BIGINT AS k_used
      FROM ku
    ),
    rho AS (
      SELECT count(*)::BIGINT AS n_both FROM ku
      WHERE EXISTS (SELECT 1 FROM ka WHERE ka.h = ku.h)
        AND EXISTS (SELECT 1 FROM kb WHERE kb.h = ku.h)
    )
    SELECT round(u.union_est, 4) AS union_est,
           round(rho.n_both::DOUBLE / u.k_used, 6) AS jaccard_est,
           round((rho.n_both::DOUBLE / u.k_used) * u.union_est, 4)
             AS intersect_est,
           u.k_used
    FROM u, rho
    """,
)
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra over viewer/purchaser user sets: union
    cardinality, Jaccard and intersection size estimated from the two
    128-min sketches ALONE (Beyer 2007) — the mergeable-sketch answer
    to audience-overlap questions that would otherwise need a full
    COUNT(DISTINCT) self-join at 100 TB."""
    from multimodal_vector_db_spark.functions.sketch import (
        kmv_set_ops,
        md5_u32,
    )

    ev = _t(spark, sf_dir, "events")
    h = md5_u32(F.col("user_id").cast("string"))
    a = ev.where(F.col("event_type") == "view").select(h.alias("h"))
    b = ev.where(F.col("event_type") == "purchase").select(h.alias("h"))
    return kmv_set_ops(a, b, k=128)


@query(
    "hll_merge_by_lang",
    rf"""
    WITH t AS (
      SELECT lang, unnest({_TOKS.format(col="lower(text)")}) AS tok
      FROM documents
    ),
    r AS (
      SELECT lang,
             {_md5_nibbles_sql("md5(tok)", 0)} % 64 AS bucket,
             {_md5_nibbles_sql("md5(tok)", 8)} AS h2
      FROM t
    ),
    reg AS (
      SELECT lang, bucket,
             max(CASE WHEN h2 = 0 THEN 33 ELSE 33 - length(bin(h2)) END)
               AS max_rho
      FROM r GROUP BY lang, bucket
    ),
    per_lang AS (
      SELECT lang,
             round(24957716092920.445 /
               (sum(1::BIGINT << (33 - max_rho))
                + (64 - count(*)) * 8589934592)::DOUBLE, 4) AS hll_est
      FROM reg GROUP BY lang
    ),
    merged_reg AS (
      SELECT bucket, max(max_rho) AS max_rho FROM reg GROUP BY bucket
    ),
    merged AS (
      SELECT 'ALL' AS lang,
             round(24957716092920.445 /
               (sum(1::BIGINT << (33 - max_rho))
                + (64 - count(*)) * 8589934592)::DOUBLE, 4) AS hll_est
      FROM merged_reg
    )
    SELECT lang, hll_est FROM per_lang
    UNION ALL SELECT lang, hll_est FROM merged
    """,
)
def q_hll_merge_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL mergeability demonstrated end-to-end: per-language
    vocabulary sketches (64 registers each), PLUS a corpus-wide
    estimate computed by merging the per-language REGISTERS (per-bucket
    max) — never re-touching the token stream. This is the sketch
    property that matters at 100 TB: partition-local sketches union in
    O(registers), so the global answer costs a 64-row shuffle instead
    of a second scan."""
    from multimodal_vector_db_spark.functions.sketch import (
        HASH_RANGE,
        hll_alpha_m2_scaled,
        hll_rho,
        md5_u32,
        md5_u32_hi,
    )
    from multimodal_vector_db_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    reg = (
        toks.select(
            "lang",
            (md5_u32(F.col("tok")) % 64).alias("bucket"),
            hll_rho(md5_u32_hi(F.col("tok"))).alias("rho"),
        )
        .groupBy("lang", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )
    const = hll_alpha_m2_scaled(6)
    per_lang = reg.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_used"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(33) - F.col("max_rho")).cast("long")
        ).alias("s_used"),
    ).select(
        "lang",
        F.round(
            F.lit(const)
            / (
                F.col("s_used")
                + (F.lit(64) - F.col("n_used")) * F.lit(2 * HASH_RANGE)
            ).cast("double"),
            4,
        ).alias("hll_est"),
    )
    merged = (
        reg.groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
        .agg(
            F.count("*").cast("long").alias("n_used"),
            F.sum(
                F.pow(F.lit(2.0), F.lit(33) - F.col("max_rho")).cast("long")
            ).alias("s_used"),
        )
        .select(
            F.lit("ALL").alias("lang"),
            F.round(
                F.lit(const)
                / (
                    F.col("s_used")
                    + (F.lit(64) - F.col("n_used")) * F.lit(2 * HASH_RANGE)
                ).cast("double"),
                4,
            ).alias("hll_est"),
        )
    )
    return per_lang.unionAll(merged)


@query(
    "snapshot_diff",
    """
    WITH old AS (
      SELECT doc_id, n_chars FROM documents WHERE doc_id % 13 != 0
    ),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN n_chars + 5 ELSE n_chars END
               AS n_chars
      FROM documents WHERE doc_id % 17 != 0
    ),
    classified AS (
      SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.n_chars != n.n_chars THEN 'changed'
                  ELSE 'unchanged' END AS change_type
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT change_type, count(*)::BIGINT AS n
    FROM classified GROUP BY change_type
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC between two corpus versions: FULL OUTER join
    on the key classifying every row added / removed / changed /
    unchanged — the change-detection primitive behind incremental
    re-embedding (only 'added' + 'changed' rows re-enter the embed
    pipeline, the 100 TB alternative to full rebuilds). One
    co-partitioned shuffle on the key; the versions here are
    deterministic slices of the documents table."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    old = docs.where(F.col("doc_id") % 13 != 0)
    new = docs.where(F.col("doc_id") % 17 != 0).withColumn(
        "n_chars",
        F.when(
            F.col("doc_id") % 11 == 0, F.col("n_chars") + 5
        ).otherwise(F.col("n_chars")),
    )
    o = old.select(
        F.col("doc_id").alias("o_id"), F.col("n_chars").alias("o_chars")
    )
    n = new.select(
        F.col("doc_id").alias("n_id"), F.col("n_chars").alias("n_chars2")
    )
    classified = o.join(n, o.o_id == n.n_id, "full_outer").select(
        F.when(F.col("o_id").isNull(), "added")
        .when(F.col("n_id").isNull(), "removed")
        .when(F.col("o_chars") != F.col("n_chars2"), "changed")
        .otherwise("unchanged")
        .alias("change_type")
    )
    return classified.groupBy("change_type").agg(
        F.count("*").cast("long").alias("n")
    )


@query(
    "token_budget_mix",
    rf"""
    WITH t AS (
      SELECT doc_id, source, len({_TOKS.format(col="lower(text)")}) AS n_toks,
             {_md5_nibbles_sql("md5('mix:' || doc_id::VARCHAR)", 0)} AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_toks,
             sum(n_toks) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             )::BIGINT AS cum_toks
      FROM t
    )
    SELECT source, count(*)::BIGINT AS n_docs,
           max(cum_toks)::BIGINT AS tokens_taken
    FROM c WHERE cum_toks <= 2000 GROUP BY source
    """,
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixing: from each source, take documents in
    salted-hash order until a fixed token budget (2000) fills — how a
    training mix hits per-domain token targets exactly rather than in
    expectation (the counts-based cousin is `source_mixing_sample`).
    Deterministic cumulative-sum window per source; the budget filter
    is exact integer arithmetic."""
    from pyspark.sql import Window

    from multimodal_vector_db_spark.functions import text as X
    from multimodal_vector_db_spark.functions.sketch import md5_u32

    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(X.tokens(F.lower(F.col("text")))).alias("n_toks"),
        md5_u32(F.col("doc_id").cast("string"), "mix:").alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum_toks", F.sum("n_toks").over(w).cast("long"))
    return (
        c.where(F.col("cum_toks") <= 2000)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("cum_toks").cast("long").alias("tokens_taken"),
        )
    )


@query(
    "ann_lsh_multiprobe_knn",
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
    m AS (
      SELECT e.vec_id AS query_id, hp.hid,
             abs(list_dot_product(e.embedding::DOUBLE[], hp.hv)) AS amarg
      FROM embeddings e CROSS JOIN hp WHERE e.vec_id < 10
    ),
    flips AS (
      SELECT query_id, hid,
             row_number() OVER (
               PARTITION BY query_id ORDER BY amarg, hid) AS rn
      FROM m
    ),
    probes AS (
      SELECT b.vec_id AS query_id, b.bucket AS probe, b.embedding AS q_emb
      FROM b WHERE b.vec_id < 10
      UNION ALL
      SELECT f.query_id, xor(b.bucket, (1::BIGINT << f.hid)), b.embedding
      FROM flips f JOIN b ON b.vec_id = f.query_id
      WHERE f.rn <= 2
    ),
    scored AS (
      SELECT p.query_id, c.vec_id AS id,
             list_dot_product(c.embedding::DOUBLE[], p.q_emb::DOUBLE[]) AS sim
      FROM b c JOIN probes p ON c.bucket = p.probe
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
def q_ann_lsh_multiprobe_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe LSH ANN (Lv 2007): base bucket + the 2 buckets from
    flipping the smallest-|margin| hyperplane bits — 3/16 of the corpus
    scanned per query instead of 1/16, recovering the near-boundary
    neighbors plain LSH loses. Fully deterministic, hence
    oracle-checked (bit-exact margins, index tie-breaks)."""
    from multimodal_vector_db_spark.operators.ann import lsh_multiprobe_knn

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
    return lsh_multiprobe_knn(
        emb.select(F.col("vec_id").alias("id"), "embedding"),
        queries,
        hyperplanes,
        k=5,
        n_probes=3,
    )


@query(
    "event_sequence_motifs",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts)::BIGINT AS us, event_id,
             substr(event_type, 1, 1) AS ini
      FROM events WHERE user_id < 100
    ),
    seqs AS (
      SELECT user_id,
             string_agg(ini, '' ORDER BY us, event_id) AS seq
      FROM e GROUP BY user_id
    )
    SELECT user_id,
           length(seq)::BIGINT AS seq_len,
           ((length(seq) - length(replace(seq, 'vp', ''))) / 2)::BIGINT
             AS n_view_purchase,
           ((length(seq) - length(replace(seq, 'vcp', ''))) / 3)::BIGINT
             AS n_view_click_purchase
    FROM seqs
    """,
)
def q_event_sequence_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-motif counting (MATCH_RECOGNIZE-lite): each user's
    event history becomes an ordered initial-letter string, and motif
    occurrences (view→purchase, view→click→purchase as IMMEDIATE
    successions) count via length arithmetic after non-overlapping
    replace — identical left-to-right semantics in both engines. The
    per-user sequence is built with array_sort over (us, event_id,
    initial) structs, so collect order never matters: one shuffle on
    user_id, the rest is row-local string work."""
    from multimodal_vector_db_spark.streaming.ingest import ts_micros

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 100)
    e = ev.select(
        "user_id",
        ts_micros(ev).alias("us"),
        "event_id",
        F.substring("event_type", 1, 1).alias("ini"),
    )
    seqs = (
        e.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("us", "event_id", "ini"))
            ).alias("evs")
        )
        .select(
            "user_id",
            F.array_join(
                F.transform("evs", lambda x: x["ini"]), ""
            ).alias("seq"),
        )
    )

    def motif(pat: str):
        return (
            (F.length("seq") - F.length(F.replace(F.col("seq"), F.lit(pat))))
            / len(pat)
        ).cast("long")

    return seqs.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        motif("vp").alias("n_view_purchase"),
        motif("vcp").alias("n_view_click_purchase"),
    )


# ---------------------------------------------------------------------------
