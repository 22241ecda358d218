"""Mergeable sketches, weighted sampling, scale-path aggregates/layout.

Split from the original queries.py (3434-3923); body text unchanged.
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
from .m2_text_dedup import _md5_nibbles_sql

# Mergeable sketches & weighted sampling (scale extensions — SURVEY §2.4
# is exact-only; these are the approximate aggregates a 100 TB corpus
# needs). All hashes are md5 nibble-slices so the DuckDB oracles are
# bit-identical: unlike approx_count_distinct, these estimates are
# DETERMINISTIC functions of the input and fully hash-matched.
# ---------------------------------------------------------------------------

_TOK_STREAM = r"""
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                    t -> t != '')) AS tok
      FROM documents
"""


@query(
    "kmv_distinct",
    rf"""
    WITH t AS ({_TOK_STREAM}),
    h AS (SELECT DISTINCT {_md5_nibbles_sql("md5(tok)", 0)} AS h FROM t),
    kmin AS (SELECT h FROM h ORDER BY h LIMIT 256),
    est AS (
      SELECT CASE WHEN count(*) < 256 THEN count(*)::DOUBLE
                  ELSE 1095216660480.0 / max(h)::DOUBLE END AS kmv_est,
             count(*)::BIGINT AS k_used
      FROM kmin
    )
    SELECT round(est.kmv_est, 4) AS kmv_est, est.k_used,
           (SELECT count(DISTINCT tok) FROM t)::BIGINT AS exact_distinct
    FROM est
    """,
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (Bar-Yossef 2002) over the corpus
    vocabulary: keep the 256 smallest distinct 32-bit hashes, estimate
    (k-1)·2^32/h_(k). At 100 TB this replaces the full COUNT(DISTINCT)
    shuffle with a TakeOrdered(256) whose per-partition k-minima are
    the mergeable sketch state (σ ≈ 1/√(k-2) ≈ 6%). Exact count
    included for on-sheet error accounting."""
    from multimodal_vector_db_spark.functions.sketch import (
        kmv_estimate,
        md5_u32,
    )
    from multimodal_vector_db_spark.functions.text import tokens

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
    )
    est = kmv_estimate(toks.select(md5_u32(F.col("tok")).alias("h")), k=256)
    exact = toks.agg(
        F.countDistinct("tok").alias("exact_distinct")
    )
    return est.crossJoin(exact).select(
        F.round("kmv_est", 4).alias("kmv_est"), "k_used", "exact_distinct"
    )


@query(
    "hll_distinct",
    rf"""
    WITH t AS ({_TOK_STREAM}),
    r AS (
      SELECT {_md5_nibbles_sql("md5(tok)", 0)} % 64 AS bucket,
             {_md5_nibbles_sql("md5(tok)", 8)} AS h2
      FROM t
    ),
    reg AS (
      SELECT bucket,
             max(CASE WHEN h2 = 0 THEN 33 ELSE 33 - length(bin(h2)) END)
               AS max_rho
      FROM r GROUP BY bucket
    ),
    est AS (
      SELECT round(24957716092920.445 /
               (sum(1::BIGINT << (33 - max_rho))
                + (64 - count(*)) * 8589934592)::DOUBLE, 4) AS hll_est,
             count(*)::BIGINT AS n_buckets_used
      FROM reg
    )
    SELECT est.hll_est, est.n_buckets_used,
           (SELECT count(DISTINCT tok) FROM t)::BIGINT AS exact_distinct
    FROM est
    """,
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog (Flajolet 2007), p=6: bucket = low 6
    bits of hash-slice 1, rank = leading zeros of hash-slice 2 via
    length(bin(h)) — exact string arithmetic, no floating log. The
    64-register sketch is the partial-agg state (merge = per-bucket
    max), so a 1000-executor cluster ships 64 longs per partition.
    Raw estimate only (linear-counting correction needs ln(), which is
    libm-dependent); exact count included for error accounting."""
    from multimodal_vector_db_spark.functions.sketch import (
        hll_estimate,
        hll_registers,
        md5_u32,
        md5_u32_hi,
    )
    from multimodal_vector_db_spark.functions.text import tokens

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
    )
    regs = hll_registers(
        toks.select(
            md5_u32(F.col("tok")).alias("hb"),
            md5_u32_hi(F.col("tok")).alias("hr"),
        ),
        p=6,
    )
    est = hll_estimate(regs, p=6)
    exact = toks.agg(F.countDistinct("tok").alias("exact_distinct"))
    return est.crossJoin(exact).select(
        F.round("hll_est", 4).alias("hll_est"),
        "n_buckets_used",
        "exact_distinct",
    )


@query(
    "cms_heavy_hitters",
    rf"""
    WITH t AS ({_TOK_STREAM}),
    coords AS (
      SELECT tok, i AS row,
             {_md5_nibbles_sql("md5('cms' || i || ':' || tok)", 0)} % 512
               AS bucket
      FROM t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
    ),
    sketch AS (
      SELECT row, bucket, count(*)::BIGINT AS counter
      FROM coords GROUP BY row, bucket
    ),
    cand AS (
      SELECT tok AS term, count(*)::BIGINT AS exact_n
      FROM t GROUP BY tok ORDER BY exact_n DESC, term LIMIT 20
    ),
    ccoords AS (
      SELECT term, i AS row,
             {_md5_nibbles_sql("md5('cms' || i || ':' || term)", 0)} % 512
               AS bucket
      FROM cand CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
    )
    SELECT c.term, cand.exact_n, min(s.counter)::BIGINT AS cms_n
    FROM ccoords c
    JOIN sketch s USING (row, bucket)
    JOIN cand ON cand.term = c.term
    GROUP BY c.term, cand.exact_n
    """,
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode 2005), d=4 × w=512: the token-frequency
    matrix is a plain groupBy(row, bucket).count() — 2048 cells of
    partial-agg state regardless of corpus size — and a point query is
    min over the 4 salted rows (never under-counts). Estimates checked
    against exact counts for the top-20 heavy hitters."""
    from multimodal_vector_db_spark.functions.sketch import (
        cms_build,
        cms_point_query,
    )
    from multimodal_vector_db_spark.functions.text import tokens

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
    )
    sketch = cms_build(toks, width=512)
    cand = (
        toks.groupBy(F.col("tok").alias("term"))
        .agg(F.count("*").cast("long").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "term")
        .limit(20)
    )
    est = cms_point_query(sketch, cand.select("term"), width=512)
    return cand.join(
        est.withColumnRenamed("item", "term"), on="term"
    ).select("term", "exact_n", F.col("cms_n").cast("long").alias("cms_n"))


@query(
    "priority_sample_docs",
    rf"""
    WITH b AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN n_chars > 0 THEN
               (n_chars * 4294967296)::DOUBLE /
               ({_md5_nibbles_sql("md5('ps:' || doc_id::VARCHAR)", 0)} + 1)::DOUBLE
             ELSE 0.0 END AS q
      FROM documents
    )
    SELECT doc_id, source, n_chars::BIGINT AS weight
    FROM b ORDER BY q DESC, doc_id LIMIT 100
    """,
)
def q_priority_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sample via priority sampling (Duffield
    2007): priority w/u with u from a salted md5 of doc_id, keep the
    top 100 — a pure function of the corpus, reproducible across
    engines and re-shards (`operators/sampling.py`). One IEEE division
    per row, no transcendentals; executes as TakeOrdered(100) with no
    full shuffle."""
    from multimodal_vector_db_spark.operators.sampling import priority_sample

    docs = _t(spark, sf_dir, "documents")
    return priority_sample(
        docs.select("doc_id", "source", "n_chars"),
        weight_col="n_chars",
        id_col="doc_id",
        k=100,
    ).select("doc_id", "source", F.col("n_chars").cast("long").alias("weight"))


@query(
    "events_sliding_window",
    """
    SELECT date_trunc('hour', ts) - i * INTERVAL 1 HOUR AS window_start,
           event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
    GROUP BY 1, 2
    """,
)
def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window aggregation: 2-hour windows every hour,
    each event contributing to width/slide = 2 windows. Spark's
    `window(col, '2 hours', '1 hour')` expands the overlap JVM-side
    (one explode-free generator + hash agg); the same call is the
    streaming form under a watermark."""
    from multimodal_vector_db_spark.streaming.ingest import with_event_time

    ev = with_event_time(_t(spark, sf_dir, "events"))
    return (
        ev.groupBy(
            F.window("event_time", "2 hours", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Scale-path aggregates & layout (histogram quantiles, TPC-H join shapes,
# Z-order clustering)
# ---------------------------------------------------------------------------


@query(
    "histogram_quantiles",
    """
    WITH s AS (
      SELECT event_type, min(value) AS mn, max(value) AS mx,
             count(*)::BIGINT AS n
      FROM events GROUP BY event_type
    ),
    b AS (
      SELECT e.event_type,
             (CASE WHEN s.mx > s.mn
                   THEN least(floor(((e.value - s.mn) / (s.mx - s.mn)) * 256),
                              255)
                   ELSE 0 END)::BIGINT AS bin
      FROM events e JOIN s USING (event_type)
    ),
    h AS (
      SELECT event_type, bin, count(*)::BIGINT AS cnt
      FROM b GROUP BY event_type, bin
    ),
    c AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin)::BIGINT
               AS cum
      FROM h
    ),
    t AS (SELECT * FROM (VALUES (0.5, 'p50'), (0.95, 'p95'), (0.99, 'p99'))
          AS v(q, qname)),
    sel AS (
      SELECT c.event_type, t.qname, s.mn, s.mx, c.bin, c.cnt,
             (c.cum - c.cnt) AS cumb, (t.q * s.n) AS target
      FROM c JOIN s USING (event_type) CROSS JOIN t
      WHERE (c.cum - c.cnt) < t.q * s.n AND c.cum >= t.q * s.n
    )
    SELECT event_type, qname,
           round(mn + ((bin + (target - cumb) / cnt) * ((mx - mn) / 256)), 6)
             AS est
    FROM sel
    """,
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram quantiles — the 100 TB percentile path. Exact
    percentiles need a full sort per group; a 256-bin fixed-width
    histogram is two scans of plain partial-aggregated groupBys (pass 1
    min/max/count, pass 2 bin counts; bins merge by addition across
    executors), then p50/p95/p99 by linear interpolation inside the
    target bin. Deterministic — bin edges and interpolation are pure
    IEEE arithmetic, hash-matched against the oracle (unlike
    approx_percentile's engine-internal GK sketch). Accuracy vs exact
    is asserted in tests/test_sketch.py."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count("*").cast("long").alias("n"),
    )
    b = ev.join(F.broadcast(s), on="event_type").select(
        "event_type",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.floor(
                    ((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")))
                    * 256
                ),
                F.lit(255).cast("long"),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bin"),
    )
    h = b.groupBy("event_type", "bin").agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("bin")
    c = h.withColumn("cum", F.sum("cnt").over(w).cast("long"))
    t = F.broadcast(
        spark.createDataFrame(
            [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")], "q double, qname string"
        )
    )
    sel = (
        c.join(F.broadcast(s), on="event_type")
        .crossJoin(t)
        .withColumn("cumb", F.col("cum") - F.col("cnt"))
        .withColumn("target", F.col("q") * F.col("n"))
        .where(
            (F.col("cumb") < F.col("q") * F.col("n"))
            & (F.col("cum") >= F.col("q") * F.col("n"))
        )
    )
    return sel.select(
        "event_type",
        "qname",
        F.round(
            F.col("mn")
            + (
                (F.col("bin") + (F.col("target") - F.col("cumb")) / F.col("cnt"))
                * ((F.col("mx") - F.col("mn")) / 256)
            ),
            6,
        ).alias("est"),
    )


@query(
    "tpch_q5",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
         AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the 6-table snowflake join. All dimension sides
    (region→nation→supplier, customer) broadcast — lineitem, the only
    big table, shuffles exactly once (the lineitem⋈orders equi-join);
    the local-supplier condition c_nationkey = s_nationkey rides the
    same join as a residual filter."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    sn = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == F.col("n_nationkey"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(sn),
            (li.l_suppkey == sn.s_suppkey)
            & (c.c_nationkey == sn.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "tpch_q18",
    """
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           round(big.sum_qty, 2) AS sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC LIMIT 20
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): lineitem pre-aggregates
    to one row per order (map-side partial sum) and HAVING prunes to the
    rare big orders BEFORE any join — the surviving set is tiny, so both
    remaining joins broadcast it and the top-20 is a TakeOrdered."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "zorder_key",
    f"""
    SELECT l_orderkey, l_partkey, l_suppkey,
           {{morton}}::BIGINT AS z
    FROM lineitem WHERE l_orderkey < 50
    """.replace("{morton}", __import__("multimodal_vector_db_spark.functions.layout", fromlist=["morton_code_sql"]).morton_code_sql("l_partkey", "l_suppkey", 16)),
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (l_partkey, l_suppkey) —
    the multi-dimensional file-layout primitive: writing the table
    sorted by this key gives every file a small (partkey, suppkey)
    rectangle, so parquet min-max stats prune scans filtered on EITHER
    column (`functions/layout.py:zorder_repartition`; file-level
    pruning asserted in tests/test_layout.py). Pure bit interleaving,
    identical in Spark and the oracle."""
    from multimodal_vector_db_spark.functions.layout import morton_code

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 50)
    return li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        morton_code(F.col("l_partkey"), F.col("l_suppkey"), 16).alias("z"),
    )


# ---------------------------------------------------------------------------
