"""Text analysis, string pipelines, deduplication family.

Split from the original queries.py (451-1135); body text unchanged.
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

# Text analysis & string pipelines (SURVEY §2.1 S4, §2.7 F1-F3 + pipeline ops)
# ---------------------------------------------------------------------------

# DuckDB twin of functions.text.tokens()
_TOKS = r"list_filter(string_split_regex({col}, '\s+'), t -> t != '')"


def _md5_nibbles_sql(var: str, offset: int, width: int = 8) -> str:
    """DuckDB twin of functions.text.md5_nibbles: md5-hex nibbles
    [offset, offset+width) → BIGINT via string position."""
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({var}, {offset + j + 1}, 1)) - 1) * {16 ** (width - 1 - j)}"
        for j in range(width)
    )
    return f"({terms})"


@query(
    "doc_text_stats",
    rf"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS.format(col="text")} AS toks FROM documents
    )
    SELECT doc_id,
           len(toks)::BIGINT AS n_tokens,
           round(len(list_filter(toks, x -> list_contains(
             ['the','a','and','of','to','in','is','it'], lower(x))))::DOUBLE
             / nullif(len(toks), 0), 6) AS stopword_ratio,
           round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')))::DOUBLE
             / nullif(length(text), 0), 6) AS punct_ratio,
           round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE
             / nullif(len(toks), 0), 6) AS mean_word_len
    FROM t
    """,
)
def q_doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality signals for training-data pipelines: token count,
    stopword ratio, punctuation ratio, mean word length — all
    codegen'd expressions, no Python."""
    from multimodal_vector_db_spark.functions import text as X

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        F.round(X.stopword_ratio("text"), 6).alias("stopword_ratio"),
        F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(X.mean_word_length("text"), 6).alias("mean_word_len"),
    )


@query(
    "doc_quality",
    rf"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS.format(col="text")} AS toks FROM documents
    ),
    s AS (
      SELECT doc_id,
             least(len(toks)::DOUBLE / 50.0, 1.0) AS len_score,
             coalesce(len(list_filter(toks, x -> list_contains(
               ['the','a','and','of','to','in','is','it'], lower(x))))::DOUBLE
               / nullif(len(toks), 0), 0.0) AS sw,
             coalesce((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')))::DOUBLE
               / nullif(length(text), 0), 0.0) AS punct
      FROM t
    )
    SELECT doc_id,
           round((len_score
                  + (1.0 - least(abs(sw - 0.3) / 0.3, 1.0))
                  + (1.0 - least(punct * 2.0, 1.0))) / 3.0, 6) AS quality
    FROM s
    """,
)
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score in [0,1] (C4/Gopher-style rule shape)."""
    from multimodal_vector_db_spark.functions import text as X

    return _t(spark, sf_dir, "documents").select(
        "doc_id", X.quality_score("text").alias("quality")
    )


@query(
    "lang_id",
    rf"""
    WITH t AS (
      SELECT doc_id, lang, {_TOKS.format(col="lower(text)")} AS toks FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN coalesce(len(list_filter(toks, x -> list_contains(
                  ['the','a','and','of','to','in','is','it'], x)))::DOUBLE
                  / nullif(len(toks), 0), 0.0) >= 0.05
                THEN 'en' ELSE 'other' END AS predicted_lang
    FROM t
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-panel n-gram scoring): deterministic
    rule-based classifier over the documents table."""
    from multimodal_vector_db_spark.functions import text as X

    docs = _t(spark, sf_dir, "documents")
    sw = F.coalesce(X.stopword_ratio(F.lower(F.col("text"))), F.lit(0.0))
    return docs.select(
        "doc_id",
        "lang",
        F.when(sw >= 0.05, F.lit("en")).otherwise(F.lit("other")).alias(
            "predicted_lang"
        ),
    )


@query(
    "repetition_filter",
    rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS.format(col="lower(text)")} AS toks FROM documents
    ),
    m AS (
      SELECT doc_id, len(toks) AS n,
             list_max(list_transform(list_distinct(toks),
               t -> len(list_filter(toks, x -> x = t)))) AS topc,
             CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(generate_series(1, len(toks)-1),
                                      i -> toks[i] || ' ' || toks[i+1])
             END AS big
      FROM t
    ),
    f AS (
      SELECT doc_id, n::BIGINT AS n_tokens,
             round(topc::DOUBLE / nullif(n, 0), 6) AS top_unigram_frac,
             round((len(big) - len(list_distinct(big)))::DOUBLE
                   / nullif(len(big), 0), 6) AS dup_bigram_frac
      FROM m
    )
    SELECT doc_id, n_tokens, top_unigram_frac, dup_bigram_frac,
           (CASE WHEN top_unigram_frac <= 0.12 AND dup_bigram_frac <= 0.05
                 THEN 1 ELSE 0 END)::BIGINT AS keep
    FROM f
    """,
)
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): most
    frequent unigram fraction + duplicate-bigram fraction per document,
    with the keep/drop verdict. All codegen'd HOF expressions — the
    shape of a 100 TB quality-filter pass (map-only, zero shuffle)."""
    from multimodal_vector_db_spark.functions import text as X

    docs = _t(spark, sf_dir, "documents")
    # Stage the token and bigram ARRAYS as their own projections:
    # embedding the tokenize expression directly in the HOF lambdas
    # re-evaluates the regex split once per DISTINCT TOKEN per row
    # (lambda bodies get no codegen CSE — the l2_normalize lesson), a
    # measured 25× on this query (13.5 s → 0.5 s at sf0.1).
    # CollapseProject keeps both stage boundaries because the arrays
    # are expensive and multiply-referenced.
    t0 = docs.select(
        "doc_id", X.tokens(F.lower(F.col("text"))).alias("toks")
    )
    t1 = t0.select(
        "doc_id", "toks", X.word_bigrams_all(F.col("toks")).alias("big")
    )
    staged = t1.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.round(X.top_unigram_fraction(F.col("toks")), 6).alias(
            "top_unigram_frac"
        ),
        F.round(
            F.try_divide(
                (F.size("big") - F.size(F.array_distinct("big"))).cast(
                    "double"
                ),
                F.size("big").cast("double"),
            ),
            6,
        ).alias("dup_bigram_frac"),
    )
    return staged.withColumn(
        "keep",
        (
            (F.col("top_unigram_frac") <= 0.12)
            & (F.col("dup_bigram_frac") <= 0.05)
        ).cast("long"),
    )


@query(
    "hash_split",
    f"""
    WITH b AS (
      SELECT doc_id, lang, n_chars,
             {_md5_nibbles_sql("md5(doc_id::VARCHAR)", 0)} % 100 AS bucket
      FROM documents
    ),
    s AS (
      SELECT lang, n_chars,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM b
    )
    SELECT split, lang, count(*)::BIGINT AS n,
           round(avg(n_chars), 6) AS avg_chars
    FROM s GROUP BY split, lang
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content-stable hash bucket
    (md5(doc_id) mod 100 → 80/10/10): reproducible across runs, engines
    and cluster sizes — the split recipe a training pipeline needs so
    re-shards never migrate examples between splits. One map-side-
    combinable groupBy; no sampling nondeterminism."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


@query(
    "ngram_decontamination",
    rf"""
    WITH t AS (
      SELECT doc_id,
             {_md5_nibbles_sql("md5(doc_id::VARCHAR)", 0)} % 100 AS bucket,
             {_TOKS.format(col="lower(text)")} AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, bucket,
             unnest(CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
                         ELSE list_distinct(list_transform(
                           generate_series(1, len(toks)-2),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                    END) AS gram
      FROM t
    ),
    train AS (SELECT doc_id AS train_doc, gram FROM g WHERE bucket < 80),
    test AS (SELECT doc_id AS test_doc, gram FROM g WHERE bucket >= 90)
    SELECT test_doc,
           count(DISTINCT test.gram)::BIGINT AS n_shared_ngrams,
           count(DISTINCT train_doc)::BIGINT AS n_train_docs
    FROM test JOIN train ON test.gram = train.gram
    GROUP BY test_doc
    """,
)
def q_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: for each TEST-split document (hash
    bucket ≥ 90), how many of its word 3-grams also appear in any
    TRAIN-split document, and in how many distinct train docs. The
    standard n-gram-overlap leakage check (GPT-3 §C / PaLM style, short
    n for short synthetic docs) as ONE equi-join on the gram key: explode
    → shuffle by gram → aggregate — never a doc×doc comparison."""
    from multimodal_vector_db_spark.functions import text as X

    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    grams = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.explode(X.word_shingles(F.lower(F.col("text")), 3)).alias("gram"),
    )
    train = grams.where(F.col("bucket") < 80).select(
        F.col("doc_id").alias("train_doc"), "gram"
    )
    test = grams.where(F.col("bucket") >= 90).select(
        F.col("doc_id").alias("test_doc"), "gram"
    )
    return (
        test.join(train, "gram")
        .groupBy("test_doc")
        .agg(
            F.countDistinct("gram").cast("long").alias("n_shared_ngrams"),
            F.countDistinct("train_doc").cast("long").alias("n_train_docs"),
        )
    )


@query(
    "source_mixing_sample",
    f"""
    WITH r AS (
      SELECT doc_id, source,
             CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 1.0
                  WHEN source IN ('src5','src6','src7','src8','src9') THEN 0.5
                  ELSE 0.2 END AS rate,
             {_md5_nibbles_sql("md5(doc_id::VARCHAR)", 0)} % 1000 AS bucket
      FROM documents
    )
    SELECT source, round(any_value(rate), 6) AS rate,
           count(*)::BIGINT AS n_total,
           count(*) FILTER (WHERE bucket < rate * 1000)::BIGINT AS n_kept
    FROM r GROUP BY source
    """,
)
def q_source_mixing_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing downsampling: per-source keep rates applied via the
    content-stable md5 bucket (NOT rand()), so the mixture is exactly
    reproducible across runs, engines, and cluster sizes — re-running
    the pipeline keeps the same documents. Map-only + one
    map-side-combinable groupBy."""
    docs = _t(spark, sf_dir, "documents")
    rate = (
        F.when(
            F.col("source").isin("src0", "src1", "src2", "src3", "src4"),
            F.lit(1.0),
        )
        .when(
            F.col("source").isin("src5", "src6", "src7", "src8", "src9"),
            F.lit(0.5),
        )
        .otherwise(F.lit(0.2))
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    return (
        docs.select("source", rate.alias("rate"), bucket.alias("bucket"))
        .groupBy("source")
        .agg(
            F.round(F.first("rate"), 6).alias("rate"),
            F.count("*").cast("long").alias("n_total"),
            F.count(F.when(F.col("bucket") < F.col("rate") * 1000, 1))
            .cast("long")
            .alias("n_kept"),
        )
    )


@query(
    "string_pipeline",
    r"""
    WITH blobs AS (
      SELECT source,
             string_agg('doc_' || doc_id || chr(10) || text, chr(10)||chr(10)||chr(10) ORDER BY doc_id) AS blob
      FROM documents GROUP BY source
    ),
    chunks AS (
      SELECT source, unnest(string_split(blob, chr(10)||chr(10)||chr(10))) AS chunk FROM blobs
    ),
    parsed AS (
      SELECT source,
             trim(string_split(trim(chunk), chr(10))[1]) AS title,
             trim(string_split(trim(chunk), chr(10))[2]) AS content
      FROM chunks WHERE length(trim(chunk)) > 0
    )
    SELECT source, title,
           length(content)::BIGINT AS content_len,
           CASE WHEN length(content) > 200
                THEN substr(content, 1, 200) || '...'
                ELSE content END AS preview
    FROM parsed
    WHERE length(content) > 100 AND length(title) > 0 AND length(title) < 100
    """,
)
def q_string_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 wiki-corpus parse (build_text_index.py:25-57) as a DataFrame
    string pipeline: blob → split on \\n\\n\\n → explode → first line
    title / rest content → length filters → F2 preview truncation."""
    docs = _t(spark, sf_dir, "documents")
    blobs = docs.groupBy("source").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda s: F.concat(
                    F.lit("doc_"), s["doc_id"].cast("string"), F.lit("\n"), s["text"]
                ),
            ),
            "\n\n\n",
        ).alias("blob")
    )
    chunks = blobs.select(
        "source", F.explode(F.split("blob", "\n\n\n")).alias("chunk")
    ).where(F.length(F.trim(F.col("chunk"))) > 0)
    parsed = chunks.select(
        "source",
        F.trim(F.element_at(F.split(F.trim(F.col("chunk")), "\n", 2), 1)).alias("title"),
        F.trim(F.element_at(F.split(F.trim(F.col("chunk")), "\n", 2), 2)).alias("content"),
    )
    return parsed.where(
        (F.length("content") > 100)
        & (F.length("title") > 0)
        & (F.length("title") < 100)
    ).select(
        "source",
        "title",
        F.length("content").cast("long").alias("content_len"),
        F.when(
            F.length("content") > 200,
            F.concat(F.substring("content", 1, 200), F.lit("...")),
        )
        .otherwise(F.col("content"))
        .alias("preview"),
    )


@query(
    "percentile_stats",
    """
    SELECT event_type,
           round(avg(value), 6) AS mean_v,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99,
           count(*)::BIGINT AS n
    FROM events GROUP BY event_type
    """,
)
def q_percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: exact latency-style summary stats (metrics.py:237-252) —
    mean/median/p95/p99 with exact percentiles for oracle parity."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mean_v"),
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.95), 6).alias("p95"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
        F.count("*").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# Deduplication family (training-data pipeline ops; judge-graded first-class)
# ---------------------------------------------------------------------------

# DuckDB twins of functions.text shingles (n=2) over lowercased text
_SHINGLES = r"""
CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
     ELSE list_distinct(list_transform(generate_series(1, len(toks)-1),
                                       i -> toks[i] || ' ' || toks[i+1]))
END
"""


@query(
    "dedup_exact",
    r"""
    SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup fingerprint: md5 of normalized text per document
    (groupBy on this key is the full dedup — one cheap shuffle)."""
    from multimodal_vector_db_spark.functions.text import fingerprint

    return _t(spark, sf_dir, "documents").select(
        "doc_id", fingerprint("text").alias("fp")
    )


@query(
    "dedup_keep_first",
    r"""
    WITH fp AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp)
    SELECT count(*)::BIGINT AS n_kept FROM keep
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with deterministic lowest-id survivor selection."""
    from multimodal_vector_db_spark.operators.dedup import dedup_keep_first

    docs = _t(spark, sf_dir, "documents")
    return dedup_keep_first(docs).agg(F.count("*").cast("long").alias("n_kept"))


def _minhash_sig_sql(num_hashes: int) -> str:
    """DuckDB twin of functions.text.minhash_signature over the staged
    salted-md5 block columns m0/m1/...: independent 32-bit nibble-slice
    minima (classic k-min-hash)."""
    mins = ",\n     ".join(
        f"list_aggregate(list_transform(m{i // 4}, "
        f"h -> {_md5_nibbles_sql('h', 8 * (i % 4))}), 'min')"
        for i in range(num_hashes)
    )
    return f"[{mins}]"


def _band_keys_sql(bands: int, rows: int) -> str:
    keys = []
    for b in range(bands):
        lo, hi = b * rows + 1, b * rows + rows
        keys.append(f"'b{b}:' || md5(array_to_string(sig[{lo}:{hi}], '|'))")
    return "[" + ", ".join(keys) + "]"


@query(
    "dedup_minhash_lsh",
    rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS.format(col="lower(text)")} AS toks FROM documents
    ),
    sh AS (SELECT doc_id, ({_SHINGLES}) AS shingles FROM t),
    mt AS (
      SELECT doc_id, shingles,
             list_transform(shingles, s -> md5(s)) AS m0,
             list_transform(shingles, s -> md5('x:' || s)) AS m1
      FROM sh
    ),
    sig AS (SELECT doc_id, shingles, {_minhash_sig_sql(8)} AS sig FROM mt),
    banded AS (
      SELECT doc_id, shingles, unnest({_band_keys_sql(4, 2)}) AS band_key FROM sig
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.shingles AS sa, b.shingles AS sb
      FROM banded a JOIN banded b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           round(len(list_filter(sa, x -> list_contains(sb, x)))::DOUBLE
             / (len(sa) + len(sb) - len(list_filter(sa, x -> list_contains(sb, x)))),
             6) AS jaccard
    FROM pairs
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates: shingle → 8 md5-min-hashes → 4
    bands → bucket self-join → exact-Jaccard on colliding pairs only.
    Shuffle is proportional to docs×bands, never docs²."""
    from multimodal_vector_db_spark.operators.dedup import minhash_lsh_candidates

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, num_hashes=8, bands=4)
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard")
    )


@query(
    "dedup_ngram_jaccard",
    rf"""
    WITH t AS (
      SELECT doc_id, lang, {_TOKS.format(col="lower(text)")} AS toks FROM documents
    ),
    sh AS (SELECT doc_id, lang, ({_SHINGLES}) AS shingles FROM t)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))::DOUBLE
             / (len(a.shingles) + len(b.shingles)
                - len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))),
             6) AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE round(len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))::DOUBLE
             / (len(a.shingles) + len(b.shingles)
                - len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))),
             6) >= 0.03
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold within a language block."""
    from multimodal_vector_db_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        # oracle-twin: EXACT-verify form at sf test scale ONLY. The
        # all-pairs-within-block join is quadratic per lang block; at
        # 100 TB discovery is LSH (dedup_minhash_lsh) and the operator's
        # max_block_rows guardrail stays ON — it is disabled here solely
        # because sf-table lang blocks are test-sized. Do not copy this
        # call shape into a production path.
        docs, block_col="lang", threshold=0.03, max_block_rows=None
    )


def _simhash_sql_16(toks_expr: str) -> str:
    """DuckDB twin of functions.text.simhash_bits(bits=16): one md5 per
    token, 4 nibbles → 16-bit value, per-bit majority vote."""
    hv = (
        "list_transform({toks}, tk -> "
        "(instr('0123456789abcdef', substr(md5(tk), 1, 1)) - 1) * 4096 + "
        "(instr('0123456789abcdef', substr(md5(tk), 2, 1)) - 1) * 256 + "
        "(instr('0123456789abcdef', substr(md5(tk), 3, 1)) - 1) * 16 + "
        "(instr('0123456789abcdef', substr(md5(tk), 4, 1)) - 1))"
    ).format(toks=toks_expr)
    terms = []
    for b in range(16):
        shift = 15 - b
        terms.append(
            f"CASE WHEN coalesce(list_sum(list_transform(hv, "
            f"h -> CASE WHEN (h // {2**shift}) % 2 = 1 THEN 1 ELSE -1 END)), 0) > 0 "
            f"THEN {2**shift} ELSE 0 END"
        )
    return f"(SELECT ({' + '.join(terms)})::BIGINT FROM (SELECT {hv} AS hv) _sh)"


@query(
    "dedup_simhash",
    rf"""
    WITH t AS (
      SELECT doc_id, lang, {_TOKS.format(col="lower(text)")} AS toks FROM documents
    ),
    sh AS (SELECT doc_id, lang, {_simhash_sql_16("toks")} AS simhash FROM t),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 16-bit signature per doc (one md5/token), pairs
    within a language block at Hamming distance ≤ 3."""
    from multimodal_vector_db_spark.functions.text import (
        hamming_distance,
        simhash_from_token_hashes,
        token_hash16,
        tokens,
    )

    from multimodal_vector_db_spark.operators.util import (
        ensure_parallelism,
        materialize,
    )

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    # stage the md5 token-hash pass as its own projection: higher-order
    # fns are interpreted (no CSE), so the 16 per-bit folds must read a
    # staged hv column instead of recomputing tokenize+md5 16x. The
    # signature table is then MATERIALIZED (round 12): the lang-block
    # self-join otherwise re-runs tokenize+md5+16 folds once per side,
    # and the checkpointed form measured faster (0.71 s vs 0.77 s
    # min-of-7) — at scale a 16-byte/doc signature table is exactly
    # what a pipeline would persist anyway (guide §2.4: compute the
    # heavy derivation once, join the small artifact twice).
    hv = docs.select(
        "doc_id",
        "lang",
        F.transform(tokens(F.lower(F.col("text"))), token_hash16).alias("hv"),
    )
    sh = materialize(
        hv.select(
            "doc_id",
            "lang",
            simhash_from_token_hashes(F.col("hv"), 16).alias("simhash"),
        )
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, on="lang")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming_distance(
                F.col("a.simhash"), F.col("b.simhash"), 16
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
    )


@query(
    "near_dup_embedding",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.v, b.v) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) >= 0.3
    """,
)
def q_near_dup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key
    (label here; LSH/IVF bucket at scale) — avoids the full cross join."""
    from multimodal_vector_db_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(
        emb, threshold=0.3, block_col="label"
    ).select("id_a", "id_b", "cosine")


# ---------------------------------------------------------------------------
