"""BM25 keyword search over the documents table.

The reference engine answers only vector-similarity queries; a
training-data pipeline also needs lexical retrieval (mining targeted
subsets, building hybrid BM25+dense candidate pools, decontamination
lookups). This implements Okapi BM25 as a pure DataFrame pipeline.

Scale design
------------
- **No explode, no per-term shuffle.** For a query of q terms, term
  frequencies are q within-row ``size(filter(toks, = term))``
  expressions — the token array never leaves the row, so scoring is a
  narrow map over the corpus scan (whole-stage codegen, zero shuffle).
- **Corpus stats are one broadcast row.** N, Σdl and per-term document
  frequencies come from a single partial-aggregated pass (map-side
  combine → 1 row), then ``crossJoin(broadcast(stats))`` — at 100 TB
  this is the only exchange besides the final top-k, and it moves ~one
  row per partition.
- **Deterministic scores.** All inputs to the float math are exact
  integers (tf, dl, df, N as doubles < 2^53); per-term contributions
  are summed in fixed query-term order by an explicit left-associated
  expression tree, never a cross-row float aggregation — so Spark and
  the DuckDB oracle produce bit-identical doubles (modulo the last ulp
  of ``ln``, absorbed by round(score, 6)).
- The alternative formulation (explode → inverted index → tf/df join)
  wins only when q is large or the index is reused across many
  queries; for ad-hoc search the expression form does one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _eq(term: str):
    # closure factory — a default-arg lambda would be 2-arity and Spark
    # would bind the array index to the second parameter
    return lambda x: x == F.lit(term)


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 for ``query_terms``.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)   [Robertson/Lucene form]

    Returns (doc_id, score) with score rounded to 6 decimals, ordered
    score desc then doc_id asc (deterministic tie-break), only matching
    documents (score > 0).
    """
    terms = [t.lower() for t in query_terms]
    base = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(text_col).alias("toks")
    )
    tf_cols = [
        F.size(F.filter(F.col("toks"), _eq(t)))
        .cast("long")
        .alias(f"tf{i}")
        for i, t in enumerate(terms)
    ]
    base = base.select(
        "doc_id", F.size("toks").cast("long").alias("dl"), *tf_cols
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("dl").cast("double").alias("sumdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sumdl") / F.col("n")
    score: Column | None = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}")
        idf = F.log(
            (F.col("n") - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0)
        )
        contrib = (idf * (tf * (1.0 + k1))) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
        )
        score = contrib if score is None else score + contrib
    assert score is not None
    any_match = sum(F.col(f"tf{i}") for i in range(len(terms))) > 0
    return (
        scored.where(any_match)
        .select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bm25_rank`, generated from the same term
    list so the expression shapes (and float-op order) stay in sync."""
    terms = [t.lower() for t in query_terms]
    tf_defs = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::BIGINT AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_defs = ",\n             ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{i}"
        for i in range(len(terms))
    )
    contribs = []
    for i in range(len(terms)):
        idf = f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        contribs.append(
            f"(({idf}) * (tf{i}::DOUBLE * {1.0 + k1!r})) / "
            f"(tf{i}::DOUBLE + {k1!r} * ({1.0 - b!r} + {b!r} * (dl::DOUBLE / (sumdl / n))))"
        )
    score_sql = " + ".join(contribs)
    any_match = " + ".join(f"tf{i}" for i in range(len(terms)))
    return rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
      FROM {table}
    ),
    base AS (
      SELECT doc_id, len(toks)::BIGINT AS dl,
             {tf_defs}
      FROM t
    ),
    stats AS (
      SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sumdl,
             {df_defs}
      FROM base
    )
    SELECT doc_id, round({score_sql}, 6) AS score
    FROM base, stats
    WHERE ({any_match}) > 0
    ORDER BY score DESC, doc_id ASC
    LIMIT {k}
    """


def with_rank(
    df: DataFrame,
    order_col: str = "score",
    id_col: str = "doc_id",
    ascending: bool = False,
) -> DataFrame:
    """Attach a deterministic dense 1-based ``rank`` column: ordered by
    ``order_col`` (desc by default), ties broken by ``id_col`` asc.
    Meant for small top-N candidate lists (single-partition window)."""
    from pyspark.sql import Window

    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.orderBy(order, F.col(id_col).asc())
    return df.withColumn("rank", F.row_number().over(w).cast("long"))


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    ``score(d) = Σ_r 1/(k0 + rank_r(d))`` over every ranking ``r`` that
    returned ``d``. The standard way to combine lexical (BM25) and
    dense (embedding) retrieval without score calibration — ranks are
    comparable across retrievers even when scores aren't.

    Each input must carry ``(id_col, rank)``. Shape: union of the
    (tiny, already top-N) candidate lists → one groupBy on the id —
    a single shuffle over N·|rankings| rows regardless of corpus size,
    so fusing sits entirely after the heavy retrieval stages.

    Determinism: with ≤2 rankings the per-doc sum adds ≤2 doubles
    (commutative, order-proof); beyond that ``round(…, 6)`` absorbs
    association order. Final ranking breaks ties by id asc.
    """
    tagged = None
    for r in rankings:
        part = r.select(
            F.col(id_col), F.col("rank").cast("long").alias("rank")
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    assert tagged is not None
    fused = tagged.groupBy(id_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(k0) + F.col("rank")).cast("double")), 6
        ).alias("rrf_score"),
        F.count("*").cast("long").alias("n_sources"),
    )
    out = with_rank(fused, order_col="rrf_score", id_col=id_col)
    return out.where(F.col("rank") <= k)


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF:
    ``score = tf · (ln((N + 1) / (df + 1)) + 1)`` (the sklearn
    ``smooth_idf`` form — never divides by zero, never goes negative).

    Keyword extraction / document profiling for corpus curation. Rank
    is computed on ``round(score, 6)`` with a term-name tie-break, so
    the winner set is deterministic and engine-independent (raw libm
    ``ln`` may differ in the last ulp between engines; ranking on the
    rounded value absorbs it — same contract as BM25 above).

    Scale shape: one explode → (doc, term) count [shuffle 1, map-side
    combined], document frequencies as a second partial agg over terms
    [shuffle 2, output ~vocab-sized], joined back on the term key; the
    per-doc top-k window shuffles on doc_id [shuffle 3]. The df join is
    broadcast when the vocabulary is small — for open-domain text the
    vocab table is still tiny next to the corpus.
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    # N folds into the plan lazily (1-row agg broadcast-cross-joined in)
    # rather than docs.count() at construction time — building the query
    # must not trigger a scan job, and the lazy form composes with
    # caching/streaming sources.
    n_docs_df = docs.agg(F.count("*").cast("double").alias("__n_docs"))
    df_tbl = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("__n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1)).cast("double")
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )
