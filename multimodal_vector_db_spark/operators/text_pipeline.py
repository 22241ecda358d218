"""Corpus-preparation operators: chunking, inverted index, PII masking.

Training-data-pipeline extensions beyond the reference's query surface
(the reference stops at embedding-level retrieval; a 100 TB corpus
pipeline also has to chunk documents for embedding, build lexical
postings, and strip identifiers before training). All pure built-in
expressions — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    window: int = 20,
    stride: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunking with overlap (the RAG/embedding
    prep step): windows of ``window`` tokens every ``stride`` tokens;
    the final window may be short. Returns
    ``(doc_id, chunk_id, n_tokens, chunk_text)``.

    Scale shape: windows are materialized *within the row* via
    ``sequence``/``transform``/``slice`` and then exploded — a narrow
    map with no shuffle at all; output partitioning inherits the scan,
    so chunk → embed pipelines stay co-partitioned by document.
    """
    toks = tokens(text_col)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.lit(0), F.size(toks) - 1),
        F.lit(stride),
    )
    chunks = F.transform(starts, lambda st: F.slice(toks, st + 1, window))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks)
    )
    return exploded.select(
        "doc_id",
        F.col("pos").cast("long").alias("chunk_id"),
        F.size("col").cast("long").alias("n_tokens"),
        F.array_join("col", " ").alias("chunk_text"),
    )


def inverted_index(
    docs: DataFrame,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed inverted-index build: one row per term with document
    frequency and the sorted postings list,
    ``(term, df, postings: array<long>)``.

    Shape: ``explode(array_distinct(tokens))`` → one hash-aggregate on
    the term — the canonical one-shuffle index build with map-side
    combine. At 100 TB the only hazard is stopword skew: the df filter
    prunes AFTER the agg, so genuinely hot terms should be handled by
    salting the groupBy (operators/joins.py:salted_join pattern) or by
    a two-level agg (term, doc_id-bucket) → term.
    """
    term_docs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    )
    agg = term_docs.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
    )
    return agg.where(F.col("df") >= min_df)


def mask_digits(col: Column | str, repl: str = "#") -> Column:
    """Replace every ASCII digit — masks ids, phone-style fields."""
    return F.regexp_replace(col, "[0-9]", repl)


def pseudonymize(col: Column | str, salt: str, length: int = 16) -> Column:
    """Deterministic salted-hash pseudonym for an identifier column:
    ``sha2(salt || value)`` truncated to ``length`` hex chars. Stable
    across runs (joins on the pseudonym still work) while unlinkable
    without the salt. Pure codegen'd expression — no shuffle, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        F.sha2(F.concat(F.lit(salt), c.cast("string")), 256), 1, length
    )


def bigram_lm_scores(
    docs: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
    broadcast_model: bool = True,
) -> "DataFrame":
    """Interpolated bigram language-model quality scoring — the signal
    `doc_quality`'s surface heuristics approximate, trained and applied
    as pure aggregations (KenLM-style perplexity filtering, the
    standard pretraining-corpus quality gate; no reference analogue).

    Train: unigram counts c(w), bigram counts c(w1,w2), vocab size V,
    token total N over the WHOLE corpus. Score: per document, the mean
    negative log-probability over its bigram positions under

        p(w2 | w1) = lam * c(w1,w2)/c(w1)
                     + (1-lam) * (c(w2)+1)/(N+V)

    (MLE bigram interpolated with an add-one unigram floor — every
    scored position has c(w1,w2) >= 1 since the model is trained on
    the corpus it scores, the perplexity-filter setting).

    Returns ``(id, n_bigrams, log_ppl)`` for documents with >= 1
    bigram; lower log_ppl = more typical of the corpus.

    Scale: two explode+groupBy passes (token keys, map-side combine)
    build the model; with ``broadcast_model`` the count tables ship to
    executors and scoring is one map-side pass + a doc-id groupBy —
    right whenever the vocab fits in memory (even web-scale vocabs are
    ~10^7 rows ≈ a few hundred MB). Set it False for an unbounded
    vocab: the joins become shuffle hash joins on token keys (skewed
    stopword keys → rely on AQE skew-join splitting)."""
    from pyspark.sql import DataFrame as _DF  # noqa: F401

    from multimodal_vector_db_spark.functions.text import (
        tokens,
        word_bigrams_all,
    )

    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("id"), toks.alias("toks"))
    uni = (
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    pairs = base.select(
        "id", F.explode(word_bigrams_all(F.col("toks"))).alias("bg")
    ).select(
        "id",
        F.split(F.col("bg"), " ", 2).getItem(0).alias("w1"),
        F.split(F.col("bg"), " ", 2).getItem(1).alias("w2"),
    )
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    if broadcast_model:
        # Pin the vocab-bounded model tables: the scoring pass joins
        # uni THREE times and big once — un-pinned, each reference
        # re-scans and re-aggregates the whole corpus (12 parquet
        # scans in the ensemble gate's audited plan vs 3 pinned).
        # Exactly the tables the broadcast ships anyway.
        uni = uni.localCheckpoint(eager=True)
        big = big.localCheckpoint(eager=True)
    totals = uni.agg(
        F.sum("c").alias("N"), F.count("*").alias("V")
    )
    maybe_b = F.broadcast if broadcast_model else (lambda df: df)
    scored = (
        pairs.join(maybe_b(big), ["w1", "w2"])
        .join(
            maybe_b(uni.select(F.col("w").alias("w1"),
                               F.col("c").alias("c1"))),
            "w1",
        )
        .join(
            maybe_b(uni.select(F.col("w").alias("w2"),
                               F.col("c").alias("c2"))),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            (
                F.lit(lam) * F.col("c12").cast("double")
                / F.col("c1").cast("double")
                + F.lit(1.0 - lam)
                * (F.col("c2") + 1).cast("double")
                / (F.col("N") + F.col("V")).cast("double")
            ).alias("p"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        (-F.avg(F.log("p"))).alias("log_ppl"),
    )


def source_reputation_gate(
    docs: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    dup_rate_block: float = 0.5,
    lam: float = 0.75,
) -> "DataFrame":
    """UT1-style source-reputation curation gate — the per-SOURCE
    aggregate view every large pretraining pipeline keeps (RefinedWeb /
    FineWeb blocklist construction; no reference analogue): roll three
    document-level signals up to the source, derive a data-driven
    blocklist, and report the post-gate corpus.

    Signals per source: mean heuristic quality (``quality_score``),
    mean bigram-LM log-perplexity (:func:`bigram_lm_scores` — averaged
    over the source's docs that have >= 1 bigram), and exact-duplicate
    rate (fraction of docs whose full text occurs more than once in
    the corpus). A source is BLOCKED when its dup rate exceeds
    ``dup_rate_block``, or when it is jointly worse than the
    (unweighted) cross-source mean on both quality and perplexity.
    Kept counts come from an actual broadcast anti-join of the
    blocklist against the documents — the gate as a pipeline stage,
    not just a report.

    Returns one row per source: ``(source, n_docs, mean_quality,
    mean_log_ppl, dup_rate, blocked, kept_docs)``.

    Scale shape: two token-keyed aggregations (the LM) + one
    digest-keyed aggregation (dup detection — keys on ``md5(text)``,
    the 32-byte pattern of :func:`~multimodal_vector_db_spark.
    operators.dedup.exact_duplicates`, so the dup stage shuffles
    digests, never corpus text) + one groupBy(source) — all map-side
    combinable; the source table itself is tiny (thousands of rows
    even web-scale), so the global means and the blocklist are
    broadcast. Nothing is quadratic; nothing collects the corpus."""
    from multimodal_vector_db_spark.functions.text import quality_score

    per_doc = docs.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.md5(F.col(text_col)).alias("__h"),
        quality_score(F.col(text_col)).alias("q"),
    )
    ppl = bigram_lm_scores(docs, text_col, id_col, lam=lam).select(
        "id", "log_ppl"
    )
    dup_texts = (
        docs.groupBy(F.md5(F.col(text_col)).alias("__h"))
        .agg(F.count("*").alias("__n_occ"))
    )
    # Per-source means over INTEGER-scaled per-doc values (×1e6 of the
    # 6-decimal-rounded signals): integer sums are order-free exact,
    # so the mean is bit-identical in any engine at any scale, while
    # staying a plain map-side-combinable groupBy — a float
    # F.avg(double) here is shuffle-order-sensitive in its last ulp,
    # which surfaced as a round(·, 6) boundary flip at sf0.1 (one
    # source's mean_quality 0.6760765 rounding differently per run).
    scored = (
        per_doc.join(ppl, "id", "left")
        .join(dup_texts, "__h")
        .select(
            "source",
            F.round(F.col("q") * 1e6).cast("long").alias("qi"),
            F.round(F.round("log_ppl", 6) * 1e6).cast("long").alias("pi"),
            F.when(F.col("__n_occ") > 1, 1).otherwise(0).alias("is_dup"),
        )
    )
    src = scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("qi").alias("sq"),
        F.sum("pi").alias("sp"),
        F.count("pi").alias("np_"),  # docs with >= 1 bigram
        F.avg(F.col("is_dup").cast("double")).alias("dr"),
    )
    src = src.select(
        "source",
        "n_docs",
        (F.col("sq").cast("double") / F.col("n_docs") / 1e6).alias("mq"),
        (F.col("sp").cast("double") / F.col("np_") / 1e6).alias("mp"),
        "dr",
    )
    # The per-source table is tiny (thousands of rows web-scale) but
    # feeds FOUR consumers (global means, blocklist, gate, final
    # report); without pinning it, Catalyst re-derives the whole
    # corpus-sized LM/quality/dup subtree per consumer — measured 29
    # parquet scans in the audited plan vs 8 with the checkpoint.
    src = src.localCheckpoint(eager=True)
    glob = src.agg(F.avg("mq").alias("gq"), F.avg("mp").alias("gp"))
    gated = src.crossJoin(F.broadcast(glob)).select(
        "source",
        "n_docs",
        "mq",
        "mp",
        "dr",
        F.when(
            (F.col("dr") > F.lit(dup_rate_block))
            | ((F.col("mp") > F.col("gp")) & (F.col("mq") < F.col("gq"))),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("blocked"),
    )
    blocklist = gated.where(F.col("blocked") == 1).select("source")
    kept = (
        docs.select(F.col(source_col).alias("source"))
        .join(F.broadcast(blocklist), "source", "left_anti")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("kept_docs"))
    )
    return (
        gated.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.round("mq", 6).alias("mean_quality"),
            F.round("mp", 6).alias("mean_log_ppl"),
            F.round("dr", 6).alias("dup_rate"),
            "blocked",
            F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
        )
    )
