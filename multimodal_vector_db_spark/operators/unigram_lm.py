"""Unigram-LM (SentencePiece-style) tokenizer training — the EM
companion to BPE (Kudo, ACL 2018, arXiv:1804.10959), simplified to a
2-char-max piece inventory so every step is exactly replayable.

Division of labor (the PCA/IVF fit-type split, operators/bpe.py's
twin): the corpus-sized work — word-frequency extraction and the
E-step's per-word Viterbi lattice — is distributed (the lattice DP
runs per DISTINCT word, a vocab-bounded table, inside an Arrow-batched
``mapInPandas``; expected counts aggregate with one piece-keyed
groupBy, map-side combinable), while the M-step is a driver-side
renormalize over the piece inventory (KBs).

This is HARD EM (classification EM, the Viterbi-training mode
SentencePiece itself offers): the E-step assigns each word its single
maximum-probability segmentation, the M-step renormalizes piece counts
over those segmentations. Hard EM's objective
``J = Σ_w freq(w) · log P(w, seg_w)`` is monotonically non-decreasing
(M maximizes J given segmentations, Viterbi-E maximizes J given
probabilities) — pinned by the property test in
tests/test_text_pipeline.py.

Determinism contract (what makes `unigram_token_stats` hash-checkable
against a DuckDB recursive-CTE replay): probabilities are exact ratios
``count / total`` of integer counts; the DP multiplies left-to-right
(``V(j+1) = max(V(j)·p(char), V(j-1)·p(bigram))``) in the same order
both engines use, so candidates are bitwise equal; ties prefer the
single-char path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: maximum piece length — chars + char-bigrams. Keeps the Viterbi
#: state fixed-width (two trailing lattice values), which is what lets
#: the oracle replay the DP as a recursive CTE.
MAX_PIECE = 2


def word_freqs(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """``(w, freq)`` over whitespace tokens — shared with the BPE
    trainer (operators/bpe.py:word_frequencies semantics)."""
    from multimodal_vector_db_spark.functions.text import tokens

    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return (
        docs.select(F.explode(tokens(t)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def seed_piece_counts(wf: DataFrame) -> DataFrame:
    """Iteration-0 model counts: every char and char-bigram occurrence
    across the corpus (weighted by word frequency) → ``(piece, c)``.
    One explode over per-word piece lists; map-side combinable."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    bigrams = F.when(
        F.length("w") < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.col("w").substr(i, F.lit(2)),
        )
    )
    return (
        wf.select("freq", F.explode(F.concat(chars, bigrams)).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("c"))
    )


def _viterbi(word: str, probs: dict) -> list:
    """Best segmentation of ``word`` into pieces of length <= 2 under
    piece probabilities ``probs`` (missing piece = probability 0).
    EXACT mirror of the oracle's recursive CTE: candidates are
    ``V(j)·p(char)`` vs ``V(j-1)·p(bigram)``, each a left-to-right
    product chain; ties keep the single-char path."""
    v1, v2 = 1.0, 0.0  # V(j), V(j-1)
    seg1: list = []
    seg2: list = []
    for j in range(len(word)):
        pc = probs.get(word[j], 0.0)
        cand1 = v1 * pc
        if j >= 1:
            pb = probs.get(word[j - 1 : j + 1], 0.0)
            cand2 = v2 * pb
        else:
            cand2 = -1.0
        if cand2 > cand1:
            nv, nseg = cand2, seg2 + [word[j - 1 : j + 1]]
        else:
            nv, nseg = cand1, seg1 + [word[j]]
        v2, seg2 = v1, seg1
        v1, seg1 = nv, nseg
    return seg1


def viterbi_piece_counts(wf: DataFrame, probs: dict) -> DataFrame:
    """Hard-EM E-step, distributed: Viterbi-segment every DISTINCT
    word (Arrow-batched ``mapInPandas``, the prob table rides the
    closure — piece inventories are KBs), weight each piece occurrence
    by the word's corpus frequency, aggregate → ``(piece, n)``."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("piece", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def run(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            agg: dict = {}
            for w, f_ in zip(pdf["w"], pdf["freq"]):
                seg = cache.get(w)
                if seg is None:
                    seg = cache[w] = _viterbi(w, probs)
                for p in seg:
                    agg[p] = agg.get(p, 0) + int(f_)
            yield pd.DataFrame(
                {"piece": list(agg.keys()), "n": list(agg.values())}
            )

    return (
        wf.mapInPandas(run, schema=out_schema)
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def seed_probs(wf: DataFrame) -> dict:
    """Iteration-0 probabilities: exact integer-ratio normalization of
    :func:`seed_piece_counts` (count/total in one IEEE division — the
    bitwise-reproducible form the oracle replays)."""
    rows = seed_piece_counts(wf).collect()
    tot = float(sum(r["c"] for r in rows))
    return {r["piece"]: r["c"] / tot for r in rows}


def viterbi_loglik(wf: DataFrame, probs: dict) -> float:
    """Hard-EM objective ``J = Σ_w freq(w) · log P(seg*_w)`` under
    ``probs`` — the quantity each EM round must not decrease."""
    import math

    rows = wf.collect()
    j = 0.0
    for r in rows:
        seg = _viterbi(r["w"], probs)
        lp = 0.0
        for p in seg:
            lp += math.log(probs[p])
        j += r["freq"] * lp
    return j


def unigram_train(
    docs: DataFrame,
    n_iters: int = 4,
    text_col: str = "text",
    max_vocab_rows: int = 2_000_000,
) -> tuple[dict, list]:
    """End-to-end hard-EM training: seed model from raw piece counts,
    then ``n_iters`` rounds of distributed Viterbi-E + driver
    renormalize-M. Pieces that stop appearing in best segmentations
    drop out (SentencePiece's prune). Returns ``(probs, history)``
    where history is the per-iteration objective (non-decreasing).
    ``max_vocab_rows`` guards the distinct-word collect exactly like
    learn_bpe's."""
    wf = word_freqs(docs, text_col)
    n = wf.count()
    if n > max_vocab_rows:
        raise ValueError(
            f"distinct-word table has {n} rows > max_vocab_rows="
            f"{max_vocab_rows}; pre-filter (min count) or raise the cap"
        )
    wf = wf.localCheckpoint(eager=True)  # E-step runs n_iters times
    probs = seed_probs(wf)
    history = [viterbi_loglik(wf, probs)]
    for _ in range(n_iters):
        counts = viterbi_piece_counts(wf, probs).collect()
        tot = float(sum(r["n"] for r in counts))
        probs = {r["piece"]: r["n"] / tot for r in counts}
        history.append(viterbi_loglik(wf, probs))
    return probs, history


def viterbi_segments(wf: DataFrame, probs: dict) -> DataFrame:
    """Per-distinct-word best segmentation under ``probs`` →
    ``(w, seg ARRAY<STRING>)`` — the apply-side companion of
    :func:`viterbi_piece_counts` (same DP, segmentation kept instead
    of aggregated)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("w", T.StringType()),
            T.StructField("seg", T.ArrayType(T.StringType())),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ws = pdf["w"].tolist()
            yield pd.DataFrame(
                {"w": ws, "seg": [_viterbi(w, probs) for w in ws]}
            )

    return wf.select("w").distinct().mapInPandas(run, schema=out_schema)
