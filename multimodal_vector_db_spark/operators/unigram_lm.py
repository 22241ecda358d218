"""Unigram-LM (SentencePiece-style) tokenizer training — the EM
companion to BPE (Kudo, ACL 2018, arXiv:1804.10959), with pieces up to
``MAX_PIECE = 4`` characters (a real SentencePiece-shaped inventory;
round 6 shipped the 2-char form, round 7 generalized the lattice).

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
``count / total`` of integer counts; the DP carries the last
``MAX_PIECE`` lattice values and evaluates
``V(j+1) = max_{L=1..MAX_PIECE} V(j+1−L)·p(w[j+1−L:j+1])`` with each
candidate a left-to-right product chain in the same order both engines
use, so candidates are bitwise equal; ties pick the SHORTEST piece
(first maximum in ascending-L order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: maximum piece length. The Viterbi state stays fixed-width
#: (``MAX_PIECE`` trailing lattice values / segmentations), which is
#: what lets the oracle replay the DP as a recursive CTE carrying
#: ``MAX_PIECE`` columns.
MAX_PIECE = 4


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


def seed_piece_counts(
    wf: DataFrame, max_piece: int = MAX_PIECE, top_k_multi: int | None = None
) -> DataFrame:
    """Iteration-0 model counts: every substring of length 1..
    ``max_piece`` across the corpus (weighted by word frequency) →
    ``(piece, c)``. One explode over per-word piece lists; map-side
    combinable. With ``top_k_multi`` set, multi-char pieces are capped
    at the K most frequent (count DESC, piece ASC — deterministic);
    single chars always survive so coverage never breaks — the
    SentencePiece seeding rule for corpora whose substring inventory
    would otherwise explode (the 100 TB knob; Heaps'-law vocab keeps
    the full inventory tractable at bench scales)."""
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(max_piece)),
            lambda l: F.when(
                F.length("w") >= l,
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - l + 1),
                    lambda i: F.col("w").substr(i, l),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    counts = (
        wf.select("freq", F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("c"))
    )
    if top_k_multi is None:
        return counts
    chars = counts.where(F.length("piece") == 1)
    multi = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.col("c").desc(), F.col("piece").asc())
        .limit(top_k_multi)
    )
    return chars.unionByName(multi)


def _viterbi(word: str, probs: dict, max_piece: int = MAX_PIECE) -> list:
    """Best segmentation of ``word`` into pieces of length ≤
    ``max_piece`` under piece probabilities ``probs`` (missing piece =
    probability 0). EXACT mirror of the oracle's recursive CTE: the
    state is the last ``max_piece`` (value, segmentation) pairs;
    candidate L is ``V(j+1−L)·p(w[j+1−L:j+1])``, each a left-to-right
    product chain; ties pick the FIRST maximum in ascending-L order
    (the shortest piece)."""
    # hist[L-1] = (V(j+1-L), seg at j+1-L); starts at j = 0
    hist: list = [(1.0, [])] + [(0.0, [])] * (max_piece - 1)
    for j in range(len(word)):
        best_v = None
        best_seg = None
        for piece_len in range(1, max_piece + 1):
            start = j + 1 - piece_len
            if start < 0:
                break
            v_prev, seg_prev = hist[piece_len - 1]
            cand = v_prev * probs.get(word[start : j + 1], 0.0)
            if best_v is None or cand > best_v:
                best_v = cand
                best_seg = seg_prev + [word[start : j + 1]]
        hist = [(best_v, best_seg)] + hist[:-1]
    return hist[0][1]


def viterbi_piece_counts(
    wf: DataFrame, probs: dict, max_piece: int = MAX_PIECE
) -> DataFrame:
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
                    seg = cache[w] = _viterbi(w, probs, max_piece)
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


def seed_probs(
    wf: DataFrame, max_piece: int = MAX_PIECE, top_k_multi: int | None = None
) -> dict:
    """Iteration-0 probabilities: exact integer-ratio normalization of
    :func:`seed_piece_counts` (count/total in one IEEE division — the
    bitwise-reproducible form the oracle replays)."""
    rows = seed_piece_counts(wf, max_piece, top_k_multi).collect()
    tot = float(sum(r["c"] for r in rows))
    return {r["piece"]: r["c"] / tot for r in rows}


def viterbi_loglik(
    wf: DataFrame, probs: dict, max_piece: int = MAX_PIECE
) -> float:
    """Hard-EM objective ``J = Σ_w freq(w) · log P(seg*_w)`` under
    ``probs`` — the quantity each EM round must not decrease."""
    import math

    rows = wf.collect()
    j = 0.0
    for r in rows:
        seg = _viterbi(r["w"], probs, max_piece)
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
    max_piece: int = MAX_PIECE,
    top_k_multi: int | None = None,
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
    probs = seed_probs(wf, max_piece, top_k_multi)
    history = [viterbi_loglik(wf, probs, max_piece)]
    for _ in range(n_iters):
        counts = viterbi_piece_counts(wf, probs, max_piece).collect()
        tot = float(sum(r["n"] for r in counts))
        probs = {r["piece"]: r["n"] / tot for r in counts}
        history.append(viterbi_loglik(wf, probs, max_piece))
    return probs, history


def viterbi_segments(
    wf: DataFrame, probs: dict, max_piece: int = MAX_PIECE
) -> DataFrame:
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
                {"w": ws, "seg": [_viterbi(w, probs, max_piece) for w in ws]}
            )

    return wf.select("w").distinct().mapInPandas(run, schema=out_schema)


def prune_to_vocab(counts: list, keep_multi: int) -> dict:
    """SentencePiece's vocabulary-size control (Kudo 2018 §3.2: after
    each EM round the inventory is pruned toward the target size):
    keep every single-char piece (coverage can never break) plus the
    ``keep_multi`` highest-count multi-char pieces (count DESC, piece
    ASC — deterministic), renormalize the survivors' counts into a
    probability model (exact integer ratios, one IEEE division each —
    the bitwise-reproducible form the oracle replays).

    ``counts`` is the E-step output — an iterable of ``(piece, n)``
    rows/tuples. Driver-side: the inventory is KBs."""
    pairs = [
        (r["piece"], int(r["n"])) if not isinstance(r, tuple) else r
        for r in counts
    ]
    chars = [(p, n) for p, n in pairs if len(p) == 1]
    multi = sorted(
        ((p, n) for p, n in pairs if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:keep_multi]
    kept = chars + multi
    tot = float(sum(n for _, n in kept))
    return {p: n / tot for p, n in kept}
