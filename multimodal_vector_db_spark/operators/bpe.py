"""Byte-pair-encoding tokenizer training — the missing piece between
the engine's whitespace/regex token counters and a real subword
pipeline (Sennrich et al., ACL 2016, arXiv:1508.07909).

Division of labor follows every production BPE trainer (HF tokenizers,
SentencePiece, the original subword-nmt): the corpus-sized work —
word-frequency extraction — is distributed (one groupBy over exploded
tokens, map-side combinable), and the merge loop runs over the
WORD-FREQUENCY TABLE, which is vocab-bounded (~10⁷ rows for web-scale
corpora — driver-safe) and independent of corpus size. Applying the
learned merges is distributed again: an Arrow-batched ``mapInPandas``
with a per-executor merge-rank dict.

Determinism contract: pair counts tie-break lexicographically on the
pair itself, so the merge sequence is a pure function of the
word-frequency table — reproducible across runs, partitionings, and
engines. The canonical Sennrich example is pinned as a known-answer
test; invariants (monotone token-count decrease, concatenation
round-trip) are property-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (subword-nmt convention)
EOW = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """``(word, count)`` over whitespace tokens — the distributed half
    of BPE training (and oracle-checkable on its own: a plain explode +
    groupBy)."""
    from multimodal_vector_db_spark.functions.text import tokens

    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return (
        docs.select(F.explode(tokens(t)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("count"))
    )


def train_bpe_merges(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Exact BPE merge learning over a word-frequency table (pure
    Python — the table is vocab-bounded, never corpus-bounded).

    Each word is a symbol sequence ``(c1, c2, ..., cn + EOW)``; every
    round counts adjacent symbol pairs weighted by word frequency,
    merges the most frequent pair (ties → lexicographically smallest
    pair), and rewrites the table. Returns the ordered merge list.
    Stops early when no pair occurs twice."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in word_counts:
        if not word:
            continue
        syms = tuple(word[:-1]) + (word[-1] + EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(cnt)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        (a, b), best_cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_cnt < 2:
            break
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + cnt
        vocab = new_vocab
        merges.append((a, b))
    return merges


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    max_vocab_rows: int = 2_000_000,
) -> list[tuple[str, str]]:
    """End-to-end BPE training: distributed word counts →
    driver-side exact merge loop. ``max_vocab_rows`` guards the
    collect (a 100 TB corpus's DISTINCT-word table is vocab-bounded,
    but a pathological one — e.g. unsegmented ids — is not; raise the
    cap consciously or pre-filter)."""
    wf = word_frequencies(docs, text_col, lowercase)
    n = wf.count()
    if n > max_vocab_rows:
        raise ValueError(
            f"word-frequency table has {n} rows > max_vocab_rows="
            f"{max_vocab_rows}; pre-filter (min count) or raise the cap"
        )
    counts = [(r["word"], r["count"]) for r in wf.collect()]
    counts.sort()  # partition-order independence for the merge loop
    return train_bpe_merges(counts, n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    LOWEST-RANK adjacent pair (the standard BPE apply — rank order, not
    left-to-right scan order)."""
    if not word:
        return []
    syms = list(word[:-1]) + [word[-1] + EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, (a, b) in enumerate(zip(syms, syms[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Distributed BPE tokenization: ``(id, n_words, n_bpe_tokens,
    bpe_preview)`` per document via Arrow-batched ``mapInPandas`` —
    the merge-rank dict rides the task closure (merge tables are KBs
    to MBs; broadcast-sized by construction). ``bpe_preview`` is the
    first 8 subword tokens joined with '␣' (a scalar column — the
    full token array stays out of the result per the array-ban
    contract)."""
    from pyspark.sql import types as T

    ranks = {pair: i for i, pair in enumerate(merges)}

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_bpe_tokens", T.LongType()),
            T.StructField("bpe_preview", T.StringType()),
        ]
    )

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = encode_word(w, ranks)
            return got

        for pdf in batches:
            ids, nw, nb, pv = [], [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                words = (text.lower() if lowercase else text).split()
                toks: list[str] = []
                for w in words:
                    toks.extend(enc(w))
                ids.append(i)
                nw.append(len(words))
                nb.append(len(toks))
                pv.append("␣".join(toks[:8]))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_words": nw,
                    "n_bpe_tokens": nb,
                    "bpe_preview": pv,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)
