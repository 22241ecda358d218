"""Text-analysis Column expressions for large-scale training-data
pipelines: tokenization, quality scoring, language-ID heuristics,
document fingerprinting, shingling.

All pure Catalyst expressions (regexp / array / aggregate functions), so
they run inside whole-stage codegen over the `documents` table at any
scale — no Python in the hot path. Each has an exact ANSI-SQL twin for
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions._cache import cached_expr

# BPE-ish word/token pattern: words, numbers, or single non-space symbols.
TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# A tiny multi-language stopword panel for the language-ID heuristic.
STOPWORDS_EN = ["the", "a", "and", "of", "to", "in", "is", "it"]


@cached_expr
def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → ARRAY<STRING> (empty array for empty text)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


@cached_expr
def token_count(text: Column | str) -> Column:
    """Whitespace token count as BIGINT."""
    return F.size(tokens(text)).cast("long")


@cached_expr
def regex_token_count(text: Column | str) -> Column:
    """BPE-ish token count: words / number runs / single symbols."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.filter(
            F.split(text, r"((?<=[a-zA-Z0-9])(?=[^a-zA-Z0-9\s])|(?<=[^a-zA-Z0-9\s])|\s)+"),
            lambda t: t != "",
        )
    ).cast("long")


@cached_expr
def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are (lowercased) stopwords."""
    stopwords = stopwords or STOPWORDS_EN
    toks = tokens(text)
    hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*stopwords))
    ).cast("double")
    return F.try_divide(hits, F.size(toks).cast("double"))


@cached_expr
def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are non-alphanumeric, non-space."""
    text = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(text, r"[^a-zA-Z0-9\s]", "")
    return F.try_divide(
        (F.length(text) - F.length(stripped)).cast("double"),
        F.length(text).cast("double"),
    )


@cached_expr
def mean_word_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    return F.try_divide(total, F.size(toks).cast("double"))


@cached_expr
def quality_score(text: Column | str) -> Column:
    """A deterministic document-quality heuristic in [0, 1]:
    rewards reasonable length, moderate stopword ratio, low punctuation.
    (Shape mirrors C4/Gopher-style rule filters from public pipelines.)
    """
    text = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw = F.coalesce(stopword_ratio(text), F.lit(0.0))
    sw_score = F.lit(1.0) - F.least(F.abs(sw - 0.3) / F.lit(0.3), F.lit(1.0))
    punct = F.coalesce(punct_ratio(text), F.lit(0.0))
    punct_score = F.lit(1.0) - F.least(punct * 2.0, F.lit(1.0))
    return F.round((len_score + sw_score + punct_score) / 3.0, 6)


@cached_expr
def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of the lowercased text → ARRAY<STRING>."""
    text = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(text)
    # guard: sequence(1, 0) in Spark is DESCENDING [1,0], so emit [] for
    # strings shorter than n
    return F.when(F.length(lowered) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(lowered) - (n - 1)),
                lambda i: F.substring(lowered, i, n),
            )
        )
    )


@cached_expr
def word_shingles(text: Column | str, n: int = 2) -> Column:
    """Distinct word n-gram shingles → ARRAY<STRING> (for MinHash/Jaccard)."""
    return word_shingles_from_tokens(
        tokens(F.lower(text if isinstance(text, Column) else F.col(text))), n
    )


@cached_expr
def word_shingles_from_tokens(toks: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles from an ALREADY-TOKENIZED column —
    use when the pipeline has the token array anyway, so the regex
    split isn't evaluated a second time."""
    k = F.size(toks)
    return F.when(k < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
    )


@cached_expr
def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string arrays (order-insensitive)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.try_divide(inter, union)


@cached_expr
def fingerprint(text: Column | str) -> Column:
    """Normalized-content fingerprint for exact dedup: md5 of the
    lowercased, whitespace-collapsed text. Portable to any SQL engine.
    """
    text = F.col(text) if isinstance(text, str) else text
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


#: Classic k-min-hash with k INDEPENDENT hash functions: hash i of a
#: shingle is an 8-nibble (32-bit) slice of md5(salt_block || shingle),
#: four hashes per digest. Independence per hash function is what makes
#: the signature components uncorrelated — affine re-mixing of one hash
#: ((a*h+b) mod P with products < P, or Kirsch–Mitzenmacher h1+i*h2)
#: leaves the same few shingles winning every permutation and floods the
#: LSH bands with spurious collisions (measured: 5×+ candidate pairs).
MINHASH_SALTS = ["", "x:", "y:", "z:"]  # salt per md5 block of 4 hashes


@cached_expr
def md5_nibbles(h: Column, offset: int, width: int = 8) -> Column:
    """Parse md5-hex nibbles [offset, offset+width) into a BIGINT.

    Spark side uses one ``conv(substring(...), 16, 10)`` call — ~25×
    fewer expression nodes than the per-nibble instr() decode (measured
    ~35% off the whole MinHash pipeline). The DuckDB oracles keep the
    per-nibble instr() form (``queries._md5_nibbles_sql``); both
    produce the same BIGINT, which is all the hash-match needs. Width
    must stay ≤ 15 nibbles so the value fits in a signed 64-bit long."""
    assert width <= 15
    return F.conv(F.substring(h, offset + 1, width), 16, 10).cast("long")


def _salted_md5(salt: str):
    # closure factory — a default-arg lambda would be 2-arity and Spark
    # would bind the array INDEX to the second parameter
    if salt == "":
        return lambda s: F.md5(s)
    return lambda s: F.md5(F.concat(F.lit(salt), s))


@cached_expr
def shingle_md5_blocks(shingles: Column, num_hashes: int) -> list[Column]:
    """One md5 transform per block of 4 hash functions (salted)."""
    n_blocks = (num_hashes + 3) // 4
    return [
        F.transform(shingles, _salted_md5(MINHASH_SALTS[blk]))
        for blk in range(n_blocks)
    ]


def _parse_at(offset: int):
    # closure factory: a `lambda h, o=o` default arg would make Spark
    # treat it as the 2-arg (element, index) transform form
    return lambda h: md5_nibbles(h, offset, 8)


@cached_expr
def minhash_signature(md5_blocks: list[Column], num_hashes: int = 8) -> Column:
    """MinHash signature as ARRAY<BIGINT>: sig_i = min over shingles of
    independent 32-bit hash i (nibble slice 8·(i%4) of salted md5 block
    i//4). Two md5 transforms cover 8 hash functions."""
    return F.array(
        *[
            F.array_min(
                F.transform(md5_blocks[i // 4], _parse_at(8 * (i % 4)))
            )
            for i in range(num_hashes)
        ]
    )


@cached_expr
def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: ARRAY<BIGINT> signature → ARRAY<STRING> of band
    bucket keys (band index + md5 of the '|'-joined band slice)."""
    return F.array(
        *[
            F.concat(
                F.lit(f"b{b}:"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(
                                signature, b * rows_per_band + 1, rows_per_band
                            ),
                            lambda x: x.cast("string"),
                        ),
                        "|",
                    )
                ),
            )
            for b in range(bands)
        ]
    )


HEXDIGITS = "0123456789abcdef"


@cached_expr
def token_hash16(tok: Column) -> Column:
    """16-bit token hash: the first 4 hex nibbles of md5 via one conv()
    (the oracles decode per-nibble with instr — same value)."""
    return F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("long")


@cached_expr
def simhash_from_token_hashes(hv: Column, bits: int = 16) -> Column:
    """SimHash from a *materialized* array of 16-bit token hashes.

    Callers should stage ``hv = transform(tokens, token_hash16)`` as its
    own projected column first: higher-order functions are interpreted
    (no codegen/CSE), so inlining ``hv`` here would recompute the md5
    pass once per bit.

    Round 12: each per-bit fold counts SET BITS (``acc + (x>>s) % 2``)
    instead of summing ±1 votes through a CASE; the majority test
    becomes ``2·ones > n``. Pure integer arithmetic — identical hash
    for every input (votes = 2·ones − n, so votes > 0 ⟺ 2·ones > n) —
    with ~3 expression nodes per element instead of 6 (measured −7% on
    the dedup_simhash pipeline, guide §1.2).

    Precondition: ``hv`` must contain no null elements (``token_hash16``
    never yields one). A null element would null the whole ones-count
    and the bit falls to 0, where the old ±1 CASE fold counted it as a
    −1 vote; guard with ``F.filter(hv, x.isNotNull())`` first if null
    tolerance is ever needed.
    """
    assert bits <= 16

    def ones_folder(shift: int):
        # closure factory: keep the merge lambda strictly 2-arg
        return lambda acc, x: acc + F.shiftright(x, shift) % 2

    n = F.size(hv)
    out = F.lit(0).cast("long")
    for b in range(bits):
        shift = bits - 1 - b
        ones = F.aggregate(hv, F.lit(0).cast("long"), ones_folder(shift))
        out = out + F.when(ones * 2 > n, F.lit(2**shift)).otherwise(
            F.lit(0)
        ).cast("long")
    return out


@cached_expr
def simhash_bits(text: Column | str, bits: int = 16) -> Column:
    """SimHash over whitespace tokens as a single Column expression.

    Convenience form; for hot paths prefer staging
    ``transform(tokens(lower(text)), token_hash16)`` as a projected
    column and calling :func:`simhash_from_token_hashes` on it.
    """
    text = F.col(text) if isinstance(text, str) else text
    hv = F.transform(tokens(F.lower(text)), token_hash16)
    return simhash_from_token_hashes(hv, bits)


@cached_expr
def hamming_distance(a: Column, b: Column, bits: int = 16) -> Column:
    """Hamming distance between two BIGINT bit-sets: popcount of XOR
    (``bit_count`` is JVM-codegen'd in Spark and exists in DuckDB too)."""
    del bits  # signature kept for callers that pass an explicit width
    return F.bit_count(a.bitwiseXOR(b))


@cached_expr
def top_unigram_fraction(toks: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token — the
    Gopher repetition rule family ("most common word covers > X% of the
    doc"; Rae et al. 2021, Gopher §A1.1). Pure HOF expression: count
    each distinct token with a nested filter (docs are short; O(u·n)
    per row inside codegen beats an explode+groupBy shuffle)."""
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    return F.try_divide(top.cast("double"), F.size(toks).cast("double"))


@cached_expr
def word_bigrams_all(toks: Column) -> Column:
    """ALL consecutive word bigrams (duplicates kept — unlike
    :func:`word_shingles`, which is distinct-set semantics for Jaccard)."""
    n = F.size(toks)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )


@cached_expr
def dup_bigram_fraction(toks: Column) -> Column:
    """1 − distinct/total over consecutive word bigrams — the Gopher
    "fraction of duplicate n-grams" repetition signal."""
    big = word_bigrams_all(toks)
    return F.try_divide(
        (F.size(big) - F.size(F.array_distinct(big))).cast("double"),
        F.size(big).cast("double"),
    )


@cached_expr
def minhash_signature_xxhash(shingles: Column, num_hashes: int = 8) -> Column:
    """MinHash signature via seeded ``xxhash64`` — the 100 TB fast path.

    md5 (the oracle-portable basis) makes the JVM format a 32-char hex
    STRING per shingle per block and re-parse nibbles back to ints;
    here each hash function is the variadic ``xxhash64(lit(i), s)`` —
    Spark chains the literal's hash into the string's hash as its seed,
    giving an independent function per i with ZERO per-shingle string
    allocation (an earlier salted-``concat`` variant allocated
    salt+shingle num_hashes× per shingle and measured slower than the
    md5 basis it was meant to beat). The affine/Kirsch-Mitzenmacher
    shortcut is still avoided — seeded rehash preserves minwise
    independence. Not oracle-checkable (DuckDB has no xxhash64), so the
    declared query keeps md5; operators accept ``hash_impl="xxhash64"``
    for production use.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s, i=i: F.xxhash64(F.lit(i), s))
            )
            for i in range(num_hashes)
        ]
    )


@cached_expr
def lsh_band_keys_xxhash(
    signature: Column, bands: int, rows_per_band: int
) -> Column:
    """Band bucket keys as BIGINT xxhash64 of the band slice (cheaper
    than the md5-hex string keys; bucket semantics identical)."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                F.array_join(
                    F.transform(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                    "|",
                ),
            )
            for b in range(bands)
        ]
    )


@cached_expr
def hashing_buckets(text: Column | str, dim: int = 64) -> Column:
    """Feature-hashing bucket ids for each whitespace token (md5-prefix
    mod dim — replayable in any engine) → ARRAY<BIGINT>. Stage this as
    its own projection before :func:`hashing_tf` — HOF lambda bodies
    get no codegen CSE, so embedding this expression inside a lambda
    re-runs every md5 once per lambda iteration (measured 20× on the
    whole-corpus embed)."""
    toks = tokens(F.lower(text if isinstance(text, Column) else F.col(text)))
    return F.transform(
        toks,
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
            F.lit(dim),
        ),
    )


@cached_expr
def hashing_tf(buckets: Column | str, dim: int = 64) -> Column:
    """Dense term-frequency vector from staged bucket ids (pass a
    COLUMN, not the bucket expression — see :func:`hashing_buckets`)."""
    buckets = F.col(buckets) if isinstance(buckets, str) else buckets
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(F.filter(buckets, lambda b: b == i.cast("long")))
        .cast("double"),
    )


@cached_expr
def hashing_embed(text: Column | str, dim: int = 64) -> Column:
    """REAL text embedding by feature hashing (the HashingTF family):
    bucket counts of hashed tokens, L2-normalized so dot = cosine — a
    genuine lexical embedder with an exact SQL twin (the
    oracle-checkable counterpart of the model-gated CLIP path).

    ONE-SHOT convenience form: every sub-expression is inlined, so the
    md5 hashing re-evaluates per lambda iteration. For whole-corpus
    embedding stage the steps as separate projections —
    ``select(hashing_buckets(..)) → select(hashing_tf(..)) →
    select(l2_normalize(..))`` — as `q_feature_hashing_knn` does
    (measured 20× faster at corpus scale)."""
    from multimodal_vector_db_spark.functions.vector import l2_normalize

    return l2_normalize(hashing_tf(hashing_buckets(text, dim), dim))
