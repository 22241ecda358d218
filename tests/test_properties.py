"""Property-based tests (hypothesis) for the expression kernels — a
layer the reference lacks entirely (SURVEY §5: "no property-based
testing"). Each Spark expression is checked against an independent
pure-Python implementation on randomized inputs, one Spark job per
property (hypothesis generates the data, Spark evaluates in one batch).
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

finite_floats = st.floats(
    min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False,
    width=32,
)
vectors = st.lists(finite_floats, min_size=1, max_size=16)


def _eval_exprs(spark, rows, schema, *exprs):
    return spark.createDataFrame(rows, schema).select(*exprs).collect()


@settings(max_examples=20, deadline=None)
@given(st.lists(vectors, min_size=1, max_size=8))
def test_l2_normalize_is_unit_or_zero(spark, vs):
    from multimodal_vector_db_spark.functions.vector import l2_norm, l2_normalize

    rows = [(v,) for v in vs]
    out = _eval_exprs(
        spark, rows, "v array<float>",
        l2_norm(l2_normalize("v")).alias("n"),
        l2_norm("v").alias("orig"),
    )
    for r in out:
        if r["orig"] == 0.0:
            assert r["n"] == 0.0
        else:
            assert abs(r["n"] - 1.0) < 1e-6


@settings(max_examples=20, deadline=None)
@given(vectors)
def test_dot_matches_python_fold(spark, v):
    from multimodal_vector_db_spark.functions.vector import dot

    rows = [(v, list(reversed(v)))]
    out = _eval_exprs(
        spark, rows, "a array<float>, b array<float>", dot("a", "b").alias("d")
    )
    expect = 0.0
    for x, y in zip(np.asarray(v, dtype=np.float32), np.asarray(list(reversed(v)), dtype=np.float32)):
        expect += float(x) * float(y)
    assert out[0]["d"] == expect  # same sequential fold → bit-equal


@settings(max_examples=20, deadline=None)
@given(st.lists(vectors.filter(lambda v: len(v) >= 4), min_size=1, max_size=6))
def test_fp16_round_trip_matches_numpy(spark, vs):
    from multimodal_vector_db_spark.functions.vector import fp16_round_trip

    rows = [(v,) for v in vs]
    out = _eval_exprs(
        spark, rows, "v array<float>", fp16_round_trip("v").alias("h")
    )
    for r, v in zip(out, vs):
        ref = np.asarray(v, dtype=np.float32).astype(np.float16).astype(np.float32)
        assert r["h"] == [float(x) for x in ref]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="abc d\t\n", min_size=0, max_size=40), min_size=1, max_size=8))
def test_tokens_match_python_split(spark, texts):
    from multimodal_vector_db_spark.functions.text import token_count, tokens

    rows = [(t,) for t in texts]
    out = _eval_exprs(
        spark, rows, "t string",
        tokens("t").alias("toks"), token_count("t").alias("n"),
    )
    for r, t in zip(out, texts):
        assert r["toks"] == t.split()
        assert r["n"] == len(t.split())


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="ab c", min_size=1, max_size=30), min_size=2, max_size=6)
)
def test_jaccard_bounds_and_symmetry(spark, texts):
    from multimodal_vector_db_spark.functions.text import jaccard, word_shingles

    rows = [(a, b) for a in texts[:2] for b in texts[:2]]
    out = _eval_exprs(
        spark, rows, "a string, b string",
        jaccard(word_shingles("a", 1), word_shingles("b", 1)).alias("j"),
        jaccard(word_shingles("b", 1), word_shingles("a", 1)).alias("jr"),
    )
    for r in out:
        if r["j"] is not None:
            assert 0.0 <= r["j"] <= 1.0
            assert r["j"] == r["jr"]  # symmetric
    # identity: j(a,a) == 1 when shingle set non-empty
    same = [r for r, (a, b) in zip(out, [(a, b) for a in texts[:2] for b in texts[:2]]) if a == b]
    for r in same:
        if r["j"] is not None:
            assert abs(r["j"] - 1.0) < 1e-12


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=30))
def test_minhash_identical_docs_collide(spark, nums):
    # two identical token streams must have identical signatures
    from multimodal_vector_db_spark.functions.text import (
        minhash_signature,
        shingle_md5_blocks,
        word_shingles,
    )

    text = " ".join(str(n) for n in nums)
    rows = [(text,), (text,)]
    df = spark.createDataFrame(rows, "t string").select(
        word_shingles("t", 2).alias("sh")
    )
    blocks = shingle_md5_blocks(F.col("sh"), 8)
    staged = df.select("sh", *[b.alias(f"m{k}") for k, b in enumerate(blocks)])
    out = staged.select(
        minhash_signature([F.col("m0"), F.col("m1")], 8).alias("sig")
    ).collect()
    assert out[0]["sig"] == out[1]["sig"]


def test_minhash_xxhash_impl_finds_planted_duplicates(spark):
    """The xxhash64 production path: identical docs always collide
    (identical shingle sets → identical signatures → same buckets), and
    the Jaccard verify stage reports the same values as the md5 path
    (verification is hash-independent)."""
    from multimodal_vector_db_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    rows = [
        (1, "spark shuffles data between stages on wide dependencies"),
        (2, "spark shuffles data between stages on wide dependencies"),
        (3, "broadcast joins avoid shuffling the large fact table side"),
        (4, "broadcast joins avoid shuffling the large fact table side"),
        (5, "completely unrelated text about ocean tides and moonlight"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for impl in ("md5", "xxhash64"):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in minhash_lsh_candidates(
                docs, num_hashes=8, bands=4, hash_impl=impl
            ).collect()
        }
        assert pairs.get((1, 2)) == 1.0, (impl, pairs)
        assert pairs.get((3, 4)) == 1.0, (impl, pairs)
        assert (1, 5) not in pairs and (2, 5) not in pairs


@settings(max_examples=20, deadline=None)
@given(st.lists(vectors.filter(lambda v: len(v) >= 2), min_size=1, max_size=6))
def test_sq8_codes_bounded_and_error_within_half_step(spark, vs):
    from multimodal_vector_db_spark.functions.vector import (
        sq8_decode,
        sq8_encode,
        sq8_params,
    )

    rows = [(i, v) for i, v in enumerate(vs)]
    vmin, scale = sq8_params(F.col("v"))
    got = _eval_exprs(
        spark,
        rows,
        "i long, v array<float>",
        F.col("i"),
        F.col("v"),
        sq8_encode(F.col("v"), vmin, scale).alias("codes"),
        sq8_decode(sq8_encode(F.col("v"), vmin, scale), vmin, scale).alias(
            "dec"
        ),
    )
    for r in got:
        v = np.asarray(r["v"], dtype=np.float64)
        assert all(0 <= c <= 255 for c in r["codes"])
        step = (v.max() - v.min()) / 255.0
        err = np.abs(np.asarray(r["dec"]) - v)
        assert err.max() <= step / 2 + 1e-9


@settings(max_examples=20, deadline=None)
@given(st.lists(st.lists(finite_floats, min_size=8, max_size=8), min_size=1, max_size=6))
def test_sign_bits_word_matches_python(spark, vs):
    from multimodal_vector_db_spark.functions.vector import sign_bits_word

    rows = [(i, v) for i, v in enumerate(vs)]
    got = _eval_exprs(
        spark,
        rows,
        "i long, v array<float>",
        F.col("i"),
        F.col("v"),
        sign_bits_word("v", 1, 8).alias("w"),
    )
    for r in got:
        want = sum(
            (1 << j) for j, x in enumerate(r["v"]) if np.float64(x) > 0.0
        )
        assert r["w"] == want


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_codec_round_trips_random(spark, h, w, seed):
    """PPM and WAV codecs round-trip arbitrary payload shapes."""
    from multimodal_vector_db_spark.multimodal.codecs import (
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()

    n = h * w * 4
    samples = rng.randint(-32768, 32767, size=n, dtype=np.int16)
    sr, x = decode_wav(encode_wav(samples, 8000))
    assert sr == 8000
    assert np.allclose(x, samples.astype(np.float64) / 32768.0)


token_words = st.sampled_from(["aa", "bb", "cc", "dd"])
tiny_docs = st.lists(
    st.lists(token_words, min_size=0, max_size=12), min_size=2, max_size=6
)


@settings(max_examples=10, deadline=None)
@given(tiny_docs)
def test_duplicated_span_invariants(spark, docs):
    """Structural invariants of span dedup on adversarial tiny corpora
    (4-word alphabet forces heavy n-gram collisions): spans are
    disjoint, in-bounds, each at least n tokens long, and the stats
    view is exactly consistent with the spans view and the cleaned
    view."""
    from multimodal_vector_db_spark.operators.dedup import (
        duplicate_span_stats,
        duplicated_ngram_spans,
        remove_duplicated_spans,
    )

    n = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans: dict[int, list[tuple[int, int]]] = {}
    for r in duplicated_ngram_spans(df, n=n).collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for i, toks in enumerate(docs):
        ss = sorted(spans.get(i, []))
        for (s0, e0), (s1, e1) in zip(ss, ss[1:]):
            assert e0 < s1  # disjoint AND non-adjacent (maximal merge)
        for s0, e0 in ss:
            assert 0 <= s0 < e0 <= len(toks)
            assert e0 - s0 >= n
    stats = {r["doc_id"]: r for r in duplicate_span_stats(df, n=n).collect()}
    cleaned = {
        r["doc_id"]: r for r in remove_duplicated_spans(df, n=n).collect()
    }
    assert set(stats) == set(range(len(docs)))
    for i, toks in enumerate(docs):
        ss = spans.get(i, [])
        dup = sum(e - s for s, e in ss)
        assert stats[i]["n_tokens"] == len(toks)
        assert stats[i]["n_spans"] == len(ss)
        assert stats[i]["dup_tokens"] == dup
        assert stats[i]["kept_tokens"] == len(toks) - dup
        assert cleaned[i]["kept_tokens"] == len(toks) - dup
        expect_kept = [
            t
            for p, t in enumerate(toks)
            if not any(s <= p < e for s, e in ss)
        ]
        assert cleaned[i]["cleaned_text"] == " ".join(expect_kept)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        # >= 2 non-empty tokens per doc: a single-token doc has no
        # bigram shingles, hence a null signature that by design can
        # collide but never match
        st.lists(
            st.text(alphabet="abcdefgh", min_size=1, max_size=4),
            min_size=2,
            max_size=8,
        ).map(" ".join),
        min_size=2,
        max_size=6,
    ),
    st.integers(min_value=0, max_value=10_000),
)
def test_incremental_dedup_properties(spark, texts, id_base):
    """(1) A batch identical to the history is fully flagged with
    signature agreement 1.0 and best_match = its own twin; (2) a batch
    with a disjoint vocabulary has zero candidates."""
    from multimodal_vector_db_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_index,
    )

    hist_rows = [(id_base + i, t) for i, t in enumerate(texts)]
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    idx = minhash_index(hist)

    # identical batch (new ids)
    twin = spark.createDataFrame(
        [(id_base + 1000 + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    out = incremental_near_duplicates(twin, idx).collect()
    for r in out:
        assert r["is_dup"], r
        assert r["best_est_jaccard"] == 1.0
    # disjoint vocabulary -> zero bucket collisions
    novel = spark.createDataFrame(
        [(id_base + 2000 + i, t.replace("a", "z").replace("b", "y")
          .replace("c", "x").replace("d", "w").replace("e", "v")
          .replace("f", "u").replace("g", "t").replace("h", "s"))
         for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    out2 = incremental_near_duplicates(novel, idx).collect()
    for r in out2:
        assert not r["is_dup"] and r["n_candidates"] == 0, r


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(finite_floats, min_size=4, max_size=4),
            st.integers(min_value=0, max_value=2),
        ),
        min_size=4,
        max_size=10,
        unique_by=lambda t: tuple(t[0]),
    )
)
def test_contrastive_mining_dominance(spark, rows):
    """Every mined hard negative is at least as similar to the anchor
    as every NON-mined other-label row (top-k dominance), and every
    mined hard positive is at most as similar as every non-mined
    same-label row."""
    from multimodal_vector_db_spark.operators.contrastive import (
        mine_contrastive_pairs,
    )

    data = [(i, v, lbl) for i, (v, lbl) in enumerate(rows)]
    emb = spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    )
    anchors = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    k = 2
    mined = mine_contrastive_pairs(
        emb, anchors, k_negatives=k, k_positives=k, id_col="vec_id"
    ).collect()

    a_vec, a_lbl = data[0][1], data[0][2]

    def sim(v):
        s = 0.0
        for x, y in zip(v, a_vec):
            s += float(np.float32(x)) * float(np.float32(y))
        return s

    negs = {r["id"]: r["sim"] for r in mined if r["pair_type"] == "hard_negative"}
    poss = {r["id"]: r["sim"] for r in mined if r["pair_type"] == "hard_positive"}
    for i, v, lbl in data[1:]:
        if lbl != a_lbl and i not in negs and negs:
            assert all(sim(v) <= m + 1e-6 for m in negs.values())
        if lbl == a_lbl and i not in poss and poss:
            assert all(sim(v) >= m - 1e-6 for m in poss.values())


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 2, 3, 4]),
    st.sampled_from([0, 1, 2, 3, 4]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_round_trip_all_filters_and_channels(ch_h, ch_w, nch, ft, seed):
    """decode(encode(x, filter)) == x for every PNG scanline filter ×
    channel count (gray / gray+alpha / RGB / RGBA) — no Spark needed,
    the codec is pure numpy+zlib."""
    from multimodal_vector_db_spark.multimodal.codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(seed)
    shape = (ch_h, ch_w) if nch == 1 else (ch_h, ch_w, nch)
    arr = rng.randint(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(arr, filter_type=ft))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=2, max_value=6))
def test_dsir_upweights_target_like_docs(spark, n_docs):
    """DSIR log weights: raw docs written in the TARGET corpus's
    vocabulary must out-weigh raw docs in a disjoint vocabulary —
    the defining property of importance resampling."""
    from multimodal_vector_db_spark.operators.dsir import dsir_log_weights

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon zeta")
         for i in range(4)],
        "doc_id long, text string",
    )
    rows = []
    for i in range(n_docs):
        rows.append((2 * i, "alpha beta gamma delta"))          # target-like
        rows.append((2 * i + 1, "zork quux blarg frobnicate"))  # alien
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    w = {r["id"]: r["log_weight"]
         for r in dsir_log_weights(raw, target).collect()}
    for i in range(n_docs):
        assert w[2 * i] > w[2 * i + 1], w


def test_bigram_lm_scores_typical_below_atypical(spark):
    """A document built from the corpus's dominant bigram must score
    LOWER log-perplexity than one built from bigrams seen only once;
    every scored position count matches len(tokens)-1."""
    from multimodal_vector_db_spark.operators.text_pipeline import (
        bigram_lm_scores,
    )

    docs = [(i, "the cat sat on the mat") for i in range(10)]
    docs.append((100, "the cat sat on the mat"))      # typical
    docs.append((101, "purple quantum mat dances the"))  # atypical
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["id"]: r for r in bigram_lm_scores(df).collect()}
    assert out[100]["log_ppl"] < out[101]["log_ppl"]
    assert out[100]["n_bigrams"] == 5
    assert out[101]["n_bigrams"] == 4


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=600,
    ),
    st.sampled_from(
        ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4",
         "lpc"]
    ),
    st.sampled_from([64, 256]),
)
def test_flac_round_trip_is_exact_for_any_signal(samples, mode, bs):
    """FLAC is lossless: encode→decode must be EXACT for arbitrary
    int16 signals, every subframe type, any blocking — including
    pathological inputs (full-scale steps, constants, single samples)
    where rice parameters and residuals hit their extremes."""
    import numpy as np

    from multimodal_vector_db_spark.multimodal.flac import (
        decode_flac,
        encode_flac,
    )

    x = np.asarray(samples, dtype=np.int64)
    sr, y = decode_flac(
        encode_flac(x, 16_000, block_size=bs, subframe=mode)
    )
    assert sr == 16_000
    assert np.array_equal(y, x.astype(np.float64) / 32768.0)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-32768, max_value=32767),
            st.integers(min_value=-32768, max_value=32767),
        ),
        min_size=2,
        max_size=400,
    ),
    st.sampled_from(["left_side", "right_side", "mid_side"]),
)
def test_flac_stereo_decorrelation_exact(pairs, stereo):
    import numpy as np

    from multimodal_vector_db_spark.multimodal.flac import (
        decode_flac,
        encode_flac,
    )

    x = np.asarray(pairs, dtype=np.int64)
    sr, y = decode_flac(
        encode_flac(x, 8_000, block_size=128, subframe="fixed1",
                    stereo=stereo)
    )
    assert np.array_equal(y, x.mean(axis=1) / 32768.0)
