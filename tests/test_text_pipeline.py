"""Chunking, inverted index, PII masking, and RRF fusion."""

from __future__ import annotations

from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.text_pipeline import (
    chunk_documents,
    inverted_index,
    mask_digits,
    pseudonymize,
)
from multimodal_vector_db_spark.operators.text_search import (
    rrf_fuse,
    with_rank,
)


def test_chunking_windows_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(25))
    docs = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = {
        r["chunk_id"]: r
        for r in chunk_documents(docs, window=20, stride=10).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert rows[0]["n_tokens"] == 20
    assert rows[0]["chunk_text"].startswith("w0 w1 ")
    # overlap: chunk 1 starts at token 10
    assert rows[1]["chunk_text"].split()[0] == "w10"
    assert rows[1]["n_tokens"] == 15
    # tail window is short, never dropped
    assert rows[2]["chunk_text"] == "w20 w21 w22 w23 w24"


def test_chunking_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(7, "a b c")], "doc_id long, text string")
    rows = chunk_documents(docs, window=20, stride=10).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_id"] == 0 and rows[0]["n_tokens"] == 3


def test_inverted_index_postings_sorted_and_df(spark):
    docs = spark.createDataFrame(
        [(3, "x y"), (1, "x z"), (2, "x y y")],
        "doc_id long, text string",
    )
    rows = {r["term"]: r for r in inverted_index(docs).collect()}
    assert rows["x"]["df"] == 3 and rows["x"]["postings"] == [1, 2, 3]
    # df counts documents, not occurrences
    assert rows["y"]["df"] == 2 and rows["y"]["postings"] == [2, 3]
    assert rows["z"]["postings"] == [1]
    assert inverted_index(docs, min_df=3).count() == 1


def test_mask_digits_and_pseudonym_stability(spark):
    df = spark.createDataFrame(
        [(1, "Customer#000000001"), (2, "Customer#000000002")],
        "k long, name string",
    )
    out = df.select(
        "k",
        mask_digits("name").alias("m"),
        pseudonymize("k", salt="s:").alias("p"),
        pseudonymize("k", salt="s:").alias("p2"),
        pseudonymize("k", salt="other:").alias("q"),
    ).collect()
    for r in out:
        assert r["m"] == "Customer##########"
        assert r["p"] == r["p2"] and len(r["p"]) == 16  # deterministic
        assert r["p"] != r["q"]  # salt changes the pseudonym
    assert out[0]["p"] != out[1]["p"]


def test_rrf_scores_and_cross_source_boost(spark):
    # doc 10 is rank 2 in both lists; doc 1/20 are rank-1 singletons.
    # RRF must put the doubly-retrieved doc first: 2/62 > 1/61.
    lex = spark.createDataFrame(
        [(1, 1), (10, 2), (3, 3)], "doc_id long, rank long"
    )
    dense = spark.createDataFrame(
        [(20, 1), (10, 2), (4, 3)], "doc_id long, rank long"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([lex, dense], k=10).collect()}
    assert out[10]["rank"] == 1 and out[10]["n_sources"] == 2
    assert abs(out[10]["rrf_score"] - round(2 / 62, 6)) < 1e-9
    assert abs(out[1]["rrf_score"] - round(1 / 61, 6)) < 1e-9
    # singleton tie (1/61) broken by doc_id asc
    assert out[1]["rank"] == 2 and out[20]["rank"] == 3


def test_with_rank_orders_and_breaks_ties(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9)], "doc_id long, score double"
    )
    got = {r["doc_id"]: r["rank"] for r in with_rank(df).collect()}
    assert got == {2: 1, 3: 2, 1: 3}


def test_ngram_jaccard_block_guard(spark):
    """The quadratic-expansion guard: a block larger than max_block_rows
    raises at plan-build time; raising the cap (or None) permits it."""
    import pytest as _pytest

    from multimodal_vector_db_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "same block", f"word{i} common tokens here") for i in range(40)],
        "doc_id long, lang string, text string",
    )
    with _pytest.raises(ValueError, match="largest 'lang' block"):
        ngram_jaccard_pairs(docs, block_col="lang", max_block_rows=10)
    with _pytest.raises(ValueError, match="all-pairs over"):
        ngram_jaccard_pairs(docs, max_block_rows=10)
    # permitted when under the cap or explicitly unbounded
    ok = ngram_jaccard_pairs(docs, block_col="lang", max_block_rows=100)
    assert ok.columns == ["id_a", "id_b", "jaccard"]
    unbounded = ngram_jaccard_pairs(docs, max_block_rows=None)
    assert unbounded.count() >= 0


def test_duplicated_span_boundaries_and_merge(spark):
    """Known shared runs produce exact merged spans; unique text none."""
    from multimodal_vector_db_spark.operators.dedup import (
        duplicate_span_stats,
        duplicated_ngram_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    docs = spark.createDataFrame(
        [
            (1, f"u1a u1b {shared} u1c u1d"),
            (2, f"{shared} v2a v2b v2c v2d v2e"),
            (3, "only unique words appear in this document here"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in duplicated_ngram_spans(docs, n=4).collect()
    }
    # doc 1: tokens 2..8 shared run; 4-grams at pos 2,3,4 merge to [2, 8)
    assert spans[1] == (2, 8)
    assert spans[2] == (0, 6)
    assert 3 not in spans
    stats = {
        r["doc_id"]: r for r in duplicate_span_stats(docs, n=4).collect()
    }
    assert stats[1]["dup_tokens"] == 6 and stats[1]["n_spans"] == 1
    assert stats[1]["kept_tokens"] == stats[1]["n_tokens"] - 6
    assert stats[3]["n_spans"] == 0 and stats[3]["dup_fraction"] == 0.0


def test_span_hash_basis_parity(spark):
    """xxhash64 production basis == raw-string oracle basis."""
    from multimodal_vector_db_spark.operators.dedup import (
        duplicate_span_stats,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        map(tuple, duplicate_span_stats(docs, hash_basis="xxhash64").collect())
    )
    b = sorted(
        map(tuple, duplicate_span_stats(docs, hash_basis="string").collect())
    )
    assert a == b and len(a) == docs.count()


def test_frequency_split_join_parity(spark):
    """Skew-split join == plain shuffle join, including hot keys."""
    from multimodal_vector_db_spark.functions.text import tokens
    from multimodal_vector_db_spark.operators.joins import (
        frequency_split_join,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").cast("long").alias("gf"))
    split = frequency_split_join(tok, freq, "tok", "gf", head_rows=16)
    plain = tok.join(freq, "tok").select(*split.columns)
    assert sorted(map(tuple, split.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_remove_duplicated_spans_cleaned_text(spark):
    """Cleaned text drops exactly the shared run; untouched docs pass
    through; a fully-duplicated doc empties to ''."""
    from multimodal_vector_db_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"u1a u1b {shared} u1c u1d"),
            (2, shared),
            (3, "only unique words appear in this document here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(docs, n=4).collect()
    }
    assert out[1]["cleaned_text"] == "u1a u1b u1c u1d"
    assert out[1]["kept_tokens"] == 4 and out[1]["n_tokens"] == 10
    assert out[2]["cleaned_text"] == "" and out[2]["kept_tokens"] == 0
    assert out[3]["cleaned_text"].startswith("only unique")
    assert out[3]["kept_tokens"] == out[3]["n_tokens"]


def test_semantic_dedup_within_cluster_only(spark):
    """Near-identical vectors in the SAME cluster dedup keep-first;
    the same similarity across DIFFERENT clusters is untouched (the
    SemDeDup property)."""
    from multimodal_vector_db_spark.operators.dedup import semantic_dedup

    c0, c1 = [1.0, 0.0], [0.0, 1.0]
    rows = [
        (1, [1.0, 0.0]),     # cluster 0
        (2, [0.999, 0.045]), # cluster 0, near-dup of 1 -> dropped
        (3, [0.0, 1.0]),     # cluster 1
        (4, [0.045, 0.999]), # cluster 1, near-dup of 3 -> dropped
        (5, [0.7, 0.714]),   # cluster 1 (dot .714 vs .7), far from 3/4
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    out = {
        r["id"]: r
        for r in semantic_dedup(emb, [c0, c1], threshold=0.98).collect()
    }
    assert [out[i]["kept"] for i in (1, 2, 3, 4, 5)] == [
        True, False, True, False, True,
    ]
    assert out[2]["cluster_id"] == 0 and out[4]["cluster_id"] == 1
    # raise threshold above every pairwise dot: nothing dropped
    out2 = semantic_dedup(emb, [c0, c1], threshold=1.01).collect()
    assert all(r["kept"] for r in out2)


def test_semantic_dedup_blocked_matches_exact(spark, embeddings):
    """The BLAS serving form must reproduce the expression form's
    (id, cluster_id, kept) exactly on a real corpus, for both
    assignment metrics — the output is discrete, so any fp-order
    divergence would surface as a flipped row here. chunk_rows=7
    forces the Gram scan across many chunk boundaries."""
    from multimodal_vector_db_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_blocked,
    )

    cents = [
        r["embedding"]
        for r in embeddings.orderBy("vec_id").limit(6).collect()
    ]
    for metric in ("dot", "l2"):
        exact = sorted(
            tuple(r)
            for r in semantic_dedup(
                embeddings, cents, threshold=0.3, metric=metric
            ).collect()
        )
        blocked = sorted(
            tuple(r)
            for r in semantic_dedup_blocked(
                embeddings, cents, threshold=0.3, metric=metric,
                chunk_rows=7,
            ).collect()
        )
        assert exact == blocked, metric


def test_incremental_dedup_against_index(spark):
    """A batch doc that duplicates an indexed historical doc is
    flagged with the right best-match; a novel doc passes with zero
    candidates. History text is never consumed by the batch pass —
    only the (doc_id, sig) index."""
    from multimodal_vector_db_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_index,
    )

    dup_text = "the quick brown fox jumps over the lazy dog again"
    hist = spark.createDataFrame(
        [
            (1, dup_text),
            (2, "completely different historical content about ships"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, dup_text),  # exact dup of 1 -> sig agreement 1.0
            (11, "novel words that never appeared before anywhere xyz"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in incremental_near_duplicates(
            batch, minhash_index(hist)
        ).collect()
    }
    assert out[10]["is_dup"] and out[10]["best_match_id"] == 1
    assert out[10]["best_est_jaccard"] == 1.0
    assert not out[11]["is_dup"] and out[11]["n_candidates"] == 0
    assert out[11]["best_match_id"] == -1


def test_incremental_dedup_bucketed_index_parity_and_plan(spark):
    """The pre-banded, band_key-bucketed index form must (a) return
    exactly the compact-index results, and (b) join WITHOUT an
    Exchange on the history side — only the ingest batch shuffles."""
    import io
    import re
    from contextlib import redirect_stdout

    from multimodal_vector_db_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_band_index,
        minhash_index,
        write_minhash_band_index,
    )

    hist = spark.createDataFrame(
        [(i, f"historical doc number {i} about topic {i % 5} words")
         for i in range(40)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, "historical doc number 7 about topic 2 words"),
            (101, "entirely novel content zyx wvu tsr qpo"),
        ],
        "doc_id long, text string",
    )
    compact = minhash_index(hist)
    write_minhash_band_index(
        minhash_band_index(hist), "t_mh_band_idx", n_buckets=4
    )
    banded = spark.table("t_mh_band_idx")

    a = sorted(
        incremental_near_duplicates(batch, compact).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        incremental_near_duplicates(batch, banded).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a[0]["is_dup"] and a[0]["best_match_id"] == 7

    # plan: the band-key join must not re-shuffle the bucketed index.
    # The history side's pre-join Exchange (if any) is the unique one
    # carrying BOTH band_key and the history signature column; the
    # post-join dedup shuffle has no band_key, the batch side no `so`.
    def _pre_join_history_exchanges(df) -> int:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return sum(
            1
            for cols in re.findall(
                r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]",
                buf.getvalue(),
            )
            if "band_key#" in cols and "so#" in cols
        )

    assert _pre_join_history_exchanges(
        incremental_near_duplicates(batch, banded)
    ) == 0
    # the compact form DOES shuffle the history side — proves the
    # assertion bites
    assert _pre_join_history_exchanges(
        incremental_near_duplicates(batch, compact)
    ) >= 1


def test_leakage_safe_split_keeps_clusters_together(spark):
    """A near-dup CHAIN (A~B, B~C — A and C never pair directly) must
    land entirely in one split; singletons still get assigned; bucket
    is a deterministic function of the cluster id."""
    from multimodal_vector_db_spark.operators.dedup import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(docs, pairs).collect()}
    assert len(out) == 7
    assert len({out[i]["split"] for i in (1, 2, 3)}) == 1
    assert len({out[i]["cluster_id"] for i in (1, 2, 3)}) == 1
    assert out[5]["split"] == out[6]["split"]
    assert out[4]["cluster_id"] == 4  # singleton is its own cluster
    # deterministic across invocations
    again = {
        r["doc_id"]: r["bucket"]
        for r in leakage_safe_split(docs, pairs).collect()
    }
    assert {k: v["bucket"] for k, v in out.items()} == again


def test_dsir_xxhash_basis_same_shape_and_dominance(spark):
    """The production xxhash64 bucket basis must preserve DSIR's
    structure: identical n_ngrams (hashing doesn't change gram counts)
    and target-like docs still out-weigh alien docs."""
    from multimodal_vector_db_spark.operators.dsir import dsir_log_weights

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "zork quux blarg"),
         (2, "alpha beta gamma"), (3, "frob nicate wibble")],
        "doc_id long, text string",
    )
    md5 = {r["id"]: r for r in dsir_log_weights(raw, target).collect()}
    xx = {r["id"]: r
          for r in dsir_log_weights(raw, target,
                                    hash_impl="xxhash64").collect()}
    for i in range(4):
        assert md5[i]["n_ngrams"] == xx[i]["n_ngrams"]
    assert xx[0]["log_weight"] > xx[1]["log_weight"]
    assert xx[2]["log_weight"] > xx[3]["log_weight"]


def test_bigram_lm_shuffle_join_form_matches_broadcast(spark):
    """broadcast_model=False (the unbounded-vocab shuffle-join path)
    must produce the same scores as the broadcast form."""
    from multimodal_vector_db_spark.operators.text_pipeline import (
        bigram_lm_scores,
    )

    docs = spark.createDataFrame(
        [(i, f"word{i % 5} common tail word{(i + 1) % 5} common")
         for i in range(30)],
        "doc_id long, text string",
    )
    a = {r["id"]: (r["n_bigrams"], round(r["log_ppl"], 9))
         for r in bigram_lm_scores(docs).collect()}
    b = {r["id"]: (r["n_bigrams"], round(r["log_ppl"], 9))
         for r in bigram_lm_scores(docs, broadcast_model=False).collect()}
    assert a == b


def test_contaminated_span_removal_known_leak(spark):
    """A train doc containing an exact 8-token run from the ref set
    loses exactly that span; clean docs pass through untouched; leaks
    shorter than n tokens are not cut. xxhash64 production basis ==
    raw-string basis."""
    from multimodal_vector_db_spark.operators.dedup import (
        contaminated_spans,
        remove_contaminated_spans,
    )

    leak = "q1 q2 q3 q4 q5 q6 q7 q8"  # 8 tokens
    train = spark.createDataFrame(
        [
            (1, f"t1a t1b {leak} t1c t1d"),
            (2, "entirely clean training text with no overlap at all"),
            (3, "short q1 q2 q3 overlap only three tokens long here"),
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(100, f"eval question intro {leak} eval answer outro")],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in contaminated_spans(train, ref, n=8).collect()
    }
    assert spans == {1: (2, 10)}
    out = {
        r["doc_id"]: r
        for r in remove_contaminated_spans(train, ref, n=8).collect()
    }
    assert out[1]["cleaned_text"] == "t1a t1b t1c t1d"
    assert out[1]["kept_tokens"] == 4 and out[1]["n_tokens"] == 12
    assert out[2]["kept_tokens"] == out[2]["n_tokens"]
    assert out[3]["kept_tokens"] == out[3]["n_tokens"]

    a = sorted(map(tuple, remove_contaminated_spans(
        train, ref, n=8, hash_basis="xxhash64").collect()))
    b = sorted(map(tuple, remove_contaminated_spans(
        train, ref, n=8, hash_basis="string").collect()))
    assert a == b


def test_bpe_canonical_example_and_invariants(spark):
    """BPE training reproduces the canonical Sennrich example
    (arXiv:1508.07909 / subword-nmt with the </w> marker); learning is
    partition-invariant; apply satisfies the round-trip and
    monotonicity invariants."""
    from multimodal_vector_db_spark.operators.bpe import (
        EOW,
        apply_bpe,
        encode_word,
        learn_bpe,
        train_bpe_merges,
    )

    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_merges(wc, 5)
    assert merges == [
        ("e", "s"), ("es", "t" + EOW), ("l", "o"), ("e", "w"),
        ("ew", "est" + EOW),
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "ewest" + EOW]
    assert encode_word("lowest", ranks) == ["lo", "w", "est" + EOW]
    # concatenation round trip
    for w in ("lowest", "newest", "zzz", "low"):
        assert "".join(encode_word(w, ranks)) == w + EOW

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = learn_bpe(docs, n_merges=20)
    m2 = learn_bpe(docs.repartition(7), n_merges=20)
    assert m1 == m2 and len(m1) == 20

    out10 = {r["id"]: r["n_bpe_tokens"]
             for r in apply_bpe(docs.limit(50), m1[:10]).collect()}
    full = {r["id"]: r for r in apply_bpe(docs.limit(50), m1).collect()}
    for i, r in full.items():
        # more merges never increase the token count; tokens >= words
        assert r["n_bpe_tokens"] <= out10[i]
        assert r["n_bpe_tokens"] >= r["n_words"]
        assert EOW in r["bpe_preview"]


def test_bpe_apply_fixture_provenance(spark):
    """The merge table baked into the bpe_apply_tokens query is exactly
    what learn_bpe produces on the sf0.01 corpus it claims to come
    from — the constant cannot drift from the trainer."""
    from multimodal_vector_db_spark.operators.bpe import learn_bpe
    from multimodal_vector_db_spark.queries.m11_curation3 import _BPE_MERGES

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert learn_bpe(docs, n_merges=len(_BPE_MERGES)) == _BPE_MERGES


class TestUnigramLM:
    def test_viterbi_known_segmentation(self):
        from multimodal_vector_db_spark.operators.unigram_lm import _viterbi

        # 'ab' dominant -> 'abab' segments as two bigrams
        probs = {"a": 0.1, "b": 0.1, "ab": 0.5, "ba": 0.05}
        assert _viterbi("abab", probs) == ["ab", "ab"]
        # single char words fall back to the char inventory
        assert _viterbi("a", probs) == ["a"]
        # char path preferred on exact ties (0.2*0.2 == 0.04 vs bigram)
        tie = {"x": 0.2, "xx": 0.04}
        assert _viterbi("xx", tie) == ["x", "x"]

    def test_estep_counts_match_brute_force(self, spark):
        from multimodal_vector_db_spark.operators.unigram_lm import (
            _viterbi,
            seed_probs,
            viterbi_piece_counts,
            word_freqs,
        )

        docs = spark.createDataFrame(
            [(1, "banana band ban"), (2, "banana ana")],
            "doc_id long, text string",
        )
        wf = word_freqs(docs)
        probs = seed_probs(wf)
        got = {
            r["piece"]: r["n"]
            for r in viterbi_piece_counts(wf, probs).collect()
        }
        want: dict = {}
        for r in wf.collect():
            for p in _viterbi(r["w"], probs):
                want[p] = want.get(p, 0) + r["freq"]
        assert got == want

    def test_hard_em_objective_non_decreasing(self, spark):
        from multimodal_vector_db_spark.operators.unigram_lm import (
            unigram_train,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(120)
        probs, history = unigram_train(docs, n_iters=3)
        assert len(history) == 4
        for a, b in zip(history, history[1:]):
            assert b >= a - 1e-9, history
        # training moved the model (pure seed-count model is not a
        # fixed point on real text)
        assert history[-1] > history[0]
        assert abs(sum(probs.values()) - 1.0) < 1e-9

    def test_max_piece_4_uses_long_pieces(self):
        """Round-7 generalization: the lattice carries four trailing
        values, so dominant 3- and 4-char pieces win segmentations —
        and the shortest-piece tie rule still holds at every length."""
        from multimodal_vector_db_spark.operators.unigram_lm import (
            MAX_PIECE,
            _viterbi,
        )

        assert MAX_PIECE == 4
        probs = {"t": 0.05, "h": 0.05, "e": 0.05, "the": 0.4}
        assert _viterbi("thethe", probs) == ["the", "the"]
        probs4 = {"a": 0.1, "ab": 0.1, "abc": 0.1, "abcd": 0.5,
                  "b": 0.1, "c": 0.1, "d": 0.1}
        assert _viterbi("abcdabcd", probs4) == ["abcd", "abcd"]
        # exact tie between char path and a 4-char piece -> chars win
        tie = {"x": 0.2, "xxxx": 0.2 ** 4}
        assert _viterbi("xxxx", tie) == ["x", "x", "x", "x"]
        # mixed: best path uses a 3-char piece mid-word
        probs_m = {"a": 0.2, "xyz": 0.5, "x": 0.01, "y": 0.01, "z": 0.01}
        assert _viterbi("axyza", probs_m) == ["a", "xyz", "a"]

    def test_seed_top_k_multi_keeps_chars_and_caps(self, spark):
        """top_k_multi caps multi-char seed pieces deterministically
        (count DESC, piece ASC) while every single char survives."""
        from multimodal_vector_db_spark.operators.unigram_lm import (
            seed_piece_counts,
            word_freqs,
        )

        docs = spark.createDataFrame(
            [(1, "banana bandana")], "doc_id long, text string"
        )
        wf = word_freqs(docs)
        full = seed_piece_counts(wf).collect()
        capped = seed_piece_counts(wf, top_k_multi=3).collect()
        chars_full = {r["piece"] for r in full if len(r["piece"]) == 1}
        chars_capped = {r["piece"] for r in capped if len(r["piece"]) == 1}
        assert chars_capped == chars_full
        multi = [(r["piece"], r["c"]) for r in capped if len(r["piece"]) > 1]
        assert len(multi) == 3
        ranked = sorted(
            ((r["c"], r["piece"]) for r in full if len(r["piece"]) > 1),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        assert sorted(multi) == sorted((p, c) for c, p in ranked)


def test_prune_to_vocab_keeps_chars_and_caps_multi(spark):
    """SentencePiece-style prune: single chars always survive, multi
    pieces capped deterministically (count DESC, piece ASC), survivors
    renormalized to an exact-ratio probability model."""
    from multimodal_vector_db_spark.operators.unigram_lm import (
        prune_to_vocab,
        seed_probs,
        viterbi_piece_counts,
        word_freqs,
    )

    docs = spark.createDataFrame(
        [(1, "banana band bandana ananas"), (2, "banana banda ana")],
        "doc_id long, text string",
    )
    wf = word_freqs(docs).localCheckpoint(eager=True)
    counts = viterbi_piece_counts(wf, seed_probs(wf)).collect()
    probs = prune_to_vocab(counts, keep_multi=2)
    chars_in = {r["piece"] for r in counts if len(r["piece"]) == 1}
    kept_chars = {p for p in probs if len(p) == 1}
    kept_multi = [p for p in probs if len(p) > 1]
    assert kept_chars == chars_in
    assert len(kept_multi) <= 2
    assert abs(sum(probs.values()) - 1.0) < 1e-12
    # determinism: the kept multi pieces are the count-DESC/piece-ASC top
    ranked = sorted(
        ((int(r["n"]), r["piece"]) for r in counts if len(r["piece"]) > 1),
        key=lambda t: (-t[0], t[1]),
    )[:2]
    assert sorted(kept_multi) == sorted(p for _, p in ranked)


def test_temperature_mix_quotas_sum_to_budget(spark):
    """Largest-remainder apportionment: quotas are non-negative and
    sum EXACTLY to the budget; picked docs never exceed quota or
    availability."""
    from multimodal_vector_db_spark.queries.m14_serving2 import (
        _MIX_BUDGET,
        q_temperature_source_mix,
    )

    rows = q_temperature_source_mix(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(r["quota"] for r in rows) == _MIX_BUDGET
    for r in rows:
        assert r["quota"] >= 0
        assert r["picked_docs"] == min(r["quota"], r["n_docs"])
