"""Tests for content-defined chunking (operators/cdc.py) and the
Naive Bayes classifier (operators/classifier.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.cdc import (
    cdc_chunks,
    duplicate_chunk_stats,
    remove_frequent_chunks,
)
from multimodal_vector_db_spark.operators.classifier import (
    nb_log_odds,
    nb_train_binary,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    return spark.createDataFrame(
        [
            (1, base),
            (2, "PREFIX SHIFTS EVERYTHING " + base),
            (3, "totally unrelated content that shares nothing at all"),
            (4, "short"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


class TestCDC:
    def test_reassembly_is_identity(self, spark, docs):
        # concatenating chunks in idx order must reproduce the text
        ch = cdc_chunks(docs, hash_basis="md5", divisor=16)
        re = ch.groupBy("doc_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk"))
                    ),
                    lambda s: s["chunk"],
                ),
                "",
            ).alias("re")
        )
        bad = (
            re.join(docs, "doc_id")
            .where(F.col("re") != F.col("text"))
            .count()
        )
        assert bad == 0

    def test_shift_resilience(self, spark, docs):
        # a prefix insertion must NOT re-chunk the shared suffix:
        # docs 1 and 2 share chunks even though every fixed offset moved
        ch = cdc_chunks(docs, hash_basis="md5", divisor=16)
        shared = (
            ch.where(F.col("doc_id") == 1)
            .select("chunk")
            .intersect(ch.where(F.col("doc_id") == 2).select("chunk"))
            .count()
        )
        assert shared >= 2

    def test_short_text_single_chunk(self, spark, docs):
        rows = (
            cdc_chunks(docs, hash_basis="md5")
            .where(F.col("doc_id") == 4)
            .collect()
        )
        assert len(rows) == 1 and rows[0]["chunk"] == "short"

    def test_empty_text_no_chunks(self, spark, docs):
        assert (
            cdc_chunks(docs, hash_basis="md5")
            .where(F.col("doc_id") == 5)
            .count()
            == 0
        )

    def test_xxhash_basis_also_reassembles(self, spark, docs):
        ch = cdc_chunks(docs, hash_basis="xxhash64", divisor=16)
        re = ch.groupBy("doc_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk"))
                    ),
                    lambda s: s["chunk"],
                ),
                "",
            ).alias("re")
        )
        bad = (
            re.join(docs, "doc_id")
            .where(F.col("re") != F.col("text"))
            .count()
        )
        assert bad == 0

    def test_duplicate_stats_counts(self, spark):
        two = spark.createDataFrame(
            [(1, "abcdefgh" * 40), (2, "abcdefgh" * 40)],
            "doc_id long, text string",
        )
        stats = duplicate_chunk_stats(
            cdc_chunks(two, hash_basis="md5", divisor=16)
        ).collect()
        assert stats, "identical docs must share duplicated chunks"
        assert all(r["n_occ"] >= r["n_docs"] for r in stats)

    def test_removal_empties_identical_docs(self, spark):
        two = spark.createDataFrame(
            [(1, "abcdefgh" * 40), (2, "abcdefgh" * 40), (3, "unique-xyz")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["cleaned"]
            for r in remove_frequent_chunks(
                two, min_docs=2, hash_basis="md5", divisor=16
            ).collect()
        }
        assert out[1] == "" and out[2] == ""
        assert out[3] == "unique-xyz"


class TestNaiveBayes:
    @pytest.fixture(scope="class")
    def fitted(self, spark):
        train = spark.createDataFrame(
            [(i, "good clean prose", "src0") for i in range(10)]
            + [(i + 10, "spam junk noise", "src1") for i in range(10)],
            "doc_id long, text string, source string",
        )
        return nb_train_binary(train, F.col("source") == "src0")

    def test_separates_classes(self, spark, fitted):
        model, prior = fitted
        test = spark.createDataFrame(
            [(1, "clean prose"), (2, "junk noise"), (3, "")],
            "doc_id long, text string",
        )
        lo = {
            r["doc_id"]: r["log_odds"]
            for r in nb_log_odds(test, model, prior).collect()
        }
        assert lo[1] > 0 > lo[2]
        assert lo[3] == pytest.approx(prior)  # empty doc → prior only

    def test_hand_computed_token(self, spark, fitted):
        # one positive-only token: lr = ln((2)/(n_pos+V)) - ln(1/(n_neg+V))
        model, _ = fitted
        rows = {r["token"]: r["lr"] for r in model.collect()}
        n_pos = n_neg = 30  # 10 docs × 3 tokens each side
        vocab = 6
        expect = math.log(11 / (n_pos + vocab)) - math.log(
            1 / (n_neg + vocab)
        )
        assert rows["good"] == pytest.approx(expect, rel=1e-12)

    def test_unseen_token_uses_default(self, spark, fitted):
        model, prior = fitted
        test = spark.createDataFrame(
            [(1, "zzz-never-seen")], "doc_id long, text string"
        )
        lo = nb_log_odds(test, model, prior).collect()[0]["log_odds"]
        dflt = {r["token"]: r["lr"] for r in model.collect()}["__default__"]
        assert lo == pytest.approx(prior + dflt)

    def test_more_positive_tokens_raise_log_odds(self, spark, fitted):
        # dominance: appending a target-class token never lowers the score
        model, prior = fitted
        test = spark.createDataFrame(
            [(1, "junk"), (2, "junk good"), (3, "junk good good")],
            "doc_id long, text string",
        )
        lo = {
            r["doc_id"]: r["log_odds"]
            for r in nb_log_odds(test, model, prior).collect()
        }
        assert lo[1] < lo[2] < lo[3]


class TestPerceptualHash:
    def test_dhash_known_value(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.phash import dhash56

        # strictly increasing rows → every comparison true → all 56 bits
        grid = np.tile(np.arange(9, dtype=np.uint8) * 10, (7, 1))
        assert dhash56(grid) == (1 << 56) - 1
        # constant image → no strict increase → 0
        assert dhash56(np.full((7, 9), 7, np.uint8)) == 0

    def test_dhash_resizes_other_shapes(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.phash import dhash56

        rng = np.random.default_rng(7)
        big = rng.integers(0, 256, (70, 90), dtype=np.uint8)
        h1 = dhash56(big)
        assert 0 <= h1 < (1 << 56)
        # nearest-resize keeps the hash stable under exact 10x upscale
        small = big[::10, ::10]
        assert dhash56(small) == h1

    def test_banded_join_matches_brute_force(self, spark):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.phash import (
            near_dup_image_pairs,
        )

        rng = np.random.default_rng(42)
        base = int(rng.integers(0, 1 << 56))
        hashes = [(0, base), (1, base ^ (1 << 3)), (2, base ^ (1 << 55)),
                  (3, int(rng.integers(0, 1 << 56))),
                  (4, base ^ (1 << 3) ^ (1 << 20))]
        df = spark.createDataFrame(hashes, "doc_id long, dhash long")
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in near_dup_image_pairs(df, max_hamming=2).collect()
        }
        want = set()
        for i in range(len(hashes)):
            for j in range(i + 1, len(hashes)):
                ham = bin(hashes[i][1] ^ hashes[j][1]).count("1")
                if ham <= 2:
                    want.add((hashes[i][0], hashes[j][0], ham))
        assert got == want and (0, 1, 1) in got

    def test_max_hamming_band_guard(self, spark):
        import pytest as _pytest

        from multimodal_vector_db_spark.multimodal.phash import (
            near_dup_image_pairs,
        )

        df = spark.createDataFrame([(0, 0)], "doc_id long, dhash long")
        with _pytest.raises(ValueError):
            near_dup_image_pairs(df, max_hamming=4)


class TestAudioVideoFingerprints:
    def test_audio_fp_known_contour(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.phash import (
            audio_fingerprint15,
        )

        # monotonically louder windows → every contour bit set
        s = np.repeat(np.arange(16) * 100, 4).astype(np.int16)
        x = s.astype(np.float64) / 32768.0
        assert audio_fingerprint15(x) == (1 << 15) - 1
        # silence → 0
        assert audio_fingerprint15(np.zeros(64)) == 0

    def test_audio_fp_round_trips_codec(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.codecs import (
            decode_wav,
            encode_wav,
        )
        from multimodal_vector_db_spark.multimodal.phash import (
            audio_fingerprint15,
        )

        rng = np.random.default_rng(3)
        s = rng.integers(-32768, 32768, 64).astype(np.int16)
        _, x = decode_wav(encode_wav(s))
        # fingerprint computed post-codec equals the direct int16 one
        e = (s.astype(np.int64).reshape(16, 4) ** 2).sum(axis=1)
        want = sum(
            1 << b for b in range(15) if e[b + 1] > e[b]
        )
        assert audio_fingerprint15(x) == want

    def test_video_signature_round_trips_codec(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.codecs import (
            decode_y4m,
            encode_y4m,
        )
        from multimodal_vector_db_spark.multimodal.phash import (
            video_signature15,
        )

        rng = np.random.default_rng(5)
        frames = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
        _, dec = decode_y4m(encode_y4m(frames))
        assert (dec == frames).all()
        fp = video_signature15(dec)
        assert 0 <= fp < (1 << 15)
        # one-pixel change in the last frame flips at most one bit
        mod = frames.copy()
        mod[3, 3, 3] = (int(mod[3, 3, 3]) + 97) % 256
        fp2 = video_signature15(mod)
        assert bin(fp ^ fp2).count("1") <= 1


class TestClipScoreFilter:
    def test_identical_sides_score_one(self, spark):
        from multimodal_vector_db_spark.functions.text import tokens
        from multimodal_vector_db_spark.operators.multimodal_filter import (
            bucket_ids,
            clip_score_filter,
            hashing_tf_vectors,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "")],
            "doc_id long, text string",
        )
        t = docs.select("doc_id", tokens(F.lower("text")).alias("toks"))
        b = t.select("doc_id", bucket_ids(F.col("toks")).alias("bks"))
        v = hashing_tf_vectors(b, "bks").withColumnRenamed("doc_id", "id")
        pairs = docs.select(
            "doc_id", F.col("doc_id").alias("partner_id")
        )
        out = {
            r["doc_id"]: (r["clip_score"], r["kept"])
            for r in clip_score_filter(pairs, v, v, 0.5).collect()
        }
        assert out[1] == (1.0, 1) and out[2] == (1.0, 1)
        assert out[3] == (0.0, 0)  # empty doc → zero vector → score 0

    def test_disjoint_vocab_scores_zero_ish(self, spark):
        from multimodal_vector_db_spark.functions.text import tokens
        from multimodal_vector_db_spark.operators.multimodal_filter import (
            bucket_ids,
            clip_score_filter,
            hashing_tf_vectors,
        )

        docs = spark.createDataFrame(
            [(1, "aaa bbb ccc"), (2, "xxq yyq zzq")],
            "doc_id long, text string",
        )
        t = docs.select("doc_id", tokens(F.lower("text")).alias("toks"))
        b = t.select("doc_id", bucket_ids(F.col("toks")).alias("bks"))
        v = hashing_tf_vectors(b, "bks").withColumnRenamed("doc_id", "id")
        # pair doc 1's text side with doc 2's image side
        pairs = spark.createDataFrame(
            [(1, 2)], "doc_id long, partner_id long"
        )
        row = clip_score_filter(pairs, v, v, 0.9).collect()[0]
        assert row["clip_score"] < 0.9 and row["kept"] == 0


class TestCDCRandomized:
    def test_reassembly_identity_random_corpus(self, spark):
        # 200 random strings (ASCII + unicode, varied lengths incl. <window)
        import random

        rng = random.Random(20260815)
        alphabet = "abcdefgh XYZ0123()é中"
        rows = [
            (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 300))))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for basis in ("md5", "xxhash64"):
            ch = cdc_chunks(df, hash_basis=basis, divisor=32)
            re = ch.groupBy("doc_id").agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_idx", "chunk"))
                        ),
                        lambda s: s["chunk"],
                    ),
                    "",
                ).alias("re")
            )
            bad = (
                df.join(re, "doc_id", "left")
                .where(
                    F.coalesce(F.col("re"), F.lit(""))
                    != F.col("text")
                )
                .count()
            )
            assert bad == 0, basis


class TestIncrementalImageDedup:
    def test_matches_brute_force_and_finds_cross_batch_dup(self, spark):
        from multimodal_vector_db_spark.multimodal.phash import (
            band_slices,
            incremental_near_dup_images,
        )

        base = 0x00FACE0FF1CE55
        hist = spark.createDataFrame(
            [(1, base), (2, 0x00123456789ABC)], "doc_id long, dhash long"
        )
        batch = spark.createDataFrame(
            [(10, base ^ (1 << 7)), (11, 0x00FFFFFFFFFFFF)],
            "doc_id long, dhash long",
        )
        index = band_slices(hist, 56, 4)
        got = {
            (r["batch_id"], r["hist_id"], r["hamming"])
            for r in incremental_near_dup_images(
                batch, index, max_hamming=1
            ).collect()
        }
        assert got == {(10, 1, 1)}

    def test_history_side_never_decodes(self, spark):
        # the index is all the history the join needs: hashes only
        from multimodal_vector_db_spark.multimodal.phash import (
            band_slices,
            incremental_near_dup_images,
        )

        hist = spark.createDataFrame([(1, 42)], "doc_id long, dhash long")
        index = band_slices(hist, 56, 4)
        assert set(index.columns) == {"id", "h", "band_k", "band_v"}
        out = incremental_near_dup_images(
            spark.createDataFrame([(9, 42)], "doc_id long, dhash long"),
            index,
        )
        rows = out.collect()
        assert rows == [] or rows[0]["hamming"] == 0
        assert {r["hamming"] for r in rows} == {0}


def test_banded_join_15bit_two_bands_matches_brute_force(spark):
    import random

    from multimodal_vector_db_spark.multimodal.phash import (
        banded_hamming_pairs,
    )

    rng = random.Random(11)
    base = rng.getrandbits(15)
    rows = [(0, base), (1, base ^ 1), (2, base ^ (1 << 14)),
            (3, rng.getrandbits(15)), (4, base ^ 3)]
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in banded_hamming_pairs(
            df, total_bits=15, n_bands=2, max_hamming=1, hash_col="fp"
        ).collect()
    }
    want = {
        (a, b, bin(ha ^ hb).count("1"))
        for i, (a, ha) in enumerate(rows)
        for b, hb in rows[i + 1:]
        if bin(ha ^ hb).count("1") <= 1
    }
    assert got == want and (0, 1, 1) in want


class TestAdviceContracts:
    """Round-6 contract hardening (ADVICE.md): invalid inputs raise
    clearly at call time instead of silently mis-scoring mid-job."""

    def test_nb_log_odds_requires_default_row(self, spark):
        import pytest

        from multimodal_vector_db_spark.operators.classifier import (
            nb_log_odds,
        )

        model = spark.createDataFrame(
            [("alpha", 0.5)], "token string, lr double"
        )
        test = spark.createDataFrame(
            [(1, "alpha beta")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="__default__"):
            nb_log_odds(test, model, 0.0)

    def test_dual_space_validates_spaces_up_front(self, spark):
        import pytest

        from multimodal_vector_db_spark.operators.knn import (
            dual_space_topk_blocked,
        )

        corpus = spark.createDataFrame(
            [(1, "image", "clip", [1.0, 0.0])],
            "id long, modality string, space string, embedding array<double>",
        )
        # query 2 is missing the 'clap' space query 1 has
        with pytest.raises(ValueError, match="spaces"):
            dual_space_topk_blocked(
                corpus,
                [(1, {"clip": [1.0, 0.0], "clap": [0.0, 1.0]}),
                 (2, {"clip": [0.0, 1.0]})],
                k=1,
            )
        # default_space absent from the shared space set
        with pytest.raises(ValueError, match="default_space"):
            dual_space_topk_blocked(
                corpus,
                [(1, {"clap": [1.0, 0.0]})],
                k=1,
                default_space="clip",
            )

    def test_duplicate_chunk_stats_custom_id_col(self, spark):
        from multimodal_vector_db_spark.operators.cdc import (
            cdc_chunks,
            duplicate_chunk_stats,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i j k l"), (2, "a b c d e f g h i j k l")],
            "item_id long, text string",
        )
        chunks = cdc_chunks(docs, id_col="item_id")
        stats = duplicate_chunk_stats(chunks, id_col="item_id")
        rows = stats.collect()
        assert rows and all(r["n_docs"] == 2 for r in rows)
