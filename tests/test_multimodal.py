"""Multimodal binary-column plumbing tests (SURVEY §2.1 S5-S7, §2.8).

Checks the mapInPandas Arrow round-trip against local hashlib, the
frame-sampling arithmetic against a Python re-implementation of
video_embedder.py:82-114, and that the stubbed decoders fail loudly.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from multimodal_vector_db_spark.multimodal import (
    extract_features,
    media_items_from_documents,
    sample_frame_plan,
)
from multimodal_vector_db_spark.multimodal.pipeline import decode_image, load_audio

SF_DIR = "/root/testdata/sf0.001"


def test_extract_features_matches_hashlib(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    out = {
        r["id"]: r
        for r in extract_features(
            media_items_from_documents(docs), n_features=4
        ).collect()
    }
    assert set(out) == set(texts)
    for doc_id, text in texts.items():
        payload = text.encode("utf-8")
        digest = hashlib.md5(payload)
        row = out[doc_id]
        assert row["modality"] == "text"
        assert row["n_bytes"] == len(payload)
        assert row["fingerprint"] == digest.hexdigest()
        assert row["features"] == [digest.digest()[i] / 255.0 for i in range(4)]


def test_media_schema_has_binary_content(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(1)
    media = media_items_from_documents(docs)
    assert dict(media.dtypes)["content"] == "binary"
    row = media.first()
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["content"])


def test_frame_sampling_matches_python_reference(spark):
    # 3 synthetic videos: fps 1 (interval 1), fps 5 (interval 2), fps 30
    # (interval 15); 40 frames each → max_frames truncation kicks in.
    rows = [
        (video, frame, fps)
        for video, fps in [(0, 1), (1, 5), (2, 30)]
        for frame in range(40)
    ]
    frames = spark.createDataFrame(rows, "video BIGINT, t BIGINT, fps INT")
    out = sample_frame_plan(
        frames, "video", "t", "fps", sample_fps=2.0, max_frames=16
    )
    got = {
        (r["video"], r["frame_no"]) for r in out.collect()
    }
    expected = set()
    for video, fps in [(0, 1), (1, 5), (2, 30)]:
        interval = max(1, int(fps / 2.0))  # video_embedder.py:98
        kept = [f for f in range(40) if f % interval == 0][:16]
        expected |= {(video, f) for f in kept}
    assert got == expected


def test_stub_decoders_raise(spark):
    # formats OUTSIDE the real codecs stay gated on PIL / soundfile;
    # FLAC is real since round 6 — a malformed fLaC payload is now a
    # codec ValueError, not a gate
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")
    with pytest.raises(NotImplementedError):
        load_audio(b"\xff\xfb mp3 frame-ish")
    with pytest.raises(ValueError):
        load_audio(b"fLaC fake")


def test_scan_media_directory_binary_source(spark, tmp_path):
    # S3: extension-filtered directory scan via the binaryFile source
    from multimodal_vector_db_spark.sources.corpus import scan_media_directory

    media = tmp_path / "media"
    media.mkdir()
    (media / "a.mp4").write_bytes(b"\x00fake-video-a")
    (media / "b.mov").write_bytes(b"\x01fake-video-b")
    (media / "c.txt").write_bytes(b"not-a-video")
    out = scan_media_directory(
        spark, str(media), [".mp4", ".mov"], modality="video"
    )
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert set(rows) == {"a.mp4", "b.mov"}  # .txt filtered by glob
    assert rows["a.mp4"]["content"] == b"\x00fake-video-a"
    assert rows["a.mp4"]["modality"] == "video"
    assert rows["a.mp4"]["length"] == 13


def test_parse_wiki_corpus_wholetext(spark, tmp_path):
    # S4 (build_text_index.py:25-57): whole-file → blank-line chunks →
    # title/content/preview with the reference's exact length filters
    from multimodal_vector_db_spark.sources.corpus import parse_wiki_corpus

    long_body = "word " * 50  # > 100 chars
    corpus = tmp_path / "wiki"
    corpus.mkdir()
    (corpus / "wiki_00.txt").write_text(
        f"Title One\n{long_body}\n\n\n"
        f"Short\ntiny\n\n\n"  # content too short → filtered
        f"{'T' * 120}\n{long_body}\n\n\n"  # title too long → filtered
        f"Title Two\n{long_body * 2}"
    )
    out = parse_wiki_corpus(spark, str(corpus))
    rows = {r["title"]: r for r in out.collect()}
    assert set(rows) == {"Title One", "Title Two"}
    assert rows["Title Two"]["preview"].endswith("...")
    assert len(rows["Title Two"]["preview"]) == 203
    assert rows["Title One"]["content"].startswith("word word")


def test_ppm_decode_roundtrip_and_resize():
    import numpy as np

    from multimodal_vector_db_spark.multimodal.codecs import (
        decode_ppm,
        encode_ppm,
        image_features,
        resize_nearest,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(30, 20, 3), dtype=np.uint8)
    back = decode_ppm(encode_ppm(img))
    assert (back == img).all()

    small = resize_nearest(img, 8, 8)
    assert small.shape == (8, 8, 3)

    feats = image_features(img)
    assert len(feats) == 9
    assert abs(feats[0] - img[:, :, 0].mean()) < 1e-9
    assert abs(feats[4] - 20 / 30) < 1e-9
    assert abs(sum(feats[5:]) - 1.0) < 1e-9  # histogram shares


def test_wav_decode_roundtrip_and_features():
    import numpy as np

    from multimodal_vector_db_spark.multimodal.codecs import (
        audio_features,
        decode_wav,
        encode_wav,
    )

    sr = 8000
    t = np.arange(sr) / sr  # 1 second
    tone = (np.sin(2 * np.pi * 440.0 * t) * 20000).astype(np.int16)
    sr2, x = decode_wav(encode_wav(tone, sr))
    assert sr2 == sr
    assert len(x) == sr
    assert np.abs(x).max() <= 1.0

    dur, rms, zcr, centroid, rolloff = audio_features(sr2, x)
    assert abs(dur - 1.0) < 1e-9
    assert 0.3 < rms < 0.7  # sine RMS ~ amp/sqrt(2) ~ 0.43
    # a pure 440 Hz tone centroids at ~440 Hz
    assert 400 < centroid < 480, centroid
    assert 400 < rolloff < 480, rolloff


def test_real_decoders_via_pipeline_functions():
    import numpy as np

    from multimodal_vector_db_spark.multimodal.codecs import (
        encode_ppm,
        encode_wav,
    )
    from multimodal_vector_db_spark.multimodal.pipeline import (
        decode_image,
        load_audio,
    )

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    assert decode_image(encode_ppm(img)).shape == (4, 4, 3)
    sr, x = load_audio(encode_wav(np.zeros(100, dtype=np.int16), 16000))
    assert sr == 16000 and len(x) == 100


def test_extract_media_features_dispatches_by_format(spark):
    import numpy as np

    from multimodal_vector_db_spark.multimodal.codecs import (
        audio_features,
        decode_wav,
        encode_ppm,
        encode_wav,
        image_features,
    )
    from multimodal_vector_db_spark.multimodal.pipeline import (
        extract_media_features,
    )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    wav = encode_wav(
        (np.sin(np.arange(2000) * 0.2) * 10000).astype(np.int16), 8000
    )
    rows = [
        (0, "image", bytearray(encode_ppm(img)), ("image/x-ppm", 0, "t")),
        (1, "audio", bytearray(wav), ("audio/wav", 0, "t")),
        (2, "text", bytearray(b"hello world"), ("text/plain", 0, "t")),
    ]
    from multimodal_vector_db_spark.multimodal.pipeline import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["id"]: r for r in extract_media_features(media).collect()
    }
    assert got[0]["decoder"] == "netpbm"
    assert got[1]["decoder"] == "wav"
    assert got[2]["decoder"] == "digest"
    assert np.allclose(got[0]["features"], image_features(img))
    assert np.allclose(got[1]["features"], audio_features(*decode_wav(wav)))


def test_y4m_decode_roundtrip():
    import numpy as np

    from multimodal_vector_db_spark.multimodal.codecs import (
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, size=(5, 6, 8), dtype=np.uint8)
    fps, back = decode_y4m(encode_y4m(frames, fps=10))
    assert fps == 10.0
    assert back.shape == (5, 6, 8)
    assert (back == frames).all()


def test_y4m_video_pipeline_sample_and_pool(spark):
    """REAL video path end-to-end: y4m bytes -> decode -> one row per
    frame -> relational frame sampling (S6) -> temporal mean pool (A3).
    The pooled per-video luma means must equal direct numpy."""
    import numpy as np

    from multimodal_vector_db_spark.multimodal.codecs import (
        decode_y4m,
        encode_y4m,
    )
    from multimodal_vector_db_spark.multimodal.pipeline import (
        sample_frame_plan,
        video_frames_from_y4m,
    )

    rng = np.random.RandomState(5)
    vids = {
        vid: rng.randint(0, 256, size=(12, 4, 4), dtype=np.uint8)
        for vid in (0, 1)
    }
    rows = [
        (vid, bytearray(encode_y4m(f, fps=4))) for vid, f in vids.items()
    ]
    media = spark.createDataFrame(rows, "video_id long, content binary")

    frames = video_frames_from_y4m(media)
    got_frames = frames.where(F.col("video_id") == 0).count()
    assert got_frames == 12

    sampled = sample_frame_plan(
        frames, "video_id", "frame_no", "fps", sample_fps=2.0, max_frames=4
    )
    # fps=4, sample_fps=2 -> interval 2 -> frames 0,2,4,6 kept (max 4)
    kept = sorted(
        r["frame_no"]
        for r in sampled.where(F.col("video_id") == 0).collect()
    )
    assert kept == [0, 2, 4, 6]

    pooled = sampled.groupBy("video_id").agg(
        F.avg("luma_mean").alias("pooled")
    )
    for r in pooled.collect():
        expect = float(
            np.mean(
                [vids[r["video_id"]][i].mean() for i in (0, 2, 4, 6)]
            )
        )
        assert abs(r["pooled"] - expect) < 1e-9


def test_jpeg_round_trip_uniform_and_psnr():
    """Baseline JPEG codec: 8x8-aligned uniform-tile images round-trip
    EXACTLY (DC-only blocks, quant error < 1/2 LSB at q=90); random
    images round-trip within the PSNR a baseline JPEG should give."""
    import numpy as np

    from multimodal_vector_db_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(11)
    # tile-uniform grayscale: exact round trip
    tiles = rng.randint(0, 256, (3, 4), np.uint8)
    img = np.kron(tiles, np.ones((8, 8), np.uint8))
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (24, 32)
    assert np.array_equal(out, img)

    # fully uniform color: exact
    c = np.zeros((16, 16, 3), np.uint8)
    c[:] = (200, 30, 90)
    assert np.array_equal(decode_jpeg(encode_jpeg(c, quality=95)), c)

    # random gray + color: PSNR >= 30 dB at q=90/95
    for shape, q in (((40, 56), 90), ((24, 16, 3), 95)):
        x = rng.randint(0, 256, shape, np.uint8)
        y = decode_jpeg(encode_jpeg(x, quality=q))
        mse = np.mean((y.astype(float) - x.astype(float)) ** 2)
        psnr = 10 * np.log10(255.0**2 / mse)
        assert psnr >= 30.0, (shape, psnr)

    # odd (non-multiple-of-8) dimensions survive via edge padding
    odd = rng.randint(0, 256, (13, 19), np.uint8)
    assert decode_jpeg(encode_jpeg(odd)).shape == (13, 19)


def test_jpeg_bitstream_validates_against_jvm_imageio(spark):
    """The encoder's output must be a REAL JFIF stream: the JVM's
    javax.imageio (libjpeg-class decoder, no Python deps) must parse
    it and reconstruct within integer-IDCT tolerance of our own
    decoder. Grayscale compares raw raster samples (getRGB would
    apply Java's gray->sRGB colorspace ramp)."""
    import numpy as np

    from multimodal_vector_db_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    rng = np.random.RandomState(5)

    img = rng.randint(0, 256, (16, 24, 3), np.uint8)
    path = "/tmp/test_jpeg_ext.jpg"
    with open(path, "wb") as f:
        f.write(encode_jpeg(img, quality=95))
    j = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    assert j is not None
    arr = gw.new_array(jvm.int, 24 * 16)
    j.getRGB(0, 0, 24, 16, arr, 0, 24)
    a = np.array(list(arr), dtype=np.int64).reshape(16, 24)
    ext = np.stack(
        [(a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF], axis=2
    ).astype(int)
    ours = decode_jpeg(open(path, "rb").read()).astype(int)
    assert np.abs(ext - ours).max() <= 3

    g = rng.randint(0, 256, (8, 8), np.uint8)
    gpath = "/tmp/test_jpeg_ext_g.jpg"
    with open(gpath, "wb") as f:
        f.write(encode_jpeg(g, quality=90))
    jg = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(gpath))
    raster = jg.getRaster()
    ours_g = decode_jpeg(open(gpath, "rb").read()).astype(int)
    for yy in range(8):
        for xx in range(8):
            assert abs(raster.getSample(xx, yy, 0) - ours_g[yy, xx]) <= 3


def test_jpeg_decode_rejects_unsupported_and_routes(spark):
    """Progressive/subsampled markers raise ValueError from the codec;
    decode_image falls through to the PIL-gated NotImplementedError
    instead of crashing; extract_media_features tags baseline JPEGs
    with the jpeg decoder and falls back to digest for non-baseline."""
    import numpy as np
    import pytest as _pytest

    from multimodal_vector_db_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from multimodal_vector_db_spark.multimodal.pipeline import (
        decode_image,
        extract_media_features,
    )

    good = encode_jpeg(np.full((8, 8), 77, np.uint8))
    # corrupt SOF0 -> SOF2 (progressive)
    bad = bytearray(good)
    idx = bad.find(b"\xff\xc0")
    bad[idx + 1] = 0xC2
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    with _pytest.raises(NotImplementedError):
        decode_image(bytes(bad))  # falls to the PIL-gated path
    assert decode_image(good)[0, 0] == 77

    media = spark.createDataFrame(
        [(1, "image", bytearray(good)), (2, "image", bytearray(bad))],
        "id long, modality string, content binary",
    )
    rows = {r["id"]: r for r in extract_media_features(media).collect()}
    assert rows[1]["decoder"] == "jpeg"
    assert abs(rows[1]["features"][0] - 77.0) < 0.01
    assert rows[2]["decoder"] == "digest"


def test_media_features_quarantine_lane(spark):
    import numpy as np

    from multimodal_vector_db_spark.multimodal.codecs import encode_ppm
    from multimodal_vector_db_spark.multimodal.pipeline import (
        extract_media_features_quarantined,
    )

    good = encode_ppm(np.full((2, 2, 3), 9, np.uint8))
    truncated = good[:-5]                     # valid header, short pixels
    bad_maxval = b"P6\n2 2\n65535\n" + b"\x00" * 12
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(good)),
            (2, "image", bytearray(truncated)),
            (3, "image", bytearray(bad_maxval)),
        ],
        "id long, modality string, content binary",
    )
    rows = {
        r["id"]: r
        for r in extract_media_features_quarantined(media).collect()
    }
    assert rows[1]["decoder"] == "netpbm" and rows[1]["error"] is None
    assert rows[1]["features"] is not None
    for bad_id, needle in [(2, "truncated"), (3, "maxval")]:
        assert rows[bad_id]["decoder"] == "error"
        assert rows[bad_id]["features"] is None
        assert needle in rows[bad_id]["error"]


class TestFlacCodec:
    """Pure-numpy FLAC codec (multimodal/flac.py): FLAC is lossless,
    so every round-trip assertion is EXACT equality — the strongest
    check a codec can get. Covers every subframe type, both stereo
    decorrelation families, rice partitioning, non-16 bit depths,
    CRC enforcement, and agreement with the WAV decoder on identical
    PCM."""

    def _sig(self, n=2000, seed=3):
        import numpy as np

        rng = np.random.default_rng(seed)
        t = np.arange(n)
        return (
            3000 * np.sin(t / 20) + rng.integers(-50, 50, n)
        ).astype(np.int64)

    def test_all_subframe_types_round_trip(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.flac import (
            decode_flac,
            encode_flac,
        )

        x = self._sig()
        want = x.astype(np.float64) / 32768.0
        sizes = {}
        for mode in ("verbatim", "fixed0", "fixed1", "fixed2",
                     "fixed3", "fixed4", "lpc"):
            b = encode_flac(x, 16000, subframe=mode)
            sr, y = decode_flac(b)
            assert sr == 16000 and np.array_equal(y, want), mode
            sizes[mode] = len(b)
        # prediction must actually compress vs verbatim on smooth data
        assert sizes["fixed2"] < sizes["fixed1"] < sizes["verbatim"]
        # constant subframe
        c = np.full(1024, -1234, dtype=np.int64)
        sr, y = decode_flac(encode_flac(c, 8000, subframe="constant"))
        assert sr == 8000 and np.array_equal(y, c / 32768.0)

    def test_zero_sample_stream_round_trip(self):
        """A valid zero-sample FLAC stream (STREAMINFO total_samples=0,
        no frames — exactly what encode_flac emits for empty input)
        decodes to an empty signal instead of a numpy concatenate
        error (regression for the round-6 advice)."""
        import numpy as np

        from multimodal_vector_db_spark.multimodal.flac import (
            decode_flac,
            encode_flac,
        )

        sr, y = decode_flac(encode_flac(np.zeros(0, dtype=np.int64), 16000))
        assert sr == 16000 and y.shape == (0,)

    def test_stereo_decorrelation_modes(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.flac import (
            decode_flac,
            encode_flac,
        )

        x = self._sig()
        st = np.stack([x, x // 2 + 101], axis=1)
        want = st.mean(axis=1) / 32768.0  # decoder downmixes to mono
        for mode in ("independent", "left_side", "right_side",
                     "mid_side"):
            sr, y = decode_flac(
                encode_flac(st, 44100, subframe="fixed2", stereo=mode)
            )
            assert sr == 44100 and np.array_equal(y, want), mode

    def test_partitioned_rice_and_8bit(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.flac import (
            decode_flac,
            encode_flac,
        )

        rng = np.random.default_rng(11)
        x8 = rng.integers(-100, 100, 512).astype(np.int64)
        sr, y = decode_flac(
            encode_flac(x8, 22050, bps=8, block_size=256,
                        subframe="fixed1", part_order=2)
        )
        assert sr == 22050 and np.array_equal(y, x8 / 128.0)

    def test_crc_corruption_detected(self):
        import pytest

        from multimodal_vector_db_spark.multimodal.flac import (
            decode_flac,
            encode_flac,
        )

        b = bytearray(encode_flac(self._sig(512), 16000))
        b[-1] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            decode_flac(bytes(b))
        with pytest.raises(ValueError, match="magic"):
            decode_flac(b"nope" + bytes(b))

    def test_matches_wav_decoder_on_same_pcm(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.codecs import (
            decode_wav,
            encode_wav,
        )
        from multimodal_vector_db_spark.multimodal.flac import (
            decode_flac,
            encode_flac,
        )

        x = self._sig(1600, seed=9)
        sr_w, yw = decode_wav(encode_wav(x.astype(np.int16), 16000))
        sr_f, yf = decode_flac(encode_flac(x, 16000))
        assert sr_w == sr_f == 16000
        assert np.array_equal(yw, yf)

    def test_pipeline_dispatch(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.flac import encode_flac
        from multimodal_vector_db_spark.multimodal.pipeline import (
            load_audio,
        )

        x = self._sig(800)
        sr, y = load_audio(encode_flac(x, 16000))
        assert sr == 16000 and np.array_equal(
            y, x.astype(np.float64) / 32768.0
        )

    def test_spark_feature_extraction_flac(self, spark):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.flac import encode_flac
        from multimodal_vector_db_spark.multimodal.pipeline import (
            extract_media_features,
        )

        x = self._sig(800)
        media = spark.createDataFrame(
            [(1, "audio", encode_flac(x, 16000))],
            "id long, modality string, content binary",
        )
        row = extract_media_features(media).collect()[0]
        assert row["decoder"] == "flac"
        assert row["features"] is not None and len(row["features"]) > 0


class TestMelSpectrogram:
    """Real DSP front-end (Hann/rfft/mel): analytic checks — a pure
    sine concentrates energy in the mel band containing its frequency,
    WAV and FLAC containers yield identical features, and the Spark
    operator preserves both."""

    def _sine(self, f, sr=16000, n=4096):
        import numpy as np

        t = np.arange(n) / sr
        return (np.sin(2 * np.pi * f * t) * 20000).astype(np.int64)

    def test_sine_peaks_in_expected_band(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.codecs import (
            log_mel_spectrogram,
            mel_filterbank,
        )

        sr, n_fft, n_mels = 16000, 256, 32
        fb = mel_filterbank(sr, n_fft, n_mels)
        for f in (500.0, 2000.0, 6000.0):
            x = self._sine(f, sr) / 32768.0
            m = log_mel_spectrogram(x, sr, n_fft=n_fft, n_mels=n_mels)
            got_band = int(np.argmax(m.mean(axis=0)))
            # expected: band whose filter weight at the sine's FFT bin
            # is largest
            k = int(round(f * n_fft / sr))
            want_band = int(np.argmax(fb[:, k]))
            assert abs(got_band - want_band) <= 1, (f, got_band, want_band)

    def test_filterbank_shape_and_coverage(self):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.codecs import (
            mel_filterbank,
        )

        fb = mel_filterbank(16000, 256, 32)
        assert fb.shape == (32, 129)
        assert float(fb.min()) >= 0.0 and float(fb.max()) <= 1.0
        # every band has some support
        assert (fb.sum(axis=1) > 0).all()

    def test_wav_and_flac_agree_and_spark_op(self, spark):
        import numpy as np

        from multimodal_vector_db_spark.multimodal.codecs import encode_wav
        from multimodal_vector_db_spark.multimodal.flac import encode_flac
        from multimodal_vector_db_spark.multimodal.pipeline import (
            audio_mel_features,
        )

        x = self._sine(1000.0)
        wav = encode_wav(x.astype(np.int16), 16000)
        flac = encode_flac(x, 16000)
        media = spark.createDataFrame(
            [(1, wav), (2, flac)], "id long, content binary"
        )
        rows = {r["id"]: r for r in audio_mel_features(media).collect()}
        assert rows[1]["n_frames"] == rows[2]["n_frames"] > 0
        assert rows[1]["mel"] == rows[2]["mel"]  # lossless == identical
        assert len(rows[1]["mel"]) == 32


class TestAudioContentRetrieval:
    """Content-based audio retrieval (round-7): the hash-checked
    sequency path AND the real log-mel path both recover planted
    same-category structure — the torch-free CLAP-retrieval demo
    (reference audio_embedder.py:327-352, J5)."""

    def test_sequency_knn_recovers_clip_groups(self, spark):
        """audio_content_knn's front-end: mod-40 WAV groups differ in
        one sample, so a query clip's nearest non-self neighbours must
        be its own group members."""
        from pyspark.sql import functions as F

        from multimodal_vector_db_spark.functions.vector import l2_normalize
        from multimodal_vector_db_spark.multimodal.pipeline import (
            audio_sequency_features,
        )
        from multimodal_vector_db_spark.operators.knn import knn_join
        from multimodal_vector_db_spark.queries.m12_curation4 import (
            _afp_media,
        )

        docs = spark.range(120).select(F.col("id").alias("doc_id"))
        feats = audio_sequency_features(_afp_media(docs))
        rel = F.transform(
            F.col("bands"),
            lambda b: F.coalesce(
                F.try_divide(
                    b.cast("double"), F.col("total").cast("double")
                ),
                F.lit(0.0),
            ),
        )
        corpus = feats.select(
            F.col("doc_id").alias("id"), l2_normalize(rel).alias("embedding")
        )
        queries = corpus.where(F.col("id") < 3).select(
            F.col("id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
        out = knn_join(corpus, queries, k=3).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["id"]))
        for qid, hits in by_q.items():
            hits = [i for _, i in sorted(hits)]
            assert hits[0] == qid  # self first (sim 1.0)
            # remaining top hits are the query's own mod-40 group
            assert all(h % 40 == qid for h in hits[1:]), (qid, hits)

    def test_logmel_knn_recovers_tone_categories(self, spark):
        """The REAL rfft log-mel front-end (audio_mel_features) +
        exact kNN: clips are low-tone vs high-tone sines with per-clip
        phase jitter; every query's nearest non-self neighbours must
        share its category. (This path is pytest-verified rather than
        hash-checked — pocketfft butterfly order is not
        SQL-replayable; see audio_sequency_features.)"""
        import numpy as np
        from pyspark.sql import functions as F

        from multimodal_vector_db_spark.functions.vector import l2_normalize
        from multimodal_vector_db_spark.multimodal.codecs import encode_wav
        from multimodal_vector_db_spark.multimodal.pipeline import (
            audio_mel_features,
        )
        from multimodal_vector_db_spark.operators.knn import knn_join

        sr, n = 8000, 2048
        t = np.arange(n) / sr
        rows = []
        for i in range(12):
            freq = 220.0 if i % 2 == 0 else 2400.0  # category = parity
            phase = 0.37 * i
            x = 0.7 * np.sin(2 * np.pi * freq * t + phase)
            rows.append((i, encode_wav((x * 32767).astype(np.int16), sr)))
        media = spark.createDataFrame(rows, "id long, content binary")

        mel = audio_mel_features(media, id_col="id")
        corpus = mel.select(
            "id", l2_normalize(F.col("mel")).alias("embedding")
        )
        queries = corpus.where(F.col("id") < 4).select(
            F.col("id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
        out = knn_join(corpus, queries, k=4).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["id"]))
        for qid, hits in by_q.items():
            hits = [i for _, i in sorted(hits)]
            assert hits[0] == qid
            assert all(h % 2 == qid % 2 for h in hits), (qid, hits)
