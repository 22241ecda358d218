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
    # formats OUTSIDE the real stdlib codecs (netpbm / PCM WAV) stay
    # gated on PIL / soundfile
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")
    with pytest.raises(NotImplementedError):
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
