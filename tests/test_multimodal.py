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
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")
    with pytest.raises(NotImplementedError):
        load_audio(b"RIFF fake")


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
