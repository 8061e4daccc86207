"""Multimodal binary-column plumbing: mapInPandas batch shape, null
handling, magic sniffing, deterministic fallback features."""

from __future__ import annotations

import hashlib

import pytest

from big_data_project_datapipeline_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    documents_as_media,
    extract_media_features,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\nrest-of-png", "image/png"),
        (2, b"\xff\xd8\xff\xe0jpeg-bytes", "image/jpeg"),
        (3, b"RIFF....WAVE", "audio/wav"),
        (4, b"plain text bytes", "text/plain"),
        (5, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features(media):
    out = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert out[1]["sniffed_kind"] == "image/png"
    assert out[2]["sniffed_kind"] == "image/jpeg"
    assert out[3]["sniffed_kind"] == "audio/wav"
    assert out[4]["sniffed_kind"] == "application/octet-stream"
    assert out[5]["sniffed_kind"] is None and out[5]["n_bytes"] is None

    content = b"\x89PNG\r\n\x1a\nrest-of-png"
    assert out[1]["n_bytes"] == len(content)
    assert out[1]["md5"] == hashlib.md5(content).hexdigest()
    # deterministic fake dims: multiples of 16 in [16, 1024]
    assert out[1]["width"] % 16 == 0 and 16 <= out[1]["width"] <= 1024


def test_features_deterministic(media):
    a = sorted(map(tuple, extract_media_features(media).collect()))
    b = sorted(map(tuple, extract_media_features(media).collect()))
    assert a == b


def test_decode_stub_raises_cleanly():
    with pytest.raises((NotImplementedError, Exception)):
        decode_image(b"\x89PNG....")


def test_documents_adapter(spark):
    docs = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    out = extract_media_features(documents_as_media(docs)).collect()[0]
    assert out["media_id"] == 7
    assert out["n_bytes"] == len(b"hello world")
    assert out["md5"] == hashlib.md5(b"hello world").hexdigest()


def test_resize_plumbing(media):
    from big_data_project_datapipeline_spark.functions.multimodal import (
        resize_images,
    )

    out = {r["media_id"]: r for r in resize_images(media, 224, 224).collect()}
    assert len(out) == 5  # 1→1, null rows preserved
    assert out[1]["width"] == out[1]["height"] == 224
    assert bytes(out[1]["content"]).startswith(b"FAKE-RESIZE:224x224:")
    assert out[5]["content"] is None and out[5]["width"] is None
    # deterministic: same input bytes → same output bytes
    again = {r["media_id"]: r for r in resize_images(media, 224, 224).collect()}
    assert bytes(again[2]["content"]) == bytes(out[2]["content"])


def test_frame_sample_fanout(media):
    from big_data_project_datapipeline_spark.functions.multimodal import (
        sample_video_frames,
    )

    rows = sample_video_frames(media, n_frames=3, fps=2.0).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {1, 2, 3, 4}  # null content yields no frames
    for frames in by_id.values():
        assert sorted(f["frame_idx"] for f in frames) == [0, 1, 2]
        assert sorted(f["ts_offset_s"] for f in frames) == [0.0, 0.5, 1.0]
    assert bytes(by_id[1][0]["frame"]).startswith(b"FAKE-FRAME:")
