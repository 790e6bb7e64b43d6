"""Multimodal operator tests: plumbing is real, decode is the stub.

Strategy mirrors SURVEY.md §5: (a) unit tests on the decode stubs as
plain functions, (b) pipeline tests running the mapInPandas stages on
real testdata and re-deriving the expected values in local numpy.
"""

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from dataflowtemplates_spark.catalog import register_tables
from dataflowtemplates_spark.operators.multimodal import (
    FRAME_BYTES,
    attach_media,
    decode_audio,
    decode_image,
    image_features,
    resize_media,
    sample_frames,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    register_tables(spark, SF_SMOKE)
    return attach_media(spark.table("documents"))


def test_decode_real_rejects_non_media_payloads():
    """real=True decodes actual PNG/JPEG/WAV (tests/test_imagecodec.py
    covers the codecs); a payload that is NOT one of those formats must
    fail loudly, never fall back to the stub silently."""
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"xy", 4, 4, real=True)
    with pytest.raises(ValueError):
        decode_audio(b"xy", 8000, real=True)


def test_decode_image_deterministic_tiling():
    arr = decode_image(b"abc", 4, 2)
    assert arr.shape == (2, 4, 3) and arr.dtype == np.uint8
    assert bytes(arr.ravel()) == (b"abc" * 8)[:24]
    # empty payload -> zeros, not a crash
    assert decode_image(b"", 2, 2).sum() == 0


def test_decode_audio_roundtrip():
    wave = decode_audio(bytes(range(256)), 8000)
    assert wave.dtype == np.float32
    back = np.round(wave * 128.0 + 128.0).astype(np.uint8)
    assert bytes(back) == bytes(range(256))


def test_attach_media_schema_and_meta(media):
    rows = media.orderBy("doc_id").limit(6).collect()
    assert [f.name for f in media.schema] == [
        "doc_id", "source", "media", "media_meta"]
    for r in rows:
        n = len(r.media)
        m = r.media_meta
        assert m.modality == ["image", "audio", "video"][r.doc_id % 3]
        if m.modality == "audio":
            assert m.width is None and m.sample_rate == 8000 + (n % 4) * 4000
        else:
            assert m.width == 16 + n % 64 and m.height == 16 + n % 48
        if m.modality == "video":
            assert m.n_frames == 1 + n // FRAME_BYTES


def test_image_features_match_local_numpy(media, spark):
    feats = {r.doc_id: r for r in image_features(media).collect()}
    src = {r.doc_id: r for r in media.collect()}
    assert feats.keys() == src.keys()
    for doc_id, r in list(feats.items())[:20]:
        payload = bytes(src[doc_id].media)
        meta = src[doc_id].media_meta
        assert r.phash == hashlib.md5(payload).hexdigest()
        assert r.n_bytes == len(payload)
        if meta.modality == "audio":
            expected = float(np.frombuffer(payload, np.uint8)
                             .astype(np.float64).mean())
        else:
            expected = float(decode_image(payload, meta.width, meta.height).mean())
        assert r.mean_intensity == pytest.approx(expected, abs=1e-9)


def test_resize_media_shapes(media):
    out = resize_media(media, 8, 8)
    for r in out.collect():
        m = r.media_meta
        if m.modality == "audio":
            continue
        assert (m.width, m.height) == (8, 8)
        assert len(r.media) == 8 * 8 * 3


def test_sample_frames_counts_and_content(media):
    got = sample_frames(media, every_n=2).collect()
    src = {r.doc_id: bytes(r.media) for r in media.collect()
           if r.media_meta.modality == "video"}
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc.keys() == src.keys()
    for doc_id, frames in by_doc.items():
        data = src[doc_id]
        n_frames = max(1, -(-len(data) // FRAME_BYTES))
        expect_idx = list(range(0, n_frames, 2))
        assert sorted(r.frame_idx for r in frames) == expect_idx
        for r in frames:
            lo = r.frame_idx * FRAME_BYTES
            assert bytes(r.frame) == data[lo:lo + FRAME_BYTES]


def test_metadata_filter_prunes_before_python(media):
    # the video filter must appear as a JVM-side Filter under the scan,
    # not inside the Python stage: assert it's in the optimized plan
    plan = sample_frames(media, every_n=2)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "video" in plan and "Filter" in plan
