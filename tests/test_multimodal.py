"""Multimodal operator plumbing: Arrow binary round-trip, typed
metadata, batch-shaped pandas UDFs, and the decode-stub contract."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from flink_cep_examples_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    media_table,
    resize_media,
    sample_frames,
)
from flink_cep_examples_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_small):
    return media_table(load_table(spark, sf_small, "documents"))


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_media(b"abc", "png", fake=False)
    arr = decode_media(b"abc", "png")
    assert arr.dtype == np.uint8 and list(arr) == [97, 98, 99]


def test_media_schema_and_binary_roundtrip(spark, media):
    # same type shape (nullability flags differ between a computed
    # projection and the declared UDF schema)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    row = media.orderBy("doc_id").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.format in ("png", "jpeg", "wav", "mp4")


def test_features_match_pure_numpy(spark, media):
    feats = {r.doc_id: r for r in extract_features(media).collect()}
    src = {r.doc_id: bytes(r.payload) for r in media.collect()}
    assert feats.keys() == src.keys()
    assert extract_features(media).schema == FEATURE_SCHEMA
    for doc_id in list(src)[:20]:
        arr = np.frombuffer(src[doc_id], dtype=np.uint8)
        r = feats[doc_id]
        assert r.payload_bytes == arr.size
        assert r.mean_byte == pytest.approx(float(arr.mean()))
        hist = np.bincount(arr >> 4, minlength=16)
        assert r.hist16 == ",".join(map(str, hist))


def test_frame_sample_reassembles(spark, media):
    frames = sample_frames(media, every=1).collect()
    src = {r.doc_id: (bytes(r.payload), r.meta.n_frames) for r in media.collect()}
    by_doc: dict[int, list] = {}
    for f in frames:
        by_doc.setdefault(f.doc_id, []).append(f)
    for doc_id, fs in by_doc.items():
        payload, n = src[doc_id]
        size = len(payload) // n
        assert len(fs) == n
        for f in sorted(fs, key=lambda x: x.frame_idx):
            chunk = payload[f.frame_idx * size : (f.frame_idx + 1) * size]
            assert f.frame_md5 == hashlib.md5(chunk).hexdigest()


def test_resize_exact_size_and_determinism(spark, media):
    out = resize_media(media, 8, 4).select("doc_id", "payload", "meta").collect()
    assert all(len(bytes(r.payload)) == 32 for r in out)
    assert all(r.meta.width == 8 and r.meta.height == 4 for r in out)
    again = resize_media(media, 8, 4).select("doc_id", "payload").collect()
    assert {r.doc_id: bytes(r.payload) for r in out} == {
        r.doc_id: bytes(r.payload) for r in again
    }


def test_real_decode_contract_png():
    """Real-mode decode contract: WITH a codec installed, a round-trip
    PNG decodes to the flat grayscale uint8 array the fake mode's shape
    contract promises; WITHOUT codecs (this sandbox) the call must
    raise NotImplementedError — never a silent wrong answer."""
    import numpy as np
    import pytest

    from flink_cep_examples_spark.operators.multimodal import decode_media

    try:
        import io

        from PIL import Image
    except ImportError:
        with pytest.raises(NotImplementedError, match="PIL"):
            decode_media(b"\x89PNG fake", "png", fake=False)
        return
    img = Image.fromarray(
        np.arange(64, dtype=np.uint8).reshape(8, 8), mode="L"
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    arr = decode_media(buf.getvalue(), "png", fake=False)
    assert arr.dtype == np.uint8 and arr.shape == (64,)
    assert (arr == np.arange(64, dtype=np.uint8)).all()


def test_real_decode_video_always_gated():
    """mp4 has no bundled decoder in any environment (needs ffmpeg):
    real mode must always raise, codecs or not."""
    import pytest

    from flink_cep_examples_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_media(b"\x00\x00\x00 ftypmp42", "mp4", fake=False)
