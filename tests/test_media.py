"""Multimodal metadata extraction: stub path through Spark, PIL flag paths."""

from __future__ import annotations

import hashlib
import io

import pytest

from levenshtein_spark.operators import media


def test_extract_media_meta_stub(spark):
    rows = [(1, b"\x89PNG" + b"x" * 100), (2, b"RIFF" + b"y" * 7)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in media.extract_media_meta(df, codec="stub").collect()}
    assert out[1].n_bytes == 104
    assert out[1].sha == hashlib.sha256(rows[0][1]).hexdigest()
    assert out[1].width == 104 % 640 and out[1].height == (104 * 7) % 480
    assert out[2].n_bytes == 11


def test_codec_pil_raises_without_pil():
    if media.HAS_PIL:  # pragma: no cover - sandbox has no PIL
        pytest.skip("PIL installed; the error path is not reachable")
    with pytest.raises(NotImplementedError, match="codec"):
        media._pick_decoder("pil")
    with pytest.raises(NotImplementedError, match="image codec"):
        media.decode_image(b"anything")


def test_decode_image_via_fake_pil(monkeypatch):
    """The PIL branch itself, driven by a fake Image module (the real
    library is absent in this sandbox; on a cluster with pillow the same
    branch runs unchanged)."""

    class FakeImg:
        width, height = 320, 200

    class FakeImageMod:
        @staticmethod
        def open(fp):
            assert isinstance(fp, io.BytesIO)
            return FakeImg()

    monkeypatch.setattr(media, "HAS_PIL", True)
    monkeypatch.setattr(media, "_PILImage", FakeImageMod)
    assert media.decode_image(b"bytes") == {"width": 320, "height": 200}
    assert media._pick_decoder("auto") is media.decode_image
    assert media._pick_decoder("pil") is media.decode_image


def test_unknown_codec_rejected():
    with pytest.raises(ValueError, match="unknown codec"):
        media._pick_decoder("ffmpeg")


def test_sample_frames_boundaries(spark):
    from levenshtein_spark.operators.media import sample_frames
    import hashlib as hl
    import pyspark.sql.functions as F

    rows = [
        (1, b"a" * 1000),   # 4 frames of 256 (last short) -> sampled idx 0
        (2, b"b" * 1537),   # 7 frames -> sampled idx 0, 4
        (3, b""),           # empty -> no frames
        (4, b"c" * 256),    # exactly one frame
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r.doc_id, r.frame_idx, r.frame_len, r.frame_sha)
        for r in sample_frames(df, frame_bytes=256, every=4).collect()
    }
    def sha(b): return hl.sha256(b).hexdigest()
    exp = {
        (1, 0, 256, sha(b"a" * 256)),
        (2, 0, 256, sha(b"b" * 256)),
        (2, 4, 256, sha(b"b" * 256)),
        (4, 0, 256, sha(b"c" * 256)),
    }
    assert got == exp


def test_resize_stub_shape_and_determinism(spark):
    from levenshtein_spark.operators.media import resize_stub
    import hashlib as hl

    df = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"")], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in resize_stub(df, width=8, height=4).collect()}
    assert set(out) == {1, 2}
    for i, src in ((1, b"payload-one"), (2, b"")):
        r = out[i]
        assert (r.width, r.height) == (8, 4)
        assert len(r.payload) == 8 * 4
        digest = hl.sha256(src).digest()
        assert bytes(r.payload) == (digest * 2)[: 8 * 4]
