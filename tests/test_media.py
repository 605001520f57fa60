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
