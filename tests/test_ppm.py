"""Pure-NumPy PPM (P6) codec: round-trip, header grammar, malformed-input
rejection, nearest-neighbor resize, and the Spark decode/resize operators.

This is the REAL multimodal decode path (no codec libraries): the driver
query `multimodal_decode_ppm` parses actual image bytes, so the codec's
behavior is pinned independently here.
"""

from __future__ import annotations

import numpy as np
import pytest

from levenshtein_spark.operators.media import _pick_decoder, decode_ppm_meta
from levenshtein_spark.operators.ppm import (
    channel_sums,
    decode_ppm,
    encode_ppm,
    resize_nearest,
)


def _rand_img(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.int64).astype(np.uint8)


def test_roundtrip():
    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (1, 17), (9, 1), (13, 7), (64, 48)]:
        img = _rand_img(rng, h, w)
        out = decode_ppm(encode_ppm(img))
        assert out.shape == (h, w, 3)
        assert (out == img).all()


def test_header_grammar():
    raster = bytes(range(12))  # 2x2 image
    # comments and arbitrary whitespace between header tokens are legal
    payload = b"P6 # a comment\n  2\t2 # dims\n255\n" + raster
    img = decode_ppm(payload)
    assert img.shape == (2, 2, 3)
    assert img.tobytes() == raster
    # trailing junk after the raster is ignored (spec: exactly w*h*3 bytes)
    assert (decode_ppm(b"P6\n2 2\n255\n" + raster + b"junk") == img).all()


@pytest.mark.parametrize(
    "payload",
    [
        b"",  # empty
        b"P5\n2 2\n255\n" + bytes(12),  # greyscale PGM, not PPM
        b"P6\n2 2\n65535\n" + bytes(24),  # 2-byte samples unsupported
        b"P6\n2 2\n255\n" + bytes(11),  # short raster
        b"P6\n2 -2\n255\n" + bytes(12),  # bad integer
        b"P6\n2 2",  # truncated header
        b"P6\n0 2\n255\n",  # zero dimension
    ],
)
def test_malformed_rejected(payload):
    with pytest.raises(ValueError):
        decode_ppm(payload)


def test_resize_identity_and_blocks():
    rng = np.random.default_rng(7)
    img = _rand_img(rng, 6, 4)
    assert (resize_nearest(img, 4, 6) == img).all()
    # 2x upscale of a 2x2 image = 2x2 blocks of the source pixels
    small = _rand_img(rng, 2, 2)
    up = resize_nearest(small, 4, 4)
    for y in range(4):
        for x in range(4):
            assert (up[y, x] == small[y // 2, x // 2]).all()


def test_resize_matches_naive_loop():
    rng = np.random.default_rng(11)
    img = _rand_img(rng, 9, 14)
    for out_w, out_h in [(5, 3), (14, 9), (28, 2), (1, 1)]:
        got = resize_nearest(img, out_w, out_h)
        for y in range(out_h):
            for x in range(out_w):
                assert (got[y, x] == img[(y * 9) // out_h, (x * 14) // out_w]).all()


def test_channel_sums_exact():
    rng = np.random.default_rng(3)
    img = _rand_img(rng, 21, 17)
    sr, sg, sb, n = channel_sums(img)
    assert n == 21 * 17
    assert sr == int(img[:, :, 0].sum())
    assert sg == int(img[:, :, 1].sum())
    assert sb == int(img[:, :, 2].sum())


def test_codec_selection():
    rng = np.random.default_rng(5)
    img = _rand_img(rng, 3, 5)
    payload = encode_ppm(img)
    assert _pick_decoder("ppm")(payload) == {"width": 5, "height": 3}
    # auto: P6 magic decodes for real, anything else falls to the stub
    auto = _pick_decoder("auto")
    from levenshtein_spark.operators.media import HAS_PIL

    if not HAS_PIL:
        assert auto(payload) == {"width": 5, "height": 3}
        n = len(b"not an image")
        assert auto(b"not an image") == {"width": n % 640, "height": (n * 7) % 480}
    with pytest.raises(ValueError):
        decode_ppm_meta(b"GIF89a...")


def test_spark_decode_and_resize(spark):
    import pandas as pd

    from levenshtein_spark.operators.media import extract_image_features, resize_ppm

    rng = np.random.default_rng(13)
    imgs = {i: _rand_img(rng, 4 + i, 3 + 2 * i) for i in range(4)}
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(imgs), "payload": [encode_ppm(v) for v in imgs.values()]}
        )
    )
    feats = {r["doc_id"]: r for r in extract_image_features(df).collect()}
    for i, img in imgs.items():
        sr, sg, sb, n = channel_sums(img)
        r = feats[i]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (sr / n, sg / n, sb / n)

    resized = {r["doc_id"]: r for r in resize_ppm(df, 5, 6).collect()}
    for i, img in imgs.items():
        out = decode_ppm(bytes(resized[i]["payload"]))
        assert (out == resize_nearest(img, 5, 6)).all()
