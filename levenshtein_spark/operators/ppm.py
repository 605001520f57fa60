"""Pure-NumPy PPM (P6) image codec — a REAL decode path with zero codec deps.

Netpbm's binary PPM is a public, trivially specified format (one ASCII
header, then raw RGB bytes), which makes it the honest way to complete the
multimodal decode step in this codec-less sandbox: ``decode_ppm`` parses
actual image bytes into an ``(h, w, 3)`` pixel array, ``resize_nearest``
really resamples it, and ``channel_sums`` really aggregates pixels — no
stub anywhere on this path. A cluster with richer codecs swaps the decoder
behind the same ``operators/media.py`` feature flag (codec="pil") without
touching the Spark plumbing.

Format (Netpbm spec): ``P6`` magic, then three ASCII integers (width,
height, maxval) separated by whitespace, with ``#`` comments legal between
tokens, then ONE whitespace byte, then ``width*height*3`` raw bytes
(maxval <= 255; the 2-byte maxval>255 variant is rejected explicitly).
"""

from __future__ import annotations

import numpy as np

_WS = b" \t\n\r\x0b\x0c"


def _read_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Next header token starting at ``pos``: skips whitespace and
    ``#``-to-end-of-line comments (the spec's header grammar)."""
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c in (b"#",):
            while pos < n and buf[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        elif c in _WS:
            pos += 1
        else:
            break
    start = pos
    while pos < n and buf[pos : pos + 1] not in _WS and buf[pos : pos + 1] != b"#":
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return buf[start:pos], pos


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6) bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) pixels, got shape {arr.shape}")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8 array. Raises ``ValueError``
    on anything malformed (wrong magic, maxval > 255, short pixel data)."""
    if not isinstance(payload, (bytes, bytearray)):
        raise ValueError("payload must be bytes")
    payload = bytes(payload)
    magic, pos = _read_token(payload, 0)
    if magic != b"P6":
        raise ValueError(f"not a binary PPM (magic {magic!r}, expected b'P6')")
    fields = []
    for _ in range(3):
        tok, pos = _read_token(payload, pos)
        if not tok.isdigit():
            raise ValueError(f"bad PPM header integer {tok!r}")
        fields.append(int(tok))
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError(f"2-byte PPM samples unsupported (maxval {maxval})")
    if maxval <= 0 or w <= 0 or h <= 0:
        raise ValueError(f"bad PPM dimensions {w}x{h} maxval={maxval}")
    # exactly one whitespace byte separates the header from the raster
    if pos >= len(payload) or payload[pos : pos + 1] not in _WS:
        raise ValueError("missing whitespace before PPM raster")
    pos += 1
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError(f"short PPM raster: need {need} bytes, have {len(raster)}")
    return np.frombuffer(raster, np.uint8).reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample to (out_h, out_w, 3) — deterministic index
    map ``src = floor(dst * src_len / dst_len)`` (the classic integer NN
    grid, reproducible across any partitioning)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    if out_w <= 0 or out_h <= 0:
        raise ValueError("output dimensions must be positive")
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[rows[:, None], cols[None, :], :]


def channel_sums(pixels: np.ndarray) -> tuple[int, int, int, int]:
    """(sum_r, sum_g, sum_b, n_pixels) as exact ints — callers derive means
    with ONE double divide so the value is bit-reproducible in any engine."""
    arr = np.asarray(pixels, dtype=np.uint8)
    s = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    return int(s[0]), int(s[1]), int(s[2]), int(arr.shape[0] * arr.shape[1])
