"""Pure-NumPy WAV (RIFF PCM) audio codec — the audio leg of the real
multimodal decode path, zero codec dependencies.

Canonical RIFF/WAVE with a PCM ``fmt `` chunk and a ``data`` chunk is a
public, fixed-layout format: 12-byte RIFF header, then tagged chunks
(4-byte id + 4-byte little-endian size). ``decode_wav`` walks the chunk
list (tolerating extra chunks like ``LIST`` the way real files carry them),
validates the PCM format fields, and returns the sample matrix — an actual
parse of actual audio bytes, exactly like ``operators/ppm.py`` does for
images. Only integer PCM (8/16-bit) is supported; anything else raises.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_samples, n_channels) int16 array → canonical RIFF/WAVE bytes."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] < 1:
        raise ValueError(f"expected (n_samples, n_channels), got {arr.shape}")
    if sample_rate <= 0:
        raise ValueError("sample_rate must be positive")
    n_channels = arr.shape[1]
    data = arr.tobytes()  # interleaved little-endian (numpy native on LE)
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → ((n_samples, n_channels) int array, sample_rate).

    Walks the chunk list (skipping unknown chunks and their pad bytes),
    requires a PCM ``fmt `` chunk before ``data``, supports 16-bit signed
    and 8-bit unsigned PCM. Raises ``ValueError`` on anything malformed.
    """
    if not isinstance(payload, (bytes, bytearray)):
        raise ValueError("payload must be bytes")
    payload = bytes(payload)
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_at = pos + 8
        if body_at + size > len(payload):
            raise ValueError(f"truncated {cid!r} chunk: need {size} bytes")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"short fmt chunk ({size} bytes)")
            audio_format, n_channels, sample_rate, _, block_align, bits = (
                struct.unpack_from("<HHIIHH", payload, body_at)
            )
            if audio_format != 1:
                raise ValueError(f"only PCM supported (format tag {audio_format})")
            if bits not in (8, 16):
                raise ValueError(f"only 8/16-bit PCM supported (got {bits})")
            if n_channels < 1 or sample_rate <= 0:
                raise ValueError(f"bad fmt: channels={n_channels} rate={sample_rate}")
            if block_align != n_channels * (bits // 8):
                raise ValueError(f"block_align {block_align} inconsistent with fmt")
            fmt = (n_channels, sample_rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            n_channels, sample_rate, bits = fmt
            width = bits // 8
            frame = n_channels * width
            if size % frame:
                raise ValueError(f"data size {size} not a whole number of frames")
            raw = payload[body_at : body_at + size]
            dtype = np.dtype("<i2") if bits == 16 else np.uint8
            arr = np.frombuffer(raw, dtype).reshape(-1, n_channels)
            return arr, sample_rate
        pos = body_at + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk found")


def audio_stats(samples: np.ndarray) -> tuple[int, int, int]:
    """(sum_sq, sum_abs, n_values) as exact ints over ALL channels — callers
    derive RMS as ``sqrt(sum_sq / n)``: two correctly-rounded IEEE ops on
    exact integers, bit-reproducible in any engine."""
    arr = np.asarray(samples, dtype=np.int64)
    return int((arr * arr).sum()), int(np.abs(arr).sum()), int(arr.size)
