"""Pure-NumPy WAV (RIFF PCM) codec: round-trip, chunk-walk grammar,
malformed-input rejection, and the Spark audio-feature operator — the audio
leg of the real multimodal decode path (driver query
`multimodal_decode_wav`)."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from levenshtein_spark.operators.wav import audio_stats, decode_wav, encode_wav


def _rand_samples(rng, n, ch):
    return rng.integers(-32768, 32768, (n, ch), dtype=np.int64).astype(np.int16)


def test_roundtrip():
    rng = np.random.default_rng(8)
    for n, ch, rate in [(1, 1, 8000), (100, 2, 44100), (257, 3, 16000)]:
        s = _rand_samples(rng, n, ch)
        out, sr = decode_wav(encode_wav(s, rate))
        assert sr == rate
        assert out.shape == (n, ch)
        assert (out == s).all()


def test_extra_chunks_skipped():
    # real files carry LIST/INFO chunks; the walker must skip them,
    # including the odd-size word-alignment pad byte
    rng = np.random.default_rng(9)
    s = _rand_samples(rng, 10, 1)
    canonical = encode_wav(s, 8000)
    fmt_chunk = canonical[12:36]  # 'fmt ' + size + 16 bytes
    data_chunk = canonical[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    body = b"WAVE" + fmt_chunk + extra + data_chunk
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out, sr = decode_wav(payload)
    assert sr == 8000 and (out == s).all()


def test_8bit_pcm():
    raw = bytes(range(12))
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 2, 2, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    out, sr = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert out.shape == (6, 2)
    assert out.dtype == np.uint8
    assert out.tobytes() == raw


def _wav_with(fmt_fields, data=b"\x00\x00"):
    fmt = struct.pack("<HHIIHH", *fmt_fields)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFX" + bytes(20),  # wrong magic
        b"RIFF" + struct.pack("<I", 4) + b"AIFF",  # not WAVE
        _wav_with((3, 1, 8000, 32000, 4, 32)),  # float PCM unsupported
        _wav_with((1, 1, 8000, 24000, 3, 24)),  # 24-bit unsupported
        _wav_with((1, 2, 8000, 32000, 4, 16), data=b"\x00\x00"),  # partial frame
        _wav_with((1, 1, 8000, 16000, 3, 16)),  # inconsistent block_align
        # data chunk but no fmt chunk before it
        b"RIFF" + struct.pack("<I", 14) + b"WAVE" + b"data" + struct.pack("<I", 2) + b"\x00\x00",
    ],
)
def test_malformed_rejected(payload):
    with pytest.raises(ValueError):
        decode_wav(payload)


def test_audio_stats_exact():
    rng = np.random.default_rng(10)
    s = _rand_samples(rng, 333, 2)
    ss, sa, n = audio_stats(s)
    a = s.astype(np.int64)
    assert n == 666
    assert ss == int((a * a).sum())
    assert sa == int(np.abs(a).sum())


def test_spark_audio_features(spark):
    import pandas as pd

    from levenshtein_spark.operators.media import extract_audio_features

    rng = np.random.default_rng(12)
    clips = {i: (_rand_samples(rng, 50 + i, 1 + i % 2), 8000 * (1 + i % 2)) for i in range(4)}
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(clips),
                "payload": [encode_wav(s, r) for s, r in clips.values()],
            }
        )
    )
    got = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    for i, (s, rate) in clips.items():
        ss, sa, n = audio_stats(s)
        r = got[i]
        assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (
            rate, s.shape[1], s.shape[0],
        )
        assert r["duration_s"] == s.shape[0] / rate
        assert r["rms"] == math.sqrt(ss / n)
        assert r["mean_abs"] == sa / n
