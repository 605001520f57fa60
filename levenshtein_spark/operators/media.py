"""Multimodal (binary) column operators — Arrow-batched, codec-gated.

Treats image/audio/video as opaque ``binary`` columns with typed metadata,
per the training-data-pipeline pattern: the Spark plumbing (schema,
partitioning, mapInPandas batch shape) is real; the codec call is isolated
behind a feature flag — ``decode_image`` uses PIL when importable (a real
cluster with pillow installed gets real decoding with zero code changes) and
falls back to the deterministic ``decode_stub`` otherwise (this sandbox
ships no media libraries). The driver-checked query pins ``codec="stub"``
explicitly so its DuckDB oracle stays exact either way.
"""

from __future__ import annotations

import hashlib
import io
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "doc_id long, n_bytes long, sha string, width long, height long"

try:  # feature flag: real codec when the library exists
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:  # pragma: no cover - exercised via monkeypatch in tests
    _PILImage = None
    HAS_PIL = False


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode (the no-codec fallback).

    Derives plausible dimensions from the byte length so tests and oracles
    stay deterministic without codec dependencies.
    """
    n = len(payload)
    return {"width": n % 640, "height": (n * 7) % 480}


def decode_image(payload: bytes) -> dict:
    """Real decode via PIL when available; raises if the flag is off.

    Kept separate from the stub (not silently substituted) so callers choose
    the semantics they can verify.
    """
    if not HAS_PIL:
        raise NotImplementedError(
            "no image codec in this environment (pip install pillow); "
            "use codec='stub' for the deterministic fallback"
        )
    img = _PILImage.open(io.BytesIO(payload))
    return {"width": int(img.width), "height": int(img.height)}


def decode_ppm_meta(payload: bytes) -> dict:
    """REAL decode of a binary PPM (P6) payload — the pure-NumPy codec in
    ``operators/ppm.py``; no media library needed. Raises ``ValueError`` on
    non-PPM bytes (callers choose fallback policy via the codec flag)."""
    from levenshtein_spark.operators.ppm import decode_ppm

    pixels = decode_ppm(payload)
    return {"width": int(pixels.shape[1]), "height": int(pixels.shape[0])}


def _auto_decode(payload: bytes) -> dict:
    if payload[:2] == b"P6":
        return decode_ppm_meta(payload)
    return decode_stub(payload)


def _pick_decoder(codec: str):
    if codec == "stub":
        return decode_stub
    if codec == "ppm":
        return decode_ppm_meta
    if codec == "pil":
        if not HAS_PIL:
            raise NotImplementedError("codec='pil' requested but PIL is not importable")
        return decode_image
    if codec == "auto":
        # richest codec first; PPM payloads (P6 magic) decode for real even
        # without PIL; everything else falls back to the deterministic stub
        return decode_image if HAS_PIL else _auto_decode
    raise ValueError(
        f"unknown codec {codec!r} (expected 'auto', 'pil', 'ppm', or 'stub')"
    )


def extract_media_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "stub",
) -> DataFrame:
    """binary payload column → (id, n_bytes, sha256, width, height).

    One Arrow batch per ``mapInPandas`` call; hashing and the decode run
    vectorized over the batch, never per-row Python UDF calls. ``codec``:
    ``"stub"`` (deterministic fake — the oracle-checkable default here),
    ``"pil"`` (force the real codec, error if absent), ``"auto"`` (PIL when
    importable, stub otherwise).
    """
    _pick_decoder(codec)  # fail fast on the driver, not inside executors

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _pick_decoder(codec)  # re-resolve in the executor process
        for pdf in batches:
            payloads = pdf[payload_col]
            metas = [decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.str.len().astype("int64"),
                    "sha": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                }
            )

    return df.mapInPandas(run, META_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 256,
    every: int = 4,
) -> DataFrame:
    """Frame-sample a binary payload: treat it as consecutive
    ``frame_bytes``-sized frames and keep every ``every``-th one →
    (id, frame_idx, frame_len, frame_sha).

    Deliberately NOT a Python UDF: byte slicing and hashing are
    ``substring``/``sha2`` on the binary column — whole-stage codegen, one
    explode of the sampled index range, no Arrow round-trip. This is the
    video-frame-sampling *plumbing* shape: a real decoder swaps the
    byte-slice for a codec call inside mapInPandas (see ``extract_media_meta``
    for that pattern), but sampling, manifesting and hashing frames stays
    JVM-side either way.
    """
    import pyspark.sql.functions as F

    n_frames = F.ceil(F.length(F.col(payload_col)) / F.lit(frame_bytes))
    with_idx = df.select(
        F.col(id_col),
        F.col(payload_col),
        F.explode(
            F.when(
                n_frames > 0, F.sequence(F.lit(0), (n_frames - 1).cast("int"), F.lit(every))
            ).otherwise(F.expr("array()"))
        ).alias("frame_idx"),
    )
    frame = F.substring(
        F.col(payload_col), F.col("frame_idx") * frame_bytes + 1, frame_bytes
    )
    return with_idx.select(
        F.col(id_col),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.length(frame).cast("long").alias("frame_len"),
        F.sha2(frame, 256).alias("frame_sha"),
    )


RESIZED_SCHEMA = "doc_id long, width long, height long, payload binary"


def resize_stub(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic stand-in for image resize: binary → binary mapInPandas
    with the real plumbing shape (batch in, batch out, binary columns both
    ways). The stub emits ``width*height`` pseudo-pixel bytes derived by
    repeating the payload's sha256 digest — stable across runs and
    partitionings; a PIL-backed implementation replaces only the body
    (decode → ``img.resize((w, h))`` → re-encode), signature unchanged.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height
        for pdf in batches:
            out_payloads = []
            for p in pdf[payload_col]:
                digest = hashlib.sha256(p).digest()
                out_payloads.append((digest * (n_out // len(digest) + 1))[:n_out])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": out_payloads,
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


FEATURES_SCHEMA = (
    "doc_id long, width long, height long, "
    "mean_r double, mean_g double, mean_b double"
)


def extract_image_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL image feature extraction: decode PPM payloads (operators/ppm.py,
    no codec libraries) → dimensions + per-channel means.

    Means are computed as exact int64 channel sums followed by ONE double
    divide, so each value is a single correctly-rounded IEEE op on integers
    any engine can reproduce bit-for-bit from the raster definition — the
    same parity discipline as the idf/B-cubed quantization elsewhere."""
    import numpy as np

    from levenshtein_spark.operators.ppm import channel_sums, decode_ppm

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, mr, mg, mb = [], [], [], [], []
            for p in pdf[payload_col]:
                px = decode_ppm(p)
                sr, sg, sb, n = channel_sums(px)
                w.append(px.shape[1])
                h.append(px.shape[0])
                mr.append(sr / n)
                mg.append(sg / n)
                mb.append(sb / n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": np.asarray(w, np.int64),
                    "height": np.asarray(h, np.int64),
                    "mean_r": np.asarray(mr, np.float64),
                    "mean_g": np.asarray(mg, np.float64),
                    "mean_b": np.asarray(mb, np.float64),
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def resize_ppm(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image resize: decode PPM → nearest-neighbor resample →
    re-encode PPM (same mapInPandas shape as ``resize_stub``, which remains
    the fallback for payloads with no decodable format)."""
    from levenshtein_spark.operators.ppm import decode_ppm, encode_ppm, resize_nearest

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                encode_ppm(resize_nearest(decode_ppm(p), width, height))
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, sample_rate long, n_channels long, n_samples long, "
    "duration_s double, rms double, mean_abs double"
)


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode + feature extraction: parse RIFF/WAVE payloads
    (operators/wav.py, no codec libraries) → stream parameters + energy
    stats. duration/rms/mean_abs are single correctly-rounded IEEE ops
    (divide, sqrt) over exact int64 sums — the cross-engine bit-parity
    discipline shared with extract_image_features."""
    import math

    import numpy as np

    from levenshtein_spark.operators.wav import audio_stats, decode_wav

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rate, ch, ns, dur, rms, mabs = [], [], [], [], [], []
            for p in pdf[payload_col]:
                samples, sr = decode_wav(p)
                ss, sa, n = audio_stats(samples)
                rate.append(sr)
                ch.append(samples.shape[1])
                ns.append(samples.shape[0])
                dur.append(samples.shape[0] / sr)
                rms.append(math.sqrt(ss / n))
                mabs.append(sa / n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "sample_rate": np.asarray(rate, np.int64),
                    "n_channels": np.asarray(ch, np.int64),
                    "n_samples": np.asarray(ns, np.int64),
                    "duration_s": np.asarray(dur, np.float64),
                    "rms": np.asarray(rms, np.float64),
                    "mean_abs": np.asarray(mabs, np.float64),
                }
            )

    return df.mapInPandas(run, AUDIO_SCHEMA)
