"""Multimodal-column plumbing: binary payloads + typed metadata via
Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (see ``operators/media.py``): the Spark-side plumbing —
binary column handling, mapInPandas batch shape, output schema, metadata
extraction — is real and driver-verified. The oracle reproduces the byte
length, sha256, and the stub's modular "dimensions" in SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from levenshtein_spark.driver_queries import tbl
from levenshtein_spark.operators.media import extract_media_meta


def q_multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    """documents.text encoded to a binary payload column → mapInPandas
    metadata extraction (n_bytes, sha256, stub width/height)."""
    d = tbl(spark, sf, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return extract_media_meta(payloads, id_col="doc_id", payload_col="payload")


_FRAME_BYTES = 256
_EVERY = 4


def q_multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Binary payloads as frame sequences: every 4th 256-byte frame, with
    per-frame length + sha256 — pure JVM substring/sha2 over the binary
    column (operators/media.sample_frames), no Python in the plan."""
    from levenshtein_spark.operators.media import sample_frames

    d = tbl(spark, sf, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return sample_frames(
        payloads, id_col="doc_id", payload_col="payload",
        frame_bytes=_FRAME_BYTES, every=_EVERY,
    )


# Real-decode track: payloads are REAL binary PPM (P6) images, synthesized
# deterministically from the documents table (dims from the text's byte
# length, raster from a doc_id-seeded formula), then decoded by the pure-
# NumPy codec in operators/ppm.py — no stub anywhere on this path. The
# raster formula is closed-form, so the DuckDB twin re-derives dimensions
# and exact per-channel sums from (doc_id, strlen) alone.
_PPM_W = (4, 13)  # w = 4 + L % 13
_PPM_H = (3, 7)  # h = 3 + (L * 5) % 7


def _ppm_payloads(d: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, payload) where payload is a valid P6 image:
    pixel byte i = (doc_id*31 + i*7) % 256 over a w*h*3 raster."""
    import numpy as np
    import pandas as pd

    from levenshtein_spark.operators.ppm import encode_ppm

    def run(batches):
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                L = len(str(text).encode("utf-8"))
                w = _PPM_W[0] + L % _PPM_W[1]
                h = _PPM_H[0] + (L * 5) % _PPM_H[1]
                i = np.arange(w * h * 3, dtype=np.int64)
                px = ((int(doc_id) * 31 + i * 7) % 256).astype(np.uint8)
                payloads.append(encode_ppm(px.reshape(h, w, 3)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return d.mapInPandas(run, "doc_id long, payload binary")


def q_multimodal_decode_ppm(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode + feature extraction: synthesize P6 payloads, then
    ``operators/media.extract_image_features`` parses the actual image bytes
    (header grammar, raster reshape) and aggregates exact int64 channel sums
    → one double divide per mean, bit-reproducible in the SQL twin."""
    from levenshtein_spark.operators.media import extract_image_features

    d = tbl(spark, sf, "documents").select("doc_id", "text")
    return extract_image_features(_ppm_payloads(d))


# Audio leg: payloads are REAL RIFF/WAVE PCM files (operators/wav.py).
# Stream parameters vary per doc; the raster formula is closed-form so the
# twin re-derives exact integer energy sums from (doc_id, strlen) alone.
_WAV_NS = (200, 57)  # n_samples = 200 + L % 57
_WAV_RATES = (8000, 4000, 3)  # rate = 8000 + 4000 * (doc_id % 3)


def _wav_payloads(d: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, payload): 16-bit PCM WAV, 1 or 2 channels,
    sample value at flat index i = ((doc_id*13 + i*11) % 65536) - 32768."""
    import numpy as np
    import pandas as pd

    from levenshtein_spark.operators.wav import encode_wav

    def run(batches):
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                L = len(str(text).encode("utf-8"))
                n = _WAV_NS[0] + L % _WAV_NS[1]
                ch = 1 + doc_id % 2
                rate = _WAV_RATES[0] + _WAV_RATES[1] * (doc_id % _WAV_RATES[2])
                i = np.arange(n * ch, dtype=np.int64)
                v = ((doc_id * 13 + i * 11) % 65536) - 32768
                payloads.append(encode_wav(v.astype(np.int16).reshape(n, ch), rate))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return d.mapInPandas(run, "doc_id long, payload binary")


def q_multimodal_decode_wav(spark: SparkSession, sf: str) -> DataFrame:
    """REAL audio decode: parse the RIFF chunk list of actual WAV bytes →
    stream parameters + energy stats (rms = sqrt(sum_sq/n), mean_abs =
    sum_abs/n — correctly-rounded IEEE ops over exact int64 sums, so the
    SQL twin reproduces the doubles bit-for-bit)."""
    from levenshtein_spark.operators.media import extract_audio_features

    d = tbl(spark, sf, "documents").select("doc_id", "text")
    return extract_audio_features(_wav_payloads(d))


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_decode_ppm": q_multimodal_decode_ppm,
    "multimodal_decode_wav": q_multimodal_decode_wav,
}

ORACLES = {
    "multimodal_meta": """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       sha256(text) AS sha,
       CAST(strlen(text) % 640 AS BIGINT) AS width,
       CAST((strlen(text) * 7) % 480 AS BIGINT) AS height
FROM documents
""",
    "multimodal_frame_sample": f"""
SELECT d.doc_id,
       CAST(t.i AS BIGINT) AS frame_idx,
       CAST(strlen(substr(d.text, CAST(t.i AS BIGINT) * {_FRAME_BYTES} + 1, {_FRAME_BYTES})) AS BIGINT)
         AS frame_len,
       sha256(substr(d.text, CAST(t.i AS BIGINT) * {_FRAME_BYTES} + 1, {_FRAME_BYTES})) AS frame_sha
FROM documents d,
     UNNEST(range(0, CAST(ceil(strlen(d.text) / {_FRAME_BYTES}.0) AS BIGINT), {_EVERY})) AS t(i)
""",
    # dimensions and raster are closed-form in (doc_id, strlen), so the twin
    # re-derives exact integer channel sums and the same single-divide means
    "multimodal_decode_ppm": f"""
WITH dims AS (
  SELECT doc_id,
         {_PPM_W[0]} + (strlen(text) % {_PPM_W[1]}) AS w,
         {_PPM_H[0]} + ((strlen(text) * 5) % {_PPM_H[1]}) AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h, t.i AS i,
         (d.doc_id * 31 + t.i * 7) % 256 AS v
  FROM dims d, UNNEST(range(0, CAST(d.w * d.h * 3 AS BIGINT))) AS t(i)
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(sum(CASE WHEN i % 3 = 0 THEN v END) AS DOUBLE) / (w * h) AS mean_r,
       CAST(sum(CASE WHEN i % 3 = 1 THEN v END) AS DOUBLE) / (w * h) AS mean_g,
       CAST(sum(CASE WHEN i % 3 = 2 THEN v END) AS DOUBLE) / (w * h) AS mean_b
FROM px
GROUP BY doc_id, w, h
""",
    # sums are exact integers well under 2^53, so CAST-to-double is exact and
    # each divide/sqrt is one correctly-rounded op — bit-equal to the Python
    # int/int true division + math.sqrt in extract_audio_features
    "multimodal_decode_wav": f"""
WITH dims AS (
  SELECT doc_id,
         {_WAV_NS[0]} + (strlen(text) % {_WAV_NS[1]}) AS n,
         1 + (doc_id % 2) AS ch,
         {_WAV_RATES[0]} + {_WAV_RATES[1]} * (doc_id % {_WAV_RATES[2]}) AS rate
  FROM documents
),
sv AS (
  SELECT d.doc_id, d.n, d.ch, d.rate,
         ((d.doc_id * 13 + t.i * 11) % 65536) - 32768 AS v
  FROM dims d, UNNEST(range(0, CAST(d.n * d.ch AS BIGINT))) AS t(i)
)
SELECT doc_id,
       CAST(rate AS BIGINT) AS sample_rate,
       CAST(ch AS BIGINT) AS n_channels,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n AS DOUBLE) / rate AS duration_s,
       sqrt(CAST(sum(v * v) AS DOUBLE) / (n * ch)) AS rms,
       CAST(sum(abs(v)) AS DOUBLE) / (n * ch) AS mean_abs
FROM sv
GROUP BY doc_id, n, ch, rate
""",
}
