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


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_frame_sample": q_multimodal_frame_sample,
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
}
