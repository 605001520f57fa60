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


QUERIES = {"multimodal_meta": q_multimodal_meta}

ORACLES = {
    "multimodal_meta": """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       sha256(text) AS sha,
       CAST(strlen(text) % 640 AS BIGINT) AS width,
       CAST((strlen(text) * 7) % 480 AS BIGINT) AS height
FROM documents
""",
}
