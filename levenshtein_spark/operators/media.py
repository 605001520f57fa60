"""Multimodal (binary) column operators — Arrow-batched, decode stubbed.

Treats image/audio/video as opaque ``binary`` columns with typed metadata,
per the training-data-pipeline pattern: the Spark plumbing (schema,
partitioning, mapInPandas batch shape) is real; the codec call is isolated
behind ``decode_stub`` because no media libraries ship in this environment.
Swap ``decode_stub`` for a real decoder (PIL/ffmpeg) on a cluster with the
libs installed — nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "doc_id long, n_bytes long, sha string, width long, height long"


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode (REPLACE with a real codec in production).

    A real implementation would do ``PIL.Image.open(io.BytesIO(payload))``;
    here we derive plausible dimensions from the byte length so tests and
    oracles stay deterministic without codec dependencies.
    """
    n = len(payload)
    return {"width": n % 640, "height": (n * 7) % 480}


def extract_media_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """binary payload column → (id, n_bytes, sha256, width, height).

    One Arrow batch per ``mapInPandas`` call; hashing and the (stubbed)
    decode run vectorized over the batch, never per-row Python UDF calls.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            metas = [decode_stub(p) for p in payloads]
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
