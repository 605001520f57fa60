"""Streaming ingest — the corpus front door with exactly-once semantics.

A continuously-landing document corpus (crawler output, upload bucket) is
ingested by a long-running Structured Streaming job: file source →
curation columns (content fingerprint, token count, quality score) →
parquet sink. Exactly-once is the checkpoint's job, not the code's: the
file source records processed files in ``checkpointLocation``, so a
restart — crash, deploy, or the next ``availableNow`` run of a scheduled
batch — re-reads NOTHING already committed, and newly landed files are
picked up incrementally. This is the streaming twin of the curation plan's
``profiled`` stage (plans/curation.py); downstream batch stages read the
sink as their source.

Pinned in tests/test_streaming.py: run → rows; re-run with no new files →
zero new rows; land a new file → exactly its rows appended.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from levenshtein_spark.functions.text import quality_score, token_count


def ingest_columns(df: DataFrame) -> DataFrame:
    """The per-document projection the ingest stream lands: identity,
    content fingerprint (the per-row invariant), token count and quality
    score (so the batch quality gate never re-reads raw text it doesn't
    need). Pure codegen column expressions — works identically on a batch
    or streaming DataFrame."""
    return df.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.md5("text").alias("fp"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
    )


def run_ingest(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    timeout_sec: int = 300,
) -> int:
    """One ``availableNow`` ingest pass: process every not-yet-committed
    file under ``src_dir`` into the parquet sink at ``dest_dir``; returns 0.

    Scheduled-batch mode of the same long-running query — production would
    drop ``availableNow`` for a continuous trigger; the checkpoint contract
    is identical.
    """
    stream = spark.readStream.schema(schema).format("parquet").load(src_dir)
    q = (
        ingest_columns(stream)
        .writeStream.format("parquet")
        .option("path", dest_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise RuntimeError(f"ingest did not drain within {timeout_sec}s")
    return 0
