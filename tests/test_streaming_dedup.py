"""Cross-batch pins for the streaming first-seen dedup operator
(streaming/dedup.py): single-batch closed form, state carry-over, and
canonical takeover by a late-arriving smaller id. The in-stream MinHash
keying + DuckDB twin is the driver query's job (streaming_dedup)."""

from __future__ import annotations

import pytest

from levenshtein_spark.streaming.dedup import stream_first_seen


# Heavy module (multi-second Spark jobs / hypothesis sweeps): excluded
# from the fast gate `pytest -m "not slow"` (README: Testing).
pytestmark = pytest.mark.slow

_SCHEMA = "block_key string, id long"


def _drain(spark, stream, name):
    out = stream_first_seen(stream, key_col="block_key", id_col="id", state_timeout_ms=None)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), f"{name} did not drain"
    return {
        (r.block_key, r.id, r.first_id)
        for r in spark.table(name).collect()
    }


def test_first_seen_single_batch(spark, tmp_path):
    """Closed form: per key the canonical is the batch min id; every other
    id emits exactly one (id, key_min) row per key it loses."""
    src = tmp_path / "s1"
    rows = [("k1", 5), ("k1", 2), ("k1", 9), ("k2", 7), ("k2", 9), ("k3", 4)]
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(str(src / "f1"))
    stream = spark.readStream.schema(_SCHEMA).parquet(f"{src}/*")
    got = _drain(spark, stream, "sdd_t1")
    assert got == {("k1", 5, 2), ("k1", 9, 2), ("k2", 9, 7)}


def test_first_seen_state_carryover_and_takeover(spark, tmp_path):
    """Across micro-batches (maxFilesPerTrigger=1): batch 2's arrivals are
    flagged against batch 1's canonical (state carry-over), and a LATER
    smaller id takes the key over — the displaced canonical is retro-flagged
    against it exactly once."""
    src = tmp_path / "s2"
    b1 = [("k1", 10), ("k2", 5)]
    b2 = [("k1", 12), ("k1", 11), ("k2", 3)]
    spark.createDataFrame(b1, _SCHEMA).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, _SCHEMA).coalesce(1).write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    got = _drain(spark, stream, "sdd_t2")
    # k1: 10 seen first, stays canonical; 11 and 12 flagged against it.
    # k2: 5 seen first; 3 arrives later and takes over -> 5 retro-flagged.
    assert got == {("k1", 11, 10), ("k1", 12, 10), ("k2", 5, 3)}


def test_first_seen_exactly_once_per_lost_key(spark, tmp_path):
    """A flagged id never re-emits for the same key in later batches (its
    id can only appear once per key in a keyed-dedup feed, and the state
    keeps the canonical, not the flagged set — re-arrival of a LARGER id
    would re-emit, which is the at-least-once contract of a TTL'd dedup;
    within one run each (key, id) arrives once so emission is exactly-once)."""
    src = tmp_path / "s3"
    b1 = [("k1", 2), ("k1", 7)]
    b2 = [("k1", 9)]
    spark.createDataFrame(b1, _SCHEMA).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, _SCHEMA).coalesce(1).write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    got = _drain(spark, stream, "sdd_t3")
    assert got == {("k1", 7, 2), ("k1", 9, 2)}
