"""Binned time-window join: equi-join machinery for a range predicate.

``left.key = right.key AND right_ts IN (left_ts - window, left_ts]`` is a
non-equi predicate Spark would otherwise plan as a per-key product (or,
keyless, a broadcast nested loop). The classic fix makes it an EQUI-join:
bucket time into bins exactly ``window`` seconds wide; every right row
lands in ONE bin, and a left row's window can only overlap bins
``floor(left_ts/window)`` and that minus one. Exploding the LEFT side
into those two probe bins and equi-joining on ``(key, bin)`` yields every
qualifying pair exactly once (the right row appears under one bin; the
two probe bins are distinct) plus near-miss candidates the exact
predicate then filters — lossless, never duplicating.

Scale shape: shuffle is hash-partitioned on ``(key, bin)`` — 2|L| + |R|
rows — and candidate fan-out is bounded by per-(key, bin) occupancy, not
per-key row counts; skew is capped by the bin width you chose. Catalyst
plans a plain SortMergeJoin/shuffled hash join; no CartesianProduct, no
BroadcastNestedLoopJoin (pinned in tests/test_plans.py-style asserts in
tests/test_asof_rangejoin.py).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def time_window_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_sec: int = 3600,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Pairs (one row per qualifying left×right pair) under
    ``right_ts IN (left_ts - window_sec, left_ts]`` per key.

    Output columns: keys, then every non-key left column as
    ``{left_prefix}{c}`` and every non-key right column as
    ``{right_prefix}{c}`` (the two timestamps included).
    """
    keys = list(key_cols)
    # Bins via INTEGER division of epoch microseconds (no float near bin
    # boundaries); the exact predicate below compares at the same precision.
    win_us = window_sec * 1_000_000
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lbin = F.expr(f"unix_micros(CAST({left_ts} AS TIMESTAMP)) div {win_us}")
    l = left.select(
        *keys,
        l_us.alias("_lus"),
        F.explode(F.array(lbin - 1, lbin)).alias("_bin"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns if c not in keys],
    )
    r = right.select(
        *keys,
        r_us.alias("_rus"),
        F.expr(f"unix_micros(CAST({right_ts} AS TIMESTAMP)) div {win_us}").alias("_bin"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c not in keys],
    )
    j = l.join(r, [*keys, "_bin"]).where(
        (F.col("_rus") > F.col("_lus") - win_us) & (F.col("_rus") <= F.col("_lus"))
    )
    return j.drop("_bin", "_lus", "_rus")
