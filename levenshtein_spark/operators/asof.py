"""As-of join: for each left row, the latest right row at-or-before it.

The time-series join Spark has no built-in for (reference scope: the
host-DBMS integration role of rljacobson/Levenshtein `doc/Usage.md` —
this engine supplies the relational operators that host would, for event
streams). Semantics: for each left row, among right rows sharing the key
with ``right_ts <= left_ts``, pick the one with the greatest
``(right_ts, *tie_cols)`` — a total order, so the result is deterministic
even under timestamp collisions (DuckDB's bare ASOF JOIN leaves equal-ts
winners unspecified; we don't).

Scale shape — ONE shuffle, NO join: both sides are union-tagged and hash
partitioned by the key; inside each key a single sort by
``(ts, side, *tie)`` (right rows sort before left rows at equal ts, so
at-or-before includes same-instant rights) makes the answer a running
``last(payload, ignorenulls)`` over the preceding rows. This is the
merge-join formulation: cost is sort + scan per key, versus the naive
left×right-per-key product a correlated subquery would pay. A window,
unlike a range self-join, also never materializes candidate pairs.

Skew note: one key's rows serialize through one task — inherent to
per-key running state. At 100 TB with a hot key (one user owning >1 task
of events), the standard fix is time-slicing the key with boundary
carry-over (two passes: per-slice last, then a prefix-propagation join on
the slice index — the ``global_prefix_sum`` machinery in
``operators/packing.py``); not wired here because the payoff only exists
when a single key exceeds an executor's sort buffer.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    tie_cols: Sequence[str] = (),
    prefix: str = "r_",
) -> DataFrame:
    """Left rows + the matched right row's ``right_ts``/payload columns
    (``prefix``-renamed, NULL when no right row is at-or-before).

    ``tie_cols`` break equal-``right_ts`` ties (greatest wins); pass the
    right side's unique id to make the match total-order deterministic.
    """
    keys = list(key_cols)
    carried = [c for c in left.columns if c not in keys and c != left_ts]
    payload = [right_ts, *tie_cols, *[c for c in right_payload if c not in tie_cols]]
    tie = F.col(tie_cols[0]) if tie_cols else F.lit(0)
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carried],
        F.struct(*[F.col(c).alias(f"{prefix}{c}") for c in payload]).alias("_p"),
        tie.alias("_tie"),
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *carried,
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    return matched.select(
        *keys,
        F.col("_ts").alias(left_ts),
        *carried,
        *[F.col(f"_m.{prefix}{c}").alias(f"{prefix}{c}") for c in payload],
    )
