"""Token-budget sequence packing for training-data pipelines.

An LLM corpus is written out as fixed-token-budget shards (a shard feeds one
training sequence / file); the assignment must be a deterministic function of
the global document order so re-runs (and the DuckDB oracle) agree exactly.
The core primitive is a distributed prefix sum over a total order — the same
range-partition + per-partition-aggregate + offset-broadcast shape as
``operators.snm.global_rank`` (which is the count-valued special case).

Scale shape: one range-exchange shuffle, one per-partition sort, and a
partition-count-sized offset table collected to the driver and broadcast
back. Nothing driver-side grows with the row count, and no single-partition
window exists anywhere (the naive ``Window.orderBy(...)`` with no
partitionBy funnels the whole table through one task — the exact
anti-pattern this module replaces).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the inclusive running sum of ``value_col`` under the total
    order ``order_cols`` (which must be a unique tuple per row — append a
    unique id as the last column; uniqueness makes the result independent of
    where the range partitioner cuts).

    Driver-side data: one (partition, sum) row per partition.
    """
    cols = [F.col(c) for c in order_cols]
    part = df.repartitionByRange(*([num_partitions] if num_partitions else []), *cols)
    part = part.withColumn("_pid", F.spark_partition_id())
    # Persist so the offset census and the final plan see the SAME partition
    # cuts (the range partitioner samples; two separate computations could
    # legally choose different boundaries).
    part = part.persist()
    sums = sorted(
        (r["_pid"], r["s"])
        for r in part.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
    )
    offsets, acc = [], 0
    for pid, s in sums:
        offsets.append((pid, acc))
        acc += int(s or 0)
    off = df.sparkSession.createDataFrame(offsets, "_pid int, _offset long")
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        part.join(F.broadcast(off), "_pid")
        .withColumn(out_col, F.sum(value_col).over(w) + F.col("_offset"))
        .drop("_pid", "_offset")
    )


def pack_by_budget(
    df: DataFrame,
    order_cols: list[str],
    tokens_col: str,
    budget: int,
    shard_col: str = "shard_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row to a token-budget shard by its START offset in the
    globally ordered token stream: ``shard = floor((cum - tokens) / budget)``.

    Start-offset packing is the streaming-friendly convention (a document
    never moves a later document's shard backwards) and is exactly
    reproducible in ANSI SQL as ``floor((sum(t) OVER (ORDER BY ...) - t) /
    budget)``, which is what the driver oracle runs. Documents longer than
    the budget simply span shards conceptually; the assignment stays
    deterministic.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    out = global_prefix_sum(df, order_cols, tokens_col, out_col="_cum",
                            num_partitions=num_partitions)
    return out.withColumn(
        shard_col,
        F.floor((F.col("_cum") - F.col(tokens_col)) / F.lit(budget)).cast("long"),
    ).drop("_cum")
