"""Shared checkpoint/resume stage machinery for pipeline plans.

A *stage* is a named DataFrame written to the warehouse together with a
per-partition lineage-metrics table; a re-run skips stages whose table
already exists (kill the job after any stage and the next run resumes
there). Used by the linkage plan and the curation plan.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from levenshtein_spark.sources.tables import Warehouse


def stage_metrics(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition lineage counters for a stage (north_rule requirement)."""
    return (
        df.withColumn("part", F.spark_partition_id())
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("stage", F.lit(stage))
    )


def run_stage(wh: Warehouse, cfg, name: str, build) -> DataFrame:
    """Compute-or-resume one stage; persist data + metrics tables.

    ``cfg`` needs only ``force: bool`` and ``stage_times: dict`` — any plan
    config dataclass qualifies.
    """
    if not cfg.force and wh.exists(name):
        return wh.read(name)
    t0 = time.perf_counter()
    df = build()
    wh.write(df, name)
    out = wh.read(name)
    wh.write(stage_metrics(out, name), f"metrics_{name}")
    cfg.stage_times[name] = time.perf_counter() - t0
    return out
