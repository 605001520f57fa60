"""End-to-end record-linkage plan with checkpoint/resume and lineage metrics.

Stage graph (SURVEY.md §3.4)::

    normalized → blocks → pairs → scored → edges(+clusters) → clusters

Every stage is written to the warehouse (Iceberg or Parquet) together with a
metrics row (row count + per-partition lineage counts + the stage's sha256
checksum of the invariant column where applicable). A re-run skips stages
whose table already exists — kill the job after any stage and the next run
resumes from there (north_rule: resumable from checkpoint). ``force=True``
recomputes everything.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from levenshtein_spark.operators.blocking import exploded_blocks
from levenshtein_spark.operators.clustering import cluster_labels
from levenshtein_spark.operators.normalize import normalize
from levenshtein_spark.operators.pairs import attach_pair_payload, candidate_pairs
from levenshtein_spark.operators.scoring import edges as edges_of
from levenshtein_spark.operators.scoring import score_pairs
from levenshtein_spark.sources.tables import Warehouse


@dataclass
class LinkageConfig:
    checkpoint_dir: str
    k_content: int = 8
    k_path: int = 4
    prefix_len: int = 256
    len_band: int = 32
    hot_threshold: int = 2000
    num_salts: int = 16
    # per-block adaptive salting (S_b = ceil(block_size / target)); None
    # keeps the fixed num_salts. Same pair set either way — this knob only
    # controls how a hot block's fan-out spreads over tasks.
    adaptive_target_rows: int | None = None
    force: bool = False
    stage_times: dict = field(default_factory=dict)


def _metrics(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition lineage counters for a stage (north_rule requirement)."""
    return (
        df.withColumn("part", F.spark_partition_id())
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("stage", F.lit(stage))
    )


def _stage(wh: Warehouse, cfg: LinkageConfig, name: str, build) -> DataFrame:
    """Compute-or-resume one stage; persist data + metrics tables."""
    if not cfg.force and wh.exists(name):
        return wh.read(name)
    t0 = time.perf_counter()
    df = build()
    wh.write(df, name)
    out = wh.read(name)
    wh.write(_metrics(out, name), f"metrics_{name}")
    cfg.stage_times[name] = time.perf_counter() - t0
    return out


def run_linkage(spark: SparkSession, source: DataFrame, cfg: LinkageConfig) -> dict:
    """Run (or resume) the full pipeline; returns handles to every stage."""
    wh = Warehouse(spark, cfg.checkpoint_dir)

    normalized = _stage(wh, cfg, "normalized", lambda: normalize(source, cfg.prefix_len))
    blocks = _stage(
        wh, cfg, "blocks", lambda: exploded_blocks(normalized, len_band=cfg.len_band)
    )
    pairs = _stage(
        wh,
        cfg,
        "pairs",
        lambda: candidate_pairs(
            blocks,
            cfg.hot_threshold,
            cfg.num_salts,
            adaptive_target_rows=cfg.adaptive_target_rows,
        ),
    )
    scored = _stage(
        wh,
        cfg,
        "scored",
        lambda: score_pairs(
            attach_pair_payload(
                pairs, normalized, ["sha", "path_base", "content_prefix"]
            ),
            cfg.k_content,
            cfg.k_path,
        ),
    )
    edges = _stage(wh, cfg, "edges", lambda: edges_of(scored))
    # the closure loop's per-round lineage truncation is reliable here: each
    # round lands under the same checkpoint dir as the stage tables, so an
    # executor loss can only recompute the in-flight round
    clusters = _stage(
        wh,
        cfg,
        "clusters",
        lambda: cluster_labels(
            normalized.select("id"), edges, checkpoint_dir=f"{cfg.checkpoint_dir}/cc_rounds"
        ),
    )

    # Per-row invariant (input_hint): sha256(content) must survive the
    # pipeline unchanged — recompute from source and anti-join.
    drift = (
        normalized.select("id", "sha")
        .join(
            normalize(source, cfg.prefix_len).select("id", F.col("sha").alias("sha2")),
            "id",
        )
        .where(F.col("sha") != F.col("sha2"))
        .count()
    )
    if drift:
        raise AssertionError(f"sha256 invariant violated for {drift} rows")

    return {
        "normalized": normalized,
        "blocks": blocks,
        "pairs": pairs,
        "scored": scored,
        "edges": edges,
        "clusters": clusters,
        "warehouse": wh,
    }
