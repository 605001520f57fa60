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
from levenshtein_spark.operators.pairs import (
    attach_pair_payload,
    candidate_pairs,
    candidate_pairs_lr,
)
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


def run_incremental_linkage(
    spark: SparkSession, delta_source: DataFrame, cfg: LinkageConfig
) -> dict:
    """Link a delta batch of NEW records against an already-run pipeline
    warehouse without re-pairing the base against itself.

    Reads the base ``normalized`` / ``blocks`` / ``edges`` stage tables from
    ``cfg.checkpoint_dir`` (run :func:`run_linkage` there first). Blocking
    keys are per-record, so the full candidate set partitions exactly into
    base×base ∪ delta×base ∪ delta×delta — base×base edges are reused from
    the checkpoint, delta×base candidates come from the bipartite salted
    join (``candidate_pairs_lr``), and only the delta blocks self-join.
    Compute scales with |delta|·fanout, not |corpus|²; the resulting labels
    are identical to a full-batch re-run (pinned in
    tests/test_pipeline_e2e.py::test_incremental_matches_full_batch).

    Delta ids must be disjoint from base ids (new records only). Every
    delta stage checkpoints as ``delta_*`` with the same resume + lineage
    metrics semantics as the batch plan; the refreshed full-corpus labels
    land in ``clusters_incr``.
    """
    wh = Warehouse(spark, cfg.checkpoint_dir)
    for t in ("normalized", "blocks", "edges"):
        if not wh.exists(t):
            raise ValueError(
                f"base stage '{t}' missing from {cfg.checkpoint_dir}; run run_linkage first"
            )
    base_norm = wh.read("normalized")
    base_blocks = wh.read("blocks")
    base_edges = wh.read("edges").select("src", "dst")

    delta_norm = _stage(
        wh, cfg, "delta_normalized", lambda: normalize(delta_source, cfg.prefix_len)
    )
    delta_blocks = _stage(
        wh, cfg, "delta_blocks", lambda: exploded_blocks(delta_norm, len_band=cfg.len_band)
    )

    def build_pairs() -> DataFrame:
        cross = candidate_pairs_lr(
            delta_blocks, base_blocks, cfg.hot_threshold, cfg.num_salts
        ).select(
            F.least("id_l", "id_r").alias("id_a"),
            F.greatest("id_l", "id_r").alias("id_b"),
        )
        within = candidate_pairs(
            delta_blocks,
            cfg.hot_threshold,
            cfg.num_salts,
            adaptive_target_rows=cfg.adaptive_target_rows,
        ).select("id_a", "id_b")
        return cross.unionByName(within)

    delta_pairs = _stage(wh, cfg, "delta_pairs", build_pairs)
    all_norm = base_norm.unionByName(delta_norm)
    delta_scored = _stage(
        wh,
        cfg,
        "delta_scored",
        lambda: score_pairs(
            attach_pair_payload(
                delta_pairs, all_norm, ["sha", "path_base", "content_prefix"]
            ),
            cfg.k_content,
            cfg.k_path,
        ),
    )
    delta_edges = _stage(wh, cfg, "delta_edges", lambda: edges_of(delta_scored))
    clusters = _stage(
        wh,
        cfg,
        "clusters_incr",
        lambda: cluster_labels(
            all_norm.select("id"),
            base_edges.unionByName(delta_edges.select("src", "dst")),
            checkpoint_dir=f"{cfg.checkpoint_dir}/cc_rounds_incr",
        ),
    )

    # same per-row invariant as the batch plan, over the delta only
    drift = (
        delta_norm.select("id", "sha")
        .join(
            normalize(delta_source, cfg.prefix_len).select(
                "id", F.col("sha").alias("sha2")
            ),
            "id",
        )
        .where(F.col("sha") != F.col("sha2"))
        .count()
    )
    if drift:
        raise AssertionError(f"sha256 invariant violated for {drift} delta rows")

    return {
        "delta_normalized": delta_norm,
        "delta_blocks": delta_blocks,
        "delta_pairs": delta_pairs,
        "delta_scored": delta_scored,
        "delta_edges": delta_edges,
        "clusters": clusters,
        "warehouse": wh,
    }
