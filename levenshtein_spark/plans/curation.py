"""End-to-end corpus-curation plan with checkpoint/resume and lineage metrics.

The production twin of the curation driver queries — the pipeline an LLM
training corpus actually runs before shard writing::

    profiled → kept → exact_canon → neardup_edges → canon → splits → shards

* **profiled** — per-doc stats (token count, quality score, top-word
  repetition fraction, content md5);
* **kept** — quality gate (min quality, max repetition);
* **exact_canon** — exact dedup: one canonical row per identical content;
* **neardup_edges** — MinHash-LSH candidates (flat-codegen band keys →
  salted slim pairs) verified with true word-bigram Jaccard;
* **canon** — near-dup clusters collapsed via the same large-star/small-star
  connected components as the linkage plan; the minimum doc_id survives;
* **splits** — deterministic hash-based train/val/test assignment;
* **shards** — token-budget packing per split over the distributed prefix
  sum (operators/packing.py).

Every stage checkpoints to the warehouse with a per-partition lineage
metrics table and resumes exactly like the linkage plan (kill after any
stage, re-run continues). The per-row invariant is content-md5 stability:
every surviving doc's fingerprint must equal a fresh recompute from source.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from levenshtein_spark.functions.hashing import hash_bucket, minhash_band_table
from levenshtein_spark.functions.text import (
    quality_score,
    token_count,
    word_bigrams,
    word_tokens,
)
from levenshtein_spark.operators.clustering import cluster_labels
from levenshtein_spark.operators.packing import pack_by_budget
from levenshtein_spark.operators.pairs import attach_pair_payload, candidate_pairs
from levenshtein_spark.plans.stages import run_stage
from levenshtein_spark.sources.tables import Warehouse


@dataclass
class CurationConfig:
    checkpoint_dir: str
    min_quality: float = 0.4
    max_top_word_frac: float = 0.5
    jaccard: float = 0.8
    num_hashes: int = 8
    bands: int = 4
    shard_budget: int = 2048
    train_below: int = 80  # hash bucket < 80 → train
    val_below: int = 90    # < 90 → val, else test
    hot_threshold: int = 2000
    num_salts: int = 16
    force: bool = False
    stage_times: dict = field(default_factory=dict)


def run_curation(spark: SparkSession, docs: DataFrame, cfg: CurationConfig) -> dict:
    """Run (or resume) the curation pipeline over a documents table
    (doc_id, text, ...); returns handles to every stage."""
    wh = Warehouse(spark, cfg.checkpoint_dir)

    def build_profiled() -> DataFrame:
        # top-word fraction needs a per-(doc, word) count — map-side
        # combining aggregations, same shape as driver_queries.text
        words = (
            docs.select("doc_id", F.explode(word_tokens(F.col("text"))).alias("w"))
            .groupBy("doc_id", "w")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id")
            .agg((F.max("c").cast("double") / F.sum("c")).alias("top_word_frac"))
        )
        return (
            docs.select(
                "doc_id",
                "text",
                F.md5("text").alias("fp"),
                token_count(F.col("text")).cast("long").alias("n_tokens"),
                quality_score(F.col("text")).alias("quality"),
            )
            .join(words, "doc_id", "left")
            .withColumn("top_word_frac", F.coalesce("top_word_frac", F.lit(0.0)))
        )

    profiled = run_stage(wh, cfg, "profiled", build_profiled)

    kept = run_stage(
        wh,
        cfg,
        "kept",
        lambda: profiled.where(
            (F.col("quality") >= cfg.min_quality)
            & (F.col("top_word_frac") <= cfg.max_top_word_frac)
        ),
    )

    # exact dedup: lowest doc_id survives per identical content
    exact_canon = run_stage(
        wh,
        cfg,
        "exact_canon",
        lambda: kept.groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(kept, ["fp", "doc_id"]),
    )

    def build_neardup_edges() -> DataFrame:
        blocks = minhash_band_table(
            exact_canon, "doc_id", word_bigrams(F.col("text")), cfg.num_hashes, cfg.bands
        ).select(F.col("band_key").alias("block_key"), "id")
        pairs = candidate_pairs(blocks, cfg.hot_threshold, cfg.num_salts).drop("n_keys")
        grams = exact_canon.select(
            F.col("doc_id").alias("id"),
            F.array_distinct(word_bigrams(F.col("text"))).alias("g"),
        )
        fat = attach_pair_payload(pairs, grams, ["g"])
        jac = F.size(F.array_intersect("g_a", "g_b")).cast("double") / F.size(
            F.array_union("g_a", "g_b")
        )
        return fat.select("id_a", "id_b", jac.alias("jaccard")).where(
            F.col("jaccard") >= cfg.jaccard
        )

    neardup_edges = run_stage(wh, cfg, "neardup_edges", build_neardup_edges)

    # collapse near-dup clusters exactly like entity clusters: the label IS
    # the minimum reachable id, so the canonical row is label == id
    canon = run_stage(
        wh,
        cfg,
        "canon",
        lambda: cluster_labels(
            exact_canon.select(F.col("doc_id").alias("id")),
            neardup_edges.select(
                F.col("id_a").alias("src"), F.col("id_b").alias("dst")
            ),
            checkpoint_dir=f"{cfg.checkpoint_dir}/cc_rounds",
        )
        .where(F.col("id") == F.col("cluster_id"))
        .select(F.col("id").alias("doc_id"))
        .join(exact_canon, "doc_id"),
    )

    splits = run_stage(
        wh,
        cfg,
        "splits",
        lambda: canon.select(
            "doc_id",
            "n_tokens",
            F.when(hash_bucket(F.col("doc_id")) < cfg.train_below, "train")
            .when(hash_bucket(F.col("doc_id")) < cfg.val_below, "val")
            .otherwise("test")
            .alias("split"),
        ),
    )

    # one grouped prefix-sum pass packs all three splits (each split is an
    # independent token stream / shard sequence)
    shards = run_stage(
        wh,
        cfg,
        "shards",
        lambda: pack_by_budget(
            splits, ["doc_id"], "n_tokens", cfg.shard_budget, group_cols=["split"]
        ).select("doc_id", "n_tokens", "split", "shard_id"),
    )

    # per-row invariant: surviving docs' content fingerprint equals a fresh
    # recompute from source (nothing mutated text along the way)
    drift = (
        canon.select("doc_id", "fp")
        .join(docs.select("doc_id", F.md5("text").alias("fp2")), "doc_id")
        .where(F.col("fp") != F.col("fp2"))
        .count()
    )
    if drift:
        raise AssertionError(f"content fingerprint changed for {drift} rows")

    return {
        "profiled": profiled,
        "kept": kept,
        "exact_canon": exact_canon,
        "neardup_edges": neardup_edges,
        "canon": canon,
        "splits": splits,
        "shards": shards,
        "warehouse": wh,
    }
