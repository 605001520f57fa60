"""Meta-blocking — pruning the blocking graph before pairwise scoring.

At web scale the candidate set out of redundancy-positive blocking (every
record in many blocks — exactly what ``operators.blocking`` emits) is the
cost driver: |pairs| is a multiple of |records|, and every pruned pair is a
kernel invocation saved. Meta-blocking (Papadakis et al., "Meta-Blocking:
Taking Entity Resolution to the Next Level", IEEE TKDE 26(8), 2014) treats
the candidate set as a *blocking graph* — nodes = records, edges = candidate
pairs, weight = blocking-derived evidence — and keeps only edges whose
weight says "these two co-occur more than chance".

Weight scheme: **CBS** (common-blocks scheme) = number of distinct block
keys the pair shares. This is exactly the ``n_keys`` column
``operators.pairs.candidate_pairs`` already emits, so the graph costs
nothing beyond the pair generation the pipeline runs anyway.

Pruning rules, each expressed in EXACT INTEGER arithmetic (a float mean is
``sum/count``; comparing ``w >= sum/count`` is equivalent to
``w * count >= sum`` over int64, which is bit-identical across engines and
immune to float-summation-order differences):

* **WEP** (weight-edge pruning): keep edges with weight >= the global mean
  weight. One scalar aggregate, broadcast back.
* **WNP** (weighted-node pruning): per node, keep edges with weight >= that
  node's mean incident weight; an edge survives if EITHER endpoint retains
  it (the redundancy-positive OR variant — higher recall). Per-node sums
  are one map-side-combining groupBy of the symmetrized slim edge stream;
  the verdict is two slim joins. No window, no sort, no driver collect.

Scale shape: everything is (id, id, int) tuples — the same slim-pair
discipline as ``operators.pairs`` (see its module docstring); shuffles are
keyed on ids, so AQE handles residual skew and the pair payload never
widens. Reference tie-in: the reference prunes per-PAIR with length/count
bounds (src/prealgorithm.h:77-86); meta-blocking is the set-level analogue
that prunes with *cross-pair* evidence no per-pair bound can see.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _symmetrized(weighted: DataFrame) -> DataFrame:
    """(id_a, id_b, w) -> directed (id, w) stream, one row per endpoint."""
    return weighted.select(F.col("id_a").alias("id"), "n_keys").unionByName(
        weighted.select(F.col("id_b").alias("id"), "n_keys")
    )


def node_weight_stats(weighted: DataFrame) -> DataFrame:
    """Per-node incident-weight sufficient statistics: (id, w_sum, degree).

    Integer sums only — the mean is never materialized as a float; pruning
    comparisons cross-multiply instead.
    """
    return _symmetrized(weighted).groupBy("id").agg(
        F.sum("n_keys").alias("w_sum"), F.count(F.lit(1)).alias("degree")
    )


def weighted_node_prune(weighted: DataFrame, mode: str = "or") -> DataFrame:
    """WNP over CBS weights: keep (id_a, id_b, n_keys) where the weight
    clears the local mean of at least one endpoint (``mode="or"``) or of
    both (``mode="and"``, the precision-leaning variant).

    ``weighted`` is ``candidate_pairs`` output: (id_a, id_b, n_keys).
    """
    stats = node_weight_stats(weighted)
    sa = stats.select(
        F.col("id").alias("id_a"),
        F.col("w_sum").alias("w_sum_a"),
        F.col("degree").alias("deg_a"),
    )
    sb = stats.select(
        F.col("id").alias("id_b"),
        F.col("w_sum").alias("w_sum_b"),
        F.col("degree").alias("deg_b"),
    )
    fat = weighted.join(sa, "id_a").join(sb, "id_b")
    keep_a = F.col("n_keys") * F.col("deg_a") >= F.col("w_sum_a")
    keep_b = F.col("n_keys") * F.col("deg_b") >= F.col("w_sum_b")
    keep = (keep_a | keep_b) if mode == "or" else (keep_a & keep_b)
    return fat.where(keep).select("id_a", "id_b", "n_keys")


def weight_edge_prune(weighted: DataFrame) -> DataFrame:
    """WEP over CBS weights: keep edges with weight >= the global mean,
    via the same cross-multiplication trick (w * n_edges >= total_weight).

    The 1-row global aggregate joins back by broadcast-able cross join —
    Catalyst plans `BroadcastNestedLoopJoin` with a single broadcast row,
    i.e. a map-side filter.
    """
    totals = weighted.agg(
        F.sum("n_keys").alias("w_total"), F.count(F.lit(1)).alias("n_edges")
    )
    return (
        weighted.crossJoin(F.broadcast(totals))
        .where(F.col("n_keys") * F.col("n_edges") >= F.col("w_total"))
        .select("id_a", "id_b", "n_keys")
    )


def purge_stats(blocks: DataFrame, max_block_size: int) -> DataFrame:
    """Block purging scorecard (the other standard block-cleaning move:
    drop oversized blocks entirely — they are almost all noise and almost
    all of the comparison cost).

    Input: exploded (block_key, id). Output one row per block-key family
    (the prefix before the first '|': len0 / len1 / mh / ...) with the
    comparison counts a purge at ``max_block_size`` would keep vs drop —
    the census an operator uses to pick the threshold before committing to
    a pair join. Comparisons per block of size s = s*(s-1)/2, exact int64.
    """
    sizes = (
        blocks.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("sz"))
        .withColumn("family", F.split("block_key", "\\|").getItem(0))
        .withColumn("cmps", F.expr("sz * (sz - 1) DIV 2"))
    )
    purged = F.col("sz") > max_block_size
    return sizes.groupBy("family").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("sz").alias("max_block_size"),
        F.sum("cmps").alias("comparisons_total"),
        F.sum(F.when(purged, 1).otherwise(0)).alias("n_blocks_purged"),
        F.sum(F.when(purged, F.lit(0)).otherwise(F.col("cmps"))).alias(
            "comparisons_kept"
        ),
    )
