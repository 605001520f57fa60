"""Stage 2 — candidate pair generation with explicit skew handling.

A blocked self-join is a shuffle on ``block_key``; one hot key (a hot repo, a
common length band) turns into a straggler task with O(n²) pair fan-out. We
split blocks by size:

* **normal blocks** — plain equi self-join on ``block_key`` with
  ``id_a < id_b``;
* **hot blocks** (size > ``hot_threshold``) — a *triangle salted join*: each
  row gets a deterministic salt ``s ∈ [0,S)``; the left side is replicated to
  salts ``t ∈ [s, S)`` and joined on ``(block_key, t == salt_right)``. Every
  unordered pair is produced exactly once (for ``s_a < s_b`` only the
  ``a``-as-left replica meets ``b``; for ``s_a == s_b`` the ``id_a < id_b``
  filter dedups), while the work for a block of n rows spreads over
  S·(S+1)/2 independent partitions instead of one.

This is lossless — unlike sub-block salting there is no recall hit — and is
the explicit skew handling the north_rule requires on top of AQE's
skew-join splitting (which cannot help the pair *fan-out*, only scan skew).

Pairs produced under several block keys are deduplicated by (id_a, id_b).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_HOT_THRESHOLD = 2000
DEFAULT_SALTS = 16

_SIDE_COLS = ["id", "sha", "path_base", "content_prefix", "content_len"]


def _rename(df: DataFrame, suffix: str) -> DataFrame:
    for c in _SIDE_COLS:
        df = df.withColumnRenamed(c, f"{c}_{suffix}")
    return df


def candidate_pairs(
    blocks: DataFrame,
    hot_threshold: int = DEFAULT_HOT_THRESHOLD,
    num_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """exploded blocks → distinct candidate pairs (id_a < id_b).

    Output columns: id_a, id_b, sha_a, sha_b, path_base_a/b,
    content_prefix_a/b, n_keys (how many block keys generated the pair).
    """
    sizes = blocks.groupBy("block_key").count()
    # The set of hot keys is tiny (they are, by definition, the outliers):
    # broadcast it back onto the rows.
    hot_keys = sizes.where(F.col("count") > hot_threshold).select("block_key")
    tagged = blocks.join(F.broadcast(hot_keys.withColumn("is_hot", F.lit(True))), "block_key", "left")

    normal = tagged.where(F.col("is_hot").isNull()).drop("is_hot")
    hot = tagged.where(F.col("is_hot")).drop("is_hot")

    pn = _join_block(normal)

    # Triangle salted join for hot blocks.
    hot_s = hot.withColumn("salt", F.pmod(F.xxhash64("id"), F.lit(num_salts)).cast("int"))
    left = hot_s.withColumn(
        "salt_t", F.explode(F.sequence(F.col("salt"), F.lit(num_salts - 1)))
    ).drop("salt")
    right = hot_s.withColumnRenamed("salt", "salt_t")
    # A pair with salt_a < salt_b only ever meets with `a` on the left — its
    # side order is arbitrary, so canonicalize by swapping, don't filter.
    ph = _join_block(left, right, extra_key="salt_t", canonicalize=True)

    pairs = pn.unionByName(ph)
    agg = (
        pairs.groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            *[F.first(f"{c}_a").alias(f"{c}_a") for c in _SIDE_COLS[1:]],
            *[F.first(f"{c}_b").alias(f"{c}_b") for c in _SIDE_COLS[1:]],
        )
    )
    return agg


def _join_block(
    left: DataFrame,
    right: DataFrame | None = None,
    extra_key: str | None = None,
    canonicalize: bool = False,
) -> DataFrame:
    r = right if right is not None else left
    keys = ["block_key"] + ([extra_key] if extra_key else [])
    a = _rename(left, "a")
    b = _rename(r, "b")
    if not canonicalize:
        # Symmetric self-join: both orders appear, keep the canonical one.
        joined = a.join(b, on=keys).where(F.col("id_a") < F.col("id_b"))
        return joined.select(
            *[f"{c}_a" for c in _SIDE_COLS], *[f"{c}_b" for c in _SIDE_COLS]
        )
    joined = a.join(b, on=keys).where(F.col("id_a") != F.col("id_b"))
    swap = F.col("id_a") > F.col("id_b")
    return joined.select(
        *[
            F.when(swap, F.col(f"{c}_b")).otherwise(F.col(f"{c}_a")).alias(f"{c}_a")
            for c in _SIDE_COLS
        ],
        *[
            F.when(swap, F.col(f"{c}_a")).otherwise(F.col(f"{c}_b")).alias(f"{c}_b")
            for c in _SIDE_COLS
        ],
    )
