"""Stage 1 — blocking (candidate generation).

Replaces the reference's full N² inner loop (tests/benchmark.cpp:305-383) —
the one thing that cannot survive 10^12 files — with multi-key blocking:

* ``lang + shifted content-length band grids``: the set-level generalization
  of the reference's length-difference early exit (src/prealgorithm.h:77-86).
  Two grids of width 2W offset by W guarantee any pair with
  ``|len_a - len_b| <= W`` shares at least one key (a pair can straddle at
  most one boundary of the combined boundary set, which belongs to only one
  grid).
* ``lang + path-token MinHash LSH bands``: catches pairs whose content head
  diverged but whose paths are near-identical.

Keys are plain columns (portable md5 hashing) so the gold-label generator
enumerates the exact same candidate universe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from levenshtein_spark.functions.hashing import (
    _MH_MOD,
    _mh_base,
    minhash_band_keys,
    minhash_signature,
)

DEFAULT_LEN_BAND = 32  # 2W: guarantees pairs with length diff <= 16 share a key
DEFAULT_MINHASH = 8
DEFAULT_BANDS = 4


def block_keys_col(
    len_band: int = DEFAULT_LEN_BAND,
    num_hashes: int = DEFAULT_MINHASH,
    bands: int = DEFAULT_BANDS,
) -> F.Column:
    """array<string> of block keys for a normalized row."""
    g1 = F.floor(F.col("content_len") / len_band)
    g2 = F.floor((F.col("content_len") + len_band // 2) / len_band)
    keys = [
        F.concat_ws("|", F.lit("len0"), F.col("lang"), g1.cast("string")),
        F.concat_ws("|", F.lit("len1"), F.col("lang"), g2.cast("string")),
    ]
    sig = minhash_signature(F.col("path_tokens"), num_hashes)
    mh = minhash_band_keys(sig, bands, num_hashes // bands)
    keys.append(F.concat(F.lit("mh|"), F.col("lang"), F.lit("|"), F.element_at(mh, 1)))
    for i in range(2, bands + 1):
        keys.append(F.concat(F.lit("mh|"), F.col("lang"), F.lit("|"), F.element_at(mh, i)))
    return F.array(*keys[:2], *keys[2:])


def with_block_keys(normalized: DataFrame, **kw) -> DataFrame:
    return normalized.withColumn("block_keys", block_keys_col(**kw))


def exploded_blocks(
    normalized: DataFrame,
    len_band: int = DEFAULT_LEN_BAND,
    num_hashes: int = DEFAULT_MINHASH,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Slim (block_key, id) — one row per (row, key).

    Deliberately payload-free: the pair-generation shuffles are the biggest
    data movers in the pipeline, and scoring re-attaches payload from the
    per-id normalized table (operators.pairs.attach_pair_payload).

    Same key math as ``block_keys_col`` (the oracle mirrors it unchanged),
    but the MinHash part runs as explode → flat codegen md5 columns →
    map-side-combining groupBy min: nested higher-order functions are
    interpreted per element and Catalyst re-inlines the signature array into
    every band key, which made the expression form the dominant cost of the
    blocks stage.
    """
    rows = num_hashes // bands
    g1 = F.floor(F.col("content_len") / len_band).cast("string")
    g2 = F.floor((F.col("content_len") + len_band // 2) / len_band).cast("string")
    # single scan: the length-grid values ride through the MinHash groupBy as
    # grouping columns (functionally dependent on id), so one pass over the
    # input and one shuffle produce all six keys
    toks = normalized.select(
        "id", "lang", g1.alias("g1"), g2.alias("g2"),
        F.explode_outer("path_tokens").alias("t"),
    )
    h1m, h2o = _mh_base(F.col("t"))
    base = toks.select("id", "lang", "g1", "g2", h1m.alias("_a"), h2o.alias("_b"))
    hashed = base.select(
        "id",
        "lang",
        "g1",
        "g2",
        *[
            F.pmod(F.col("_a") + i * F.col("_b"), F.lit(_MH_MOD)).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    sig = hashed.groupBy("id", "lang", "g1", "g2").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    keys = [
        F.concat_ws("|", F.lit("len0"), F.col("lang"), F.col("g1")),
        F.concat_ws("|", F.lit("len1"), F.col("lang"), F.col("g2")),
    ]
    for b in range(bands):
        part = [F.col(f"h{b * rows + r}").cast("string") for r in range(rows)]
        keys.append(
            F.concat(
                F.lit("mh|"), F.col("lang"), F.lit(f"|b{b}:"), F.md5(F.concat_ws("_", *part))
            )
        )
    return sig.select(F.explode(F.array(*keys)).alias("block_key"), "id")
