"""Similarity-threshold self-join — the reference's ``similarity_t(a, b, p)
>= p`` usage pattern (doc/Usage.md:138-144) lifted from a scalar filter to a
scale-correct blocked join.

Blocking is **lossless by arithmetic**, the similarity analogue of the
length-difference pre-exit (src/prealgorithm.h:77-86): ``sim(a, b) >= p``
forces ``dist <= (1-p)·max(len)``, hence ``min(len) >= p·max(len)`` — the
length *ratio* is bounded, so rows are banded on
``floor(ln(len) / ln(1/p))`` and exploded to (band, band+1). For any valid
pair the band indices differ by at most 1 (``y - x <= 1 ⇒ floor(y) -
floor(x) <= 1``), so the pair shares >= 1 key; pairs that only *might*
qualify are verified with the exact kernel, so the join equals the
brute-force ``WHERE sim >= p`` result exactly.

Uniform-length corpora degrade to one giant band — which is why candidates
run through the hot-block-salted ``candidate_pairs`` operator rather than a
raw self-join (the same discipline as every other blocked family here).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from levenshtein_spark.operators.pairs import attach_pair_payload, candidate_pairs


def log_length_bands(length: Column, p: float) -> Column:
    """array<string> of the (band, band+1) log-ratio length keys for ``p``.

    Empty strings get a dedicated band (only an empty partner can reach
    sim >= p > 0 against them).
    """
    if not (0.0 < p < 1.0):
        raise ValueError("p must be in (0, 1) for log-ratio banding")
    base = math.log(1.0 / p)
    band = F.floor(F.log(length.cast("double")) / F.lit(base)).cast("long")
    return F.when(length <= 0, F.array(F.lit("simlen|empty"))).otherwise(
        F.array(
            F.concat(F.lit("simlen|"), band.cast("string")),
            F.concat(F.lit("simlen|"), (band + 1).cast("string")),
        )
    )


def similarity_self_join(
    records: DataFrame,
    text_col: str,
    p: float,
    id_col: str = "id",
    sim_fn=None,
    hot_threshold: int = 2000,
    num_salts: int = 16,
) -> DataFrame:
    """All pairs with ``sim_fn(text_a, text_b) >= p`` (default: the
    reference OSA ``similarity_t``), via lossless log-length banding + the
    salted slim-pair operator. Output: ``(id_a, id_b, sim)``.
    """
    if sim_fn is None:
        from levenshtein_spark.functions.distance import similarity_t

        def sim_fn(a, b):  # noqa: F811 - default binding
            return similarity_t(a, b, p)

    # byte length, not char length: the kernel and the similarity formula
    # are byte-based (ReadMe.md:50-51), and the ratio bound must hold in
    # the same unit the distance is measured in
    slim = records.select(
        F.col(id_col).alias("id"), F.octet_length(F.col(text_col)).alias("__len")
    )
    blocks = slim.select(
        F.explode(log_length_bands(F.col("__len"), p)).alias("block_key"), "id"
    )
    pairs = candidate_pairs(blocks, hot_threshold, num_salts).drop("n_keys")
    fat = attach_pair_payload(
        pairs, records.select(F.col(id_col).alias("id"), text_col), [text_col]
    )
    return fat.select(
        "id_a",
        "id_b",
        sim_fn(f"{text_col}_a", f"{text_col}_b").alias("sim"),
    ).where(F.col("sim") >= p)
