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
from pyspark.sql import Column, DataFrame, Window

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


def _positional_qgrams(text: Column, q: int) -> Column:
    """The positional q-gram multiset of ``text`` as array<string> (empty
    for strings shorter than q — F.sequence would count DOWN for a negative
    span, so the short case is guarded explicitly)."""
    ln = F.length(text)
    grams = F.transform(
        F.sequence(F.lit(1), ln - (q - 1)), lambda i: F.substr(text, i, F.lit(q))
    )
    return F.when(ln >= q, grams).otherwise(F.array().cast("array<string>"))


def edit_distance_self_join(
    records: DataFrame,
    text_col: str,
    k: int,
    q: int = 3,
    id_col: str = "id",
    transpositions: bool = False,
    dist_fn=None,
    hot_threshold: int = 2000,
    num_salts: int = 16,
) -> DataFrame:
    """All pairs with edit distance <= k, via the Ed-Join / prefix-filter
    candidate generator (Gravano et al. VLDB'01 count filter; Xiao et al.
    prefix filter) — the content-based candidate generator that stays
    selective where pure length banding degrades to one giant band (uniform-
    length corpora). Output: ``(id_a, id_b, dist)``; exact, not approximate.

    Why it is lossless: one edit (ins/del/sub) overlaps at most ``q``
    positional q-grams (a transposition at most ``q+1``, hence the per-edit
    damage ``D``), so ``dist(s,t) <= k`` forces the gram multisets to share
    ``>= max(|G_s|,|G_t|) - k*D`` grams. Sorting every string's grams under
    one global order (rarest-frequency-first — the census makes prefix
    grams the most selective ones) and keeping each string's first
    ``k*D + 1`` grams as its blocking keys then guarantees any valid pair
    shares >= 1 key, PROVIDED the longer string has > k*D grams, i.e.
    ``len >= k*D + q``. Pairs below that length land together in a
    dedicated "short" block (if the longer side is short, so is the
    shorter), which keeps the construction exact end to end; candidates are
    verified with the exact kernel. Like every blocked family here, keys
    flow through the hot-block-salted slim-pair operator.

    Scale shape: gram census = one map-side-combining aggregate; the global
    order is attached by a gram-keyed join (never broadcast); the per-string
    rarest-prefix rank partitions by id (short sorted runs). The prefix
    shrinks candidates by content — at web scale this is the difference
    between "every same-length pair" and "pairs sharing a rare substring".
    """
    if k < 0 or q < 1:
        raise ValueError("need k >= 0 and q >= 1")
    if dist_fn is None:
        from levenshtein_spark.functions.distance import (
            bounded_edit_dist,
            bounded_edit_dist_t,
        )

        dist_fn = bounded_edit_dist_t if transpositions else bounded_edit_dist
    damage = (q + 1) if transpositions else q
    prefix_len = k * damage + 1
    short_len = k * damage + q  # longer side below this ⇒ prefix filter vacuous

    # NULL text follows the kernel's NULL→empty rule (prealgorithm.h:17-23):
    # length 0 routes it into the short block instead of out of the join
    base = records.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("__t"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("__len"),
    )
    grams = base.select(
        "id", "__len", F.explode(_positional_qgrams(F.col("__t"), q)).alias("g")
    )
    census = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__freq"))
    ranked = grams.join(census, "g").withColumn(
        "__r",
        F.row_number().over(
            Window.partitionBy("id").orderBy("__freq", "g")
        ),
    )
    gram_keys = ranked.where(F.col("__r") <= prefix_len).select(
        F.concat(F.lit("eg|"), F.col("g")).alias("block_key"), "id"
    )
    short_keys = base.where(F.col("__len") < short_len).select(
        F.lit("eg|__short").alias("block_key"), "id"
    )
    pairs = candidate_pairs(
        gram_keys.unionByName(short_keys), hot_threshold, num_salts
    ).drop("n_keys")
    fat = attach_pair_payload(
        pairs, records.select(F.col(id_col).alias("id"), text_col), [text_col]
    )
    return fat.select(
        "id_a", "id_b", dist_fn(f"{text_col}_a", f"{text_col}_b", k).alias("dist")
    ).where(F.col("dist") <= k)
