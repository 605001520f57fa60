"""Portable Bloom-filter semi-join reduction.

The classic shuffle killer for selective joins: build a tiny bitmap over
the dim side's join keys, broadcast it, and pre-filter the fact side
BEFORE its shuffle — only rows that pass (all true matches + a bounded
false-positive residue) ever move. Spark 3.3+ injects a runtime bloom via
``spark.sql.optimizer.runtime.bloomFilter.enabled`` when the optimizer
sees the join; this explicit operator exists for (a) pipelines that
pre-filter long before the join (multi-stage fan-in, cross-job reuse),
and (b) oracle certification — the md5 hash family is bit-reproducible
in DuckDB SQL, so a twin can re-derive every set bit.

Layout: ``m_bits`` bits packed into ``m_bits/64`` signed longs
(sign-agnostic: probes extract bits with ``(word >> bit) & 1``). The
bitmap build is one map-side-combining ``bit_or`` aggregate over the
dim side's hash positions; the driver collects ≤ m/64 scalar longs
(O(1), not data-sized) and re-broadcasts them as a literal array, so the
probe is pure whole-stage-codegen expression work — zero shuffle, zero
Python, no join node on the probe path.

False-positive math: after inserting n keys with k hashes,
fp ≈ (1 - e^{-kn/m})^k; the residue only costs wasted shuffle rows —
never correctness — because the consumer still applies the exact join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from levenshtein_spark.functions.hashing import hash64


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # seed i+1: seed 0 is hash64's unseeded form, reserved for other users
    return [F.pmod(hash64(key.cast("string"), seed=i + 1), F.lit(m_bits)) for i in range(k)]


def build_bloom(df: DataFrame, key_col: str, m_bits: int = 16384, k: int = 3) -> list[int]:
    """Bitmap over ``df[key_col]`` as a list of ``m_bits/64`` longs.

    One explode + one ``bit_or`` aggregate (≤ m/64 groups); the collect is
    O(m) driver scalars, independent of ``df``'s size.
    """
    assert m_bits % 64 == 0
    pos = df.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("p")
    )
    words = (
        pos.select(
            F.expr("p div 64").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[int(r["w"])] = int(r["bits"])
    return out


def bloom_probe(bitmap: list[int], key: Column, k: int = 3) -> Column:
    """Boolean column: every one of the key's ``k`` bit positions is set.

    ``bitmap`` is the ``build_bloom`` result; it is embedded as a literal
    array, so the probe stays inside whole-stage codegen.
    """
    m_bits = len(bitmap) * 64
    arr = F.array(*[F.lit(w) for w in bitmap])
    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        # word index p div 64 (exact: p < 2^53), bit p % 64 via bit_get
        # (sign-agnostic — bit 63 of a negative long extracts correctly)
        word = F.element_at(arr, F.floor(p / 64).cast("int") + 1)
        cond = cond & (F.bit_get(word, p % 64) == 1)
    return cond


def bloom_filter_df(
    df: DataFrame, key_col: str, bitmap: list[int], k: int = 3
) -> DataFrame:
    """``df`` restricted to rows whose key passes the bloom."""
    return df.where(bloom_probe(bitmap, F.col(key_col), k))
