"""Bloom-filter semi-join: zero false negatives, bitmap bit-parity with a
pure-Python reference, fp-rate sanity, and a join-free probe plan."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from levenshtein_spark.operators.bloom import bloom_filter_df, bloom_probe, build_bloom

M, K = 4096, 3


def _py_positions(key: int, m_bits: int = M, k: int = K):
    out = []
    for i in range(k):
        h = int(hashlib.md5(f"{i + 1}\x1f{key}".encode()).hexdigest()[:15], 16)
        out.append(h % m_bits)
    return out


def _py_bloom(keys, m_bits: int = M, k: int = K):
    words = [0] * (m_bits // 64)
    for key in keys:
        for p in _py_positions(key, m_bits, k):
            words[p // 64] |= 1 << (p % 64)
    # pack to SIGNED 64-bit like Spark's longs
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


@pytest.fixture(scope="module")
def dim_keys():
    return [3 * i + 1 for i in range(400)]  # keys ≡ 1 (mod 3)


@pytest.fixture(scope="module")
def bitmap(spark, dim_keys):
    dim = spark.createDataFrame([(x,) for x in dim_keys], ["key"])
    return build_bloom(dim, "key", M, K)


def test_bitmap_bit_parity_with_python_reference(bitmap, dim_keys):
    assert bitmap == _py_bloom(dim_keys)


def test_no_false_negatives(spark, bitmap, dim_keys):
    probe = spark.createDataFrame([(x,) for x in dim_keys], ["key"])
    n = bloom_filter_df(probe, "key", bitmap, K).count()
    assert n == len(dim_keys)


def test_fp_rate_in_theory_band(spark, bitmap, dim_keys):
    # disjoint probes: keys ≡ 0 (mod 3); fp ≈ (1 - e^{-kn/m})^k ≈ 0.017
    probe = spark.createDataFrame([(3 * i,) for i in range(2000)], ["key"])
    fp = bloom_filter_df(probe, "key", bitmap, K).count()
    assert 0 <= fp / 2000 < 0.06, fp


def test_probe_plan_has_no_join(spark, bitmap):
    probe = spark.range(1000).select(F.col("id").alias("key"))
    plan = (
        bloom_filter_df(probe, "key", bitmap, K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan  # pure map-side filter
