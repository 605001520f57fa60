"""Exact counting-sort percentiles + Count-Min sketch: definition edge
cases, the est >= exact guarantee, and counter mergeability.

These pin the non-oracle-visible properties: the oracle twins in
__spark_entry__ certify cross-engine equality of one corpus; these pin the
MATH (type-1 quantile boundaries, CMS one-sided error, additive merge).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from levenshtein_spark.driver_queries.curation import _CMS_D, _CMS_W
from levenshtein_spark.functions.hashing import hash64


def _percentiles_df(spark, rows):
    from pyspark.sql import Window

    d = spark.createDataFrame(rows, ["lang", "n_chars"])
    hist = d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy("n_chars")
    wt = Window.partitionBy("lang")
    s = hist.select(
        "lang", "n_chars",
        F.sum("c").over(w).alias("cum"), F.sum("c").over(wt).alias("tot"),
    )

    def pick(k):
        t = F.expr(f"(tot * {k} + 99) div 100")
        return F.min(F.when(F.col("cum") >= t, F.col("n_chars"))).alias(f"p{k}")

    return {
        r["lang"]: (r["p50"], r["p90"], r["p99"])
        for r in s.groupBy("lang").agg(pick(50), pick(90), pick(99)).collect()
    }


def _type1(vals, p):
    vs = sorted(vals)
    return vs[math.ceil(p * len(vs)) - 1]


@pytest.mark.parametrize(
    "vals",
    [
        [7],                     # n=1: every percentile is the value
        [5, 5, 5, 5],            # all equal
        list(range(1, 101)),     # exact boundary: p50 of 1..100 is 50
        [1, 2, 2, 3, 100],       # skewed tail
        list(range(1, 200, 2)),  # odd n
    ],
)
def test_percentile_definition_matches_type1(spark, vals):
    got = _percentiles_df(spark, [("x", v) for v in vals])["x"]
    want = tuple(_type1(vals, p) for p in (0.5, 0.9, 0.99))
    assert got == want, (vals[:5], got, want)


def test_percentiles_per_group_independent(spark):
    rows = [("a", v) for v in range(1, 11)] + [("b", 42)]
    got = _percentiles_df(spark, rows)
    assert got["a"] == (5, 9, 10)
    assert got["b"] == (42, 42, 42)


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def _cms_counters(spark, toks):
    t = spark.createDataFrame([(x,) for x in toks], ["tok"])
    barr = F.array(
        *[F.pmod(hash64(F.col("tok"), seed=i + 1), F.lit(_CMS_W)) for i in range(_CMS_D)]
    )
    return {
        (r["r"], r["b"]): r["cnt"]
        for r in t.select(F.posexplode(barr).alias("r", "b"))
        .groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }


def _cms_est(counters, buckets):
    return min(counters.get((i, b), 0) for i, b in enumerate(buckets))


def _buckets(spark, toks):
    t = spark.createDataFrame([(x,) for x in set(toks)], ["tok"])
    cols = [
        F.pmod(hash64(F.col("tok"), seed=i + 1), F.lit(_CMS_W)).alias(f"b{i}")
        for i in range(_CMS_D)
    ]
    return {
        r["tok"]: tuple(r[f"b{i}"] for i in range(_CMS_D))
        for r in t.select("tok", *cols).collect()
    }


def test_cms_estimate_never_undercounts(spark):
    import collections
    import random

    rng = random.Random(7)
    toks = [f"t{rng.randint(0, 400)}" for _ in range(5000)] + ["hot"] * 500
    counters = _cms_counters(spark, toks)
    bk = _buckets(spark, toks)
    exact = collections.Counter(toks)
    for tok, n in exact.items():
        assert _cms_est(counters, bk[tok]) >= n, tok
    # the planted heavy hitter is estimated closely (unique tokens collide
    # little at 4x512 on ~400 distinct)
    assert _cms_est(counters, bk["hot"]) <= 500 + 200


def test_cms_counters_merge_by_addition(spark):
    """sketch(A ∪ B) == sketch(A) + sketch(B) counter-wise — the property
    that makes the sketch shard/day mergeable."""
    a = [f"a{i % 50}" for i in range(600)]
    b = [f"b{i % 30}" for i in range(400)] + a[:100]
    whole = _cms_counters(spark, a + b)
    ca, cb = _cms_counters(spark, a), _cms_counters(spark, b)
    merged = {
        k: ca.get(k, 0) + cb.get(k, 0) for k in set(ca) | set(cb)
    }
    assert merged == whole
