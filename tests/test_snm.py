"""Sorted-neighborhood blocking + Fellegi–Sunter scoring operators.

``global_rank`` is pinned against the single-partition ``row_number`` (the
semantically obvious but unscalable formulation), ``sorted_neighborhood_pairs``
against a brute-force position-difference cross product, and the FS weights
against hand-computed log-likelihood sums — all on data crafted to cross
partition and bucket boundaries.
"""

from __future__ import annotations

import pytest

import math
import random

import pyspark.sql.functions as F
from pyspark.sql import Window

from levenshtein_spark.operators.scoring import fellegi_sunter_weight, fs_classify
from levenshtein_spark.operators.snm import global_rank, sorted_neighborhood_pairs



# Heavy module (multi-second Spark jobs / hypothesis sweeps): excluded
# from the fast gate `pytest -m "not slow"` (README: Testing).
pytestmark = pytest.mark.slow

def _names(n, seed):
    rng = random.Random(seed)
    # duplicate-heavy keys: rank determinism must come from the id tiebreak
    return [(i, f"name{rng.randrange(n // 3):04d}") for i in range(n)]


def test_global_rank_matches_single_partition_window(spark):
    rows = _names(200, seed=7)
    df = spark.createDataFrame(rows, "id long, skey string")
    expected = {
        r.id: r.pos
        for r in df.withColumn(
            "pos", F.row_number().over(Window.orderBy("skey", "id")) - 1
        ).collect()
    }
    for nparts in (1, 3, 8):
        got = {
            r.id: r.pos
            for r in global_rank(df, ["skey", "id"], num_partitions=nparts).collect()
        }
        assert got == expected, f"num_partitions={nparts}"


def test_snm_pairs_match_bruteforce(spark):
    rows = _names(150, seed=11)
    df = spark.createDataFrame(rows, "id long, skey string")
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    for w in (2, 4, 9):
        expected = {
            (order[i][0], order[j][0], j - i)
            for i in range(len(order))
            for j in range(i + 1, min(i + w, len(order)))
        }
        got = {
            (r.id_a, r.id_b, r.gap)
            for r in sorted_neighborhood_pairs(
                df, ["skey", "id"], window=w, num_partitions=5
            ).collect()
        }
        assert got == expected, f"window={w}"
        # each pair exactly once (the bucket replication never double-counts)
        n = len(order)
        assert len(got) == sum(n - g for g in range(1, w))


def test_snm_window_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id long, skey string")
    try:
        sorted_neighborhood_pairs(df, ["skey", "id"], window=1)
        raise AssertionError("window=1 must raise")
    except ValueError:
        pass


def test_fellegi_sunter_weight_values(spark):
    fields = [
        (F.col("f1"), 0.9, 0.1),
        (F.col("f2"), 0.8, 0.25),
    ]
    w1a, w1d = round(math.log2(0.9 / 0.1), 6), round(math.log2(0.1 / 0.9), 6)
    w2a, w2d = round(math.log2(0.8 / 0.25), 6), round(math.log2(0.2 / 0.75), 6)
    df = spark.createDataFrame(
        [(a, b) for a in (True, False) for b in (True, False)], "f1 boolean, f2 boolean"
    )
    out = {
        (r.f1, r.f2): r.w
        for r in df.withColumn("w", fellegi_sunter_weight(fields)).collect()
    }
    for (a, b), w in out.items():
        expect = (w1a if a else w1d) + (w2a if b else w2d)
        assert abs(w - expect) < 1e-12, (a, b)


def test_fs_classify_boundaries(spark):
    df = spark.createDataFrame(
        [(8.0,), (7.999999,), (0.0,), (-0.000001,)], "w double"
    )
    got = [
        r.c
        for r in df.select(fs_classify(F.col("w"), 8.0, 0.0).alias("c")).orderBy(
            F.col("w").desc()
        ).collect()
    ]
    assert got == ["match", "possible", "possible", "non_match"]


def test_fs_weight_validation(spark):
    try:
        fellegi_sunter_weight([])
        raise AssertionError("empty fields must raise")
    except ValueError:
        pass
    try:
        fellegi_sunter_weight([(F.lit(True), 1.0, 0.5)])
        raise AssertionError("m=1.0 must raise")
    except ValueError:
        pass


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

if HAS_HYPOTHESIS:

    @settings(max_examples=15, deadline=None)
    @given(
        keys=st.lists(
            st.text(min_size=0, max_size=12), min_size=2, max_size=60
        ),
        window=st.integers(min_value=2, max_value=6),
        nparts=st.integers(min_value=1, max_value=7),
    )
    def test_snm_hypothesis_unicode_keys(spark, keys, window, nparts):
        """Arbitrary unicode sort keys (dupes, empties, surrogates excluded
        by st.text): the operator must agree with the brute force under
        Python's codepoint ordering — valid because UTF-8 byte order equals
        codepoint order, so Spark's string comparison sorts identically."""
        rows = list(enumerate(keys))
        df = spark.createDataFrame(rows, "id long, skey string")
        order = sorted(rows, key=lambda t: (t[1], t[0]))
        expected = {
            (order[i][0], order[j][0], j - i)
            for i in range(len(order))
            for j in range(i + 1, min(i + window, len(order)))
        }
        got = {
            (r.id_a, r.id_b, r.gap)
            for r in sorted_neighborhood_pairs(
                df, ["skey", "id"], window=window, num_partitions=nparts
            ).collect()
        }
        assert got == expected


# -- ER evaluation queries (linkage_f1 / linkage_cluster_f1_snm) --------------
SF = "/root/testdata/sf0.001"


def test_pair_prf_math(spark):
    from levenshtein_spark.driver_queries.er_eval import _pair_prf

    pred = spark.createDataFrame([(1, 2), (1, 3), (4, 5)], "src long, dst long")
    gold = spark.createDataFrame([(1, 2), (4, 5), (6, 7), (8, 9)], "src long, dst long")
    row = _pair_prf(pred, gold).collect()[0]
    assert (row.n_pred, row.n_gold, row.tp, row.fp, row.fn) == (3, 4, 2, 1, 2)
    assert row.precision == round(2 / 3, 6)
    assert row.recall == 0.5
    assert row.f1 == round(4 / 7, 6)


def test_linkage_f1_is_perfect(spark):
    """The BASELINE acceptance metric: pipeline edges vs the Ed-Join gold
    must score exactly F1 = 1.0 (both blockings are lossless for dist<=1 and
    the kernel is exact); anything lower is a blocking/scoring regression."""
    from levenshtein_spark.driver_queries.er_eval import q_linkage_f1

    row = q_linkage_f1(spark, SF).collect()[0]
    assert row.n_gold > 10, "fixture must contain a meaningful gold edge set"
    assert (row.fp, row.fn) == (0, 0)
    assert (row.precision, row.recall, row.f1) == (1.0, 1.0, 1.0)


def test_cluster_f1_snm_bounds(spark):
    """SNM edges are a subset of gold edges, so the induced partition is
    finer: cluster co-membership precision must be exactly 1.0 while recall
    is strictly lossy (single-pass SNM misses most cross-window matches)."""
    from levenshtein_spark.driver_queries.er_eval import q_linkage_cluster_f1_snm

    row = q_linkage_cluster_f1_snm(spark, SF).collect()[0]
    assert row.fp == 0 and row.precision == 1.0
    assert 0 < row.recall < 1
    assert row.f1 == round(2 * row.tp / (row.n_pred + row.n_gold), 6)


def test_bcubed_math_hand_computed(spark):
    """Pred {1,2},{3,4,5} vs gold {1,2,3},{4,5}: per-record precisions
    (1, 1, 1/3, 2/3, 2/3) and recalls (2/3, 2/3, 1/3, 1, 1) both average
    to 11/15."""
    from levenshtein_spark.driver_queries.er_eval import bcubed_scorecard

    t = spark.createDataFrame(
        [(1, 10, 20), (2, 10, 20), (3, 11, 20), (4, 11, 21), (5, 11, 21)],
        "id long, p long, g long",
    )
    row = bcubed_scorecard(t).collect()[0]
    assert row.n_records == 5
    assert row.bcubed_precision == round(11 / 15, 6)
    assert row.bcubed_recall == round(11 / 15, 6)
    assert row.bcubed_f1 == round(11 / 15, 6)


def test_bcubed_identical_labelings_perfect(spark):
    from levenshtein_spark.driver_queries.er_eval import bcubed_scorecard

    t = spark.createDataFrame(
        [(i, i % 3, i % 3) for i in range(9)], "id long, p long, g long"
    )
    row = bcubed_scorecard(t).collect()[0]
    assert (row.bcubed_precision, row.bcubed_recall, row.bcubed_f1) == (1.0, 1.0, 1.0)


def test_bcubed_snm_bounds(spark):
    """SNM's partition is a refinement of gold, so B-cubed precision is
    exactly 1.0 and recall is lossy — but LESS lossy than co-membership
    pairwise recall (B-cubed charges fragmentation linearly per record,
    pairwise charges it quadratically per cluster size)."""
    from levenshtein_spark.driver_queries.er_eval import (
        q_linkage_bcubed,
        q_linkage_cluster_f1_snm,
    )

    b = q_linkage_bcubed(spark, SF).collect()[0]
    assert b.bcubed_precision == 1.0
    assert 0 < b.bcubed_recall < 1
    pair = q_linkage_cluster_f1_snm(spark, SF).collect()[0]
    assert b.bcubed_recall > pair.recall
