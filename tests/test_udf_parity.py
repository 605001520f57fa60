"""UDF parity: Spark column functions == NumPy kernel == full-matrix oracle.

Mirrors the reference's A-vs-B differential harness
(tests/comparetests.cpp:216-269) with the Spark UDF layer as algorithm A and
the pure-Python oracle as algorithm B.
"""

import numpy as np
import pytest
import pyspark.sql.functions as F

import levenshtein_spark.functions as lf
from levenshtein_spark.oracle import ref_edit_distance, ref_similarity

from tests.gen import random_affixed_pair


@pytest.fixture(scope="module")
def pair_df(spark):
    rng = np.random.default_rng(99)
    rows = [random_affixed_pair(rng) for _ in range(300)]
    rows += [(None, "abc"), ("abc", None), (None, None), ("", "abcdefg"), ("é", "e")]
    return spark.createDataFrame(rows, "a string, b string").cache(), rows


def test_osa_udf_matches_oracle(pair_df):
    df, rows = pair_df
    got = df.select("a", "b", lf.edit_dist_t("a", "b").alias("d")).collect()
    for r in got:
        assert r.d == ref_edit_distance(r.a, r.b), (r.a, r.b)


@pytest.mark.parametrize("k", [2, 5, 16])
def test_bounded_osa_udf_matches_oracle(pair_df, k):
    df, rows = pair_df
    got = df.select("a", "b", lf.bounded_edit_dist_t("a", "b", k).alias("d")).collect()
    for r in got:
        assert r.d == ref_edit_distance(r.a, r.b, k), (r.a, r.b, k)


def test_lev_udf_matches_oracle(pair_df):
    df, rows = pair_df
    got = df.select("a", "b", lf.bounded_edit_dist("a", "b", 5).alias("d")).collect()
    for r in got:
        assert r.d == ref_edit_distance(r.a, r.b, 5, transpositions=False)


def test_similarity_udf_matches_oracle(pair_df):
    df, rows = pair_df
    got = df.select("a", "b", lf.similarity_t("a", "b", 0.7).alias("s")).collect()
    for r in got:
        assert r.s == pytest.approx(ref_similarity(r.a, r.b, 0.7), abs=1e-12)


def test_builtin_wrapper_matches_kernel_on_ascii(spark):
    rng = np.random.default_rng(5)
    rows = [random_affixed_pair(rng) for _ in range(200)]
    rows += [(None, "abc"), ("", "abcdefg"), ("same", "same")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = df.select(
        lf.bounded_edit_dist("a", "b", 4).alias("kernel"),
        lf.bounded_edit_dist_builtin("a", "b", 4).alias("builtin"),
        lf.edit_dist("a", "b").alias("kernel_unb"),
        lf.edit_dist_builtin("a", "b").alias("builtin_unb"),
    ).collect()
    for r in got:
        assert r.kernel == r.builtin
        assert r.kernel_unb == r.builtin_unb


def test_per_row_k_column(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting", 2), ("kitten", "sitting", 3), ("ab", "ba", 10)],
        "a string, b string, k long",
    )
    got = df.select(lf.bounded_edit_dist_t("a", "b", F.col("k")).alias("d")).collect()
    assert [r.d for r in got] == [3, 3, 1]


def test_negative_k_rejected():
    with pytest.raises(ValueError):
        lf.bounded_edit_dist_t("a", "b", -1)
    with pytest.raises(ValueError):
        lf.similarity_t("a", "b", 1.5)


def test_scoring_plan_is_arrow_batched(pair_df):
    # The scoring boundary must be a single ArrowEvalPython node, never
    # row-at-a-time BatchEvalPython (north_rule: no per-row Python).
    df, _ = pair_df
    plan = df.select(lf.bounded_edit_dist_t("a", "b", 4).alias("d"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
