"""Candidate-pair generation: the triangle salted join must be lossless —
exactly the same pair set whether a block is treated as hot or normal."""

import pyspark.sql.functions as F

from levenshtein_spark.operators.blocking import exploded_blocks
from levenshtein_spark.operators.normalize import normalize
from levenshtein_spark.operators.pairs import candidate_pairs
from levenshtein_spark.sources.code_files import code_files_df


def _pair_set(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


def test_salted_join_is_lossless(spark):
    src = code_files_df(spark, num_clusters=40, seed=7)
    blocks = exploded_blocks(normalize(src)).cache()

    plain = candidate_pairs(blocks, hot_threshold=10**9)  # nothing hot
    salted = candidate_pairs(blocks, hot_threshold=0, num_salts=5)  # everything hot

    ps, ss = _pair_set(plain), _pair_set(salted)
    assert ps == ss
    assert len(ps) > 0


def test_pairs_are_ordered_and_distinct(spark):
    src = code_files_df(spark, num_clusters=30, seed=3)
    blocks = exploded_blocks(normalize(src))
    pairs = candidate_pairs(blocks).cache()
    n = pairs.count()
    assert pairs.where(F.col("id_a") >= F.col("id_b")).count() == 0
    assert pairs.select("id_a", "id_b").distinct().count() == n


def test_generator_determinism_and_skew(spark):
    a = code_files_df(spark, num_clusters=50, seed=42).collect()
    b = code_files_df(spark, num_clusters=50, seed=42, partitions=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # hot repo really is hot (skew fixture property)
    from levenshtein_spark.sources.code_files import HOT_REPO

    hot = sum(1 for r in a if r.repo == HOT_REPO)
    assert hot / len(a) > 0.15
