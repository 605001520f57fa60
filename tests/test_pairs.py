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


def test_candidate_pairs_lr_matches_bruteforce(spark):
    """Bipartite salted candidates == brute-force distinct key-sharing
    pairs, including a deliberately hot key routed through the salt path."""
    import numpy as np
    import pyspark.sql.functions as F

    rng = np.random.default_rng(4)
    rows_l, rows_r = [], []
    for i in range(300):
        rows_l.append((f"k{int(rng.integers(0, 8))}", f"L{i:03d}"))
    for j in range(200):
        rows_r.append((f"k{int(rng.integers(0, 8))}", f"R{j:03d}"))
    # hot key on both sides
    rows_l += [("hot", f"LH{i:03d}") for i in range(60)]
    rows_r += [("hot", f"RH{j:03d}") for j in range(50)]

    from levenshtein_spark.operators.pairs import candidate_pairs_lr

    bl = spark.createDataFrame(rows_l, "block_key string, id string")
    br = spark.createDataFrame(rows_r, "block_key string, id string")
    got = {
        (r.id_l, r.id_r)
        for r in candidate_pairs_lr(bl, br, hot_threshold=500, num_salts=4).collect()
    }
    exp = {
        (il, ir)
        for kl, il in rows_l
        for kr, ir in rows_r
        if kl == kr
    }
    assert got == exp
    assert any(a.startswith("LH") for a, _ in got)  # hot path exercised


def test_fuzzy_join_two_tables(spark):
    from levenshtein_spark.operators.pairs import fuzzy_join

    left = spark.createDataFrame(
        [(1, "b1", "hello world"), (2, "b1", "totally different"), (3, "b2", "abc")],
        "id long, blk string, txt string",
    )
    right = spark.createDataFrame(
        [(10, "b1", "hello wxrld"), (11, "b2", "abd"), (12, "b2", "zzzzzz")],
        "id long, blk string, txt string",
    )
    got = {
        (r.id_l, r.id_r, r.dist)
        for r in fuzzy_join(left, right, key_col="blk", text_col="txt", k=2).collect()
    }
    assert got == {(1, 10, 1), (3, 11, 1)}


def test_adaptive_salting_is_lossless_and_sizes_per_block(spark):
    """Adaptive mode: per-block S_b = ceil(size/target) must produce the
    exact same (pair, n_keys) multiset as fixed salting and as no salting,
    across blocks whose sizes differ by 30x (one fixed S cannot fit both)."""
    rows = (
        [(f"giant", i) for i in range(90)]
        + [(f"warm", 1000 + i) for i in range(12)]
        + [(f"cold", 2000 + i) for i in range(3)]
    )
    blocks = spark.createDataFrame(rows, "block_key string, id long")

    plain = candidate_pairs(blocks, hot_threshold=10**9)
    fixed = candidate_pairs(blocks, hot_threshold=0, num_salts=6)
    adaptive = candidate_pairs(blocks, hot_threshold=0, adaptive_target_rows=8)

    def keyed(df):
        return {(r.id_a, r.id_b, r.n_keys) for r in df.collect()}

    kp = keyed(plain)
    assert kp == keyed(fixed) == keyed(adaptive)
    assert len(kp) == 90 * 89 // 2 + 12 * 11 // 2 + 3 * 2 // 2

    # adaptive mode with a huge target degenerates to S_b = 1 (one task per
    # block, same as unsalted) and still produces the identical set
    degenerate = candidate_pairs(blocks, hot_threshold=0, adaptive_target_rows=10**6)
    assert keyed(degenerate) == kp


def test_one_to_one_mutual_best(spark):
    """Mutual-best keeps exactly the pairs that are argmin on BOTH sides,
    ties broken by the other record's id."""
    from levenshtein_spark.operators.pairs import one_to_one

    cand = spark.createDataFrame(
        [
            (1, 10, 0),  # 1's best and 10's best -> kept
            (1, 11, 1),
            (2, 11, 0),  # kept
            (3, 12, 1),  # tie with (4,12,1): 12's best is 3 (lower id)
            (4, 12, 1),  # 4's best, but 12 prefers 3 -> dropped; 4 unmatched
            (3, 13, 1),  # 3's best is 12 (tie on dist, lower id) -> dropped
        ],
        "id_l long, id_r long, dist long",
    )
    got = {(r.id_l, r.id_r, r.dist) for r in one_to_one(cand).collect()}
    assert got == {(1, 10, 0), (2, 11, 0), (3, 12, 1)}
    # no id appears twice on either side
    assert len({a for a, _, _ in got}) == len(got) == len({b for _, b, _ in got})


def test_candidate_pairs_annotated_parity_and_payload(spark):
    """With an always-true predicate the annotated generator must produce
    the identical (pair, key-count) set as the slim one (hot + normal
    paths; the annotated column is named n_passing_keys since it counts
    passing meetings only — equal to n_keys under an always-true predicate),
    and payload columns must follow their ids through canonicalization."""
    import random

    from levenshtein_spark.operators.pairs import (
        candidate_pairs_annotated,
        candidate_pairs,
    )

    rng = random.Random(3)
    rows = [(f"k{rng.randint(0, 5)}", i, i * 10) for i in range(200)]
    # k0 gets a hot pile
    rows += [("k0", 1000 + i, (1000 + i) * 10) for i in range(60)]
    blocks = spark.createDataFrame(rows, "block_key string, id long, tag long")

    slim = {
        (r.id_a, r.id_b, r.n_keys)
        for r in candidate_pairs(blocks, hot_threshold=40, num_salts=4).collect()
    }
    ann = candidate_pairs_annotated(
        blocks, lambda m: F.lit(True), hot_threshold=40, num_salts=4
    ).collect()
    assert {(r.id_a, r.id_b, r.n_passing_keys) for r in ann} == slim

    # payload orientation: tag_x must equal id_x * 10 on every meeting — use
    # a predicate that FAILS when payloads are swapped
    ok = candidate_pairs_annotated(
        blocks,
        lambda m: (F.col("tag_a") == F.col("id_a") * 10)
        & (F.col("tag_b") == F.col("id_b") * 10),
        hot_threshold=40,
        num_salts=4,
    ).collect()
    assert {(r.id_a, r.id_b, r.n_passing_keys) for r in ok} == slim


def test_candidate_pairs_lr_annotated_parity(spark):
    from levenshtein_spark.operators.pairs import (
        candidate_pairs_lr,
        candidate_pairs_lr_annotated,
    )

    l = spark.createDataFrame(
        [("a", i, i + 100) for i in range(30)] + [("b", 99, 199)],
        "block_key string, id long, w long",
    )
    r = spark.createDataFrame(
        [("a", 1000 + i, 1000 + i + 100) for i in range(25)],
        "block_key string, id long, w long",
    )
    slim = {
        (x.id_l, x.id_r)
        for x in candidate_pairs_lr(
            l.select("block_key", "id"), r.select("block_key", "id"),
            hot_threshold=10, num_salts=3,
        ).collect()
    }
    ann = candidate_pairs_lr_annotated(
        l, r,
        lambda m: (F.col("w_l") == F.col("id_l") + 100)
        & (F.col("w_r") == F.col("id_r") + 100),
        hot_threshold=10,
        num_salts=3,
    ).collect()
    assert {(x.id_l, x.id_r) for x in ann} == slim


def test_candidate_pairs_collapsed_parity(spark):
    """candidate_pairs_collapsed must produce the identical (pair, n_keys)
    set as candidate_pairs on a corpus with planted blocking clones (deep
    clone groups, hot + normal blocks, singleton groups mixed in)."""
    import random

    from levenshtein_spark.operators.pairs import (
        candidate_pairs,
        candidate_pairs_collapsed,
    )

    rng = random.Random(11)
    rows = []
    next_id = 0
    # 12 clone groups of sizes 1..8: every member carries the same key set
    for g in range(12):
        keys = {f"k{rng.randint(0, 9)}" for _ in range(rng.randint(1, 4))}
        for _ in range(rng.randint(1, 8)):
            rid = f"id{next_id:04d}"
            next_id += 1
            rows += [(k, rid) for k in keys]
    # a hot pile sharing one key (all singleton groups w.r.t. full key set)
    for i in range(80):
        rid = f"hot{i:04d}"
        rows.append(("k0", rid))
        if i % 3 == 0:
            rows.append((f"k{1 + i % 5}", rid))
    blocks = spark.createDataFrame(rows, "block_key string, id string")

    plain = {
        (r.id_a, r.id_b, r.n_keys)
        for r in candidate_pairs(blocks, hot_threshold=30, num_salts=4).collect()
    }
    collapsed = {
        (r.id_a, r.id_b, r.n_keys)
        for r in candidate_pairs_collapsed(blocks, hot_threshold=30, num_salts=4).collect()
    }
    assert collapsed == plain
