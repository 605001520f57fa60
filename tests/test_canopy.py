"""Canopy pre-clustering (operators/canopy.py) vs brute-force rules."""

import itertools

import pytest

from levenshtein_spark.operators.canopy import canopy_assign
from levenshtein_spark.operators.pairs import candidate_pairs


@pytest.fixture(scope="module")
def graph(spark):
    # blocks: 0-3 doubly-keyed (tight), 4-6 singly-keyed chain via shared
    # blocks, 7 isolated, 8-9 tight pair
    rows = (
        [("x", i) for i in range(4)]
        + [("y", i) for i in range(4)]
        + [("c1", 4), ("c1", 5), ("c2", 5), ("c2", 6)]
        + [("solo", 7)]
        + [("t", 8), ("t", 9), ("u", 8), ("u", 9)]
    )
    blocks = spark.createDataFrame(rows, "block_key string, id long")
    ids = spark.range(10).select("id")
    weighted = candidate_pairs(blocks, hot_threshold=100).persist()
    return weighted, ids


def brute(weighted_rows, ids, t_tight, t_loose):
    w = {(r.id_a, r.id_b): r.n_keys for r in weighted_rows}
    dominated = {b for (a, b), k in w.items() if k >= t_tight}
    centers = {i for i in ids if i not in dominated}
    out = set()
    for (a, b), k in w.items():
        if k >= t_loose:
            if b in centers:
                out.add((a, b))
            if a in centers:
                out.add((b, a))
    out |= {(c, c) for c in centers}
    covered = {i for i, _ in out}
    out |= {(i, i) for i in ids if i not in covered}
    return out


def test_matches_brute_force(spark, graph):
    weighted, ids = graph
    exp = brute(weighted.collect(), list(range(10)), 2, 1)
    got = {(r.id, r.canopy_id) for r in canopy_assign(weighted, ids).collect()}
    assert got == exp


def test_total_coverage_and_center_rules(spark, graph):
    weighted, ids = graph
    rows = canopy_assign(weighted, ids).collect()
    assigned = {}
    for r in rows:
        assigned.setdefault(r.id, set()).add(r.canopy_id)
    # every record belongs to >= 1 canopy
    assert set(assigned) == set(range(10))
    # record 0 has no smaller tight neighbor -> center, self-assigned
    assert 0 in assigned[0]
    # records 1-3 are tight-dominated by 0 -> not centers, loosely in 0's
    # canopy and nothing else (0 is the only center among 0-3)
    for i in (1, 2, 3):
        assert assigned[i] == {0}
    # isolated record 7 self-canopies
    assert assigned[7] == {7}
    # tight pair (8,9): 8 is center, 9 dominated and assigned to 8
    assert 8 in assigned[8] and 8 in assigned[9]


def test_multi_assignment_overlap(spark, graph):
    """Record 5 shares c1 with 4 and c2 with 6 (both weight-1, loose only):
    4 and 6 are centers (no tight neighbors), so 5 lands in BOTH canopies —
    the overlap that preserves recall for downstream exact scoring."""
    weighted, ids = graph
    rows = canopy_assign(weighted, ids).collect()
    c5 = {r.canopy_id for r in rows if r.id == 5}
    assert {4, 6} <= c5


def test_thresholds(spark, graph):
    """t_loose == t_tight collapses loose assignment to the tight graph."""
    weighted, ids = graph
    exp = brute(weighted.collect(), list(range(10)), 2, 2)
    got = {
        (r.id, r.canopy_id)
        for r in canopy_assign(weighted, ids, t_tight=2, t_loose=2).collect()
    }
    assert got == exp
