"""DBSCAN graph-phase operator: planted shapes vs a brute-force reference
with the identical defined semantics (min-label border assignment)."""

from __future__ import annotations

import pytest

import itertools
import random

from levenshtein_spark.operators.clustering import dbscan_labels



# Heavy module (multi-second Spark jobs / hypothesis sweeps): excluded
# from the fast gate `pytest -m "not slow"` (README: Testing).
pytestmark = pytest.mark.slow

def _brute(ids, edges, min_pts):
    nbrs = {i: set() for i in ids}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    deg = {i: len(nbrs[i]) for i in ids}
    # textbook: |N_eps(p)| counts p itself
    core = {i for i in ids if deg[i] + 1 >= min_pts}
    # components of the core-core subgraph, labeled min core id
    label = {}
    for c in sorted(core):
        if c in label:
            continue
        stack, seen = [c], {c}
        while stack:
            v = stack.pop()
            for nb in nbrs[v]:
                if nb in core and nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        root = min(seen)
        for v in seen:
            label[v] = root
    out = {}
    for i in ids:
        if i in core:
            cl = label[i]
        else:
            cores = [label[nb] for nb in nbrs[i] if nb in core]
            cl = min(cores) if cores else -1
        out[i] = (deg[i], i in core, cl)
    return out


def _run(spark, ids, edges, min_pts):
    idf = spark.createDataFrame([(i,) for i in ids], "id long")
    edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        edf = edf.limit(0)
    got = dbscan_labels(idf, edf, min_pts)
    return {r.id: (r.deg, r.is_core, r.cluster) for r in got.collect()}


def test_two_blobs_bridge_and_noise(spark):
    # blob A: clique 0-4; blob B: clique 10-14; 20 attached to one core of
    # each — at min_pts=4 its |N_eps| = 3 < 4, so it is a BORDER point and
    # takes the MIN cluster; 30 isolated noise; 31-32 a degree-1 pair
    # (both noise)
    ids = list(range(5)) + list(range(10, 15)) + [20, 30, 31, 32]
    edges = (
        list(itertools.combinations(range(5), 2))
        + list(itertools.combinations(range(10, 15), 2))
        + [(4, 20), (10, 20), (31, 32)]
    )
    got = _run(spark, ids, edges, 4)
    assert got == _brute(ids, edges, 4)
    assert got[0] == (4, True, 0)
    assert got[10][1] and got[10][2] == 10
    assert got[20] == (2, False, 0)      # border, min-label rule
    assert got[30] == (0, False, -1)
    assert got[31] == (1, False, -1)
    # at min_pts=3 the textbook self-inclusive rule makes 20 a core,
    # BRIDGING the blobs into one cluster — pin the difference explicitly
    merged = _run(spark, ids, edges, 3)
    assert merged == _brute(ids, edges, 3)
    assert merged[20][1] and merged[20][2] == 0 and merged[10][2] == 0


def test_chain_merges_through_cores(spark):
    # a path graph at min_pts=4: interior nodes (|N_eps| = deg 3..4 + self)
    # are cores forming ONE cluster; endpoints 0 and 7 (|N_eps| = 3 < 4) are
    # border points of that same cluster, so the min CORE id (1) labels all
    ids = list(range(8))
    edges = [(i, i + 1) for i in range(7)] + [(i, i + 2) for i in range(6)]
    got = _run(spark, ids, edges, 4)
    assert got == _brute(ids, edges, 4)
    assert not got[0][1] and not got[7][1]
    clusters = {v[2] for v in got.values() if v[2] != -1}
    assert clusters == {1}


def test_random_graphs_match_brute_force(spark):
    rng = random.Random(17)
    ids = list(range(60))
    edges = list(
        {tuple(sorted(rng.sample(ids, 2))) for _ in range(150)}
    )
    for min_pts in (2, 3, 5):
        assert _run(spark, ids, edges, min_pts) == _brute(ids, edges, min_pts)
