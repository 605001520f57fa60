"""Alternative match-graph clusterings (star / merge-center / KwikCluster
pivot) vs brute-force references implementing the identical deterministic
semantics, on planted shapes and random graphs."""

from __future__ import annotations

import hashlib
import random

import pytest

from levenshtein_spark.operators.clustering import (
    merge_center_labels,
    pivot_labels,
    star_labels,
)

pytestmark = pytest.mark.slow


# -- pure-Python references ---------------------------------------------------

def _nbrs(ids, edges):
    nb = {i: set() for i in ids}
    for a, b in edges:
        if a != b:
            nb[a].add(b)
            nb[b].add(a)
    return nb


def _brute_star(ids, edges):
    nb = _nbrs(ids, edges)
    deg = {i: len(nb[i]) for i in ids}
    dominates = lambda u, v: deg[u] > deg[v] or (deg[u] == deg[v] and u < v)
    centers = {v for v in ids if not any(dominates(u, v) for u in nb[v])}
    out = {}
    for v in ids:
        if v in centers:
            out[v] = (deg[v], True, v)
        else:
            cand = [u for u in nb[v] if u in centers]
            # dominant-most center neighbor: max deg, tie min id
            ctr = min(cand, key=lambda u: (-deg[u], u)) if cand else v
            out[v] = (deg[v], False, ctr)
    return out


def _brute_merge_center(ids, edges):
    star = _brute_star(ids, edges)
    nb = _nbrs(ids, edges)
    centers = sorted(v for v in ids if star[v][1])
    cset = set(centers)
    # merge graph: adjacent centers, or centers sharing any common neighbor
    madj = {c: set() for c in centers}
    for c1 in centers:
        for c2 in centers:
            if c2 <= c1:
                continue
            if c2 in nb[c1] or (nb[c1] & nb[c2]):
                madj[c1].add(c2)
                madj[c2].add(c1)
    merged = {}
    for c in centers:
        if c in merged:
            continue
        stack, seen = [c], {c}
        while stack:
            v = stack.pop()
            for u in madj[v]:
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        root = min(seen)
        for v in seen:
            merged[v] = root
    out = {}
    for v in ids:
        _, is_c, ctr = star[v]
        out[v] = merged[ctr] if ctr in cset else ctr
    return out


def _key(i):
    # the operator's scan order: struct (md5(str(id)), id) — tuple compare
    return (hashlib.md5(str(i).encode()).hexdigest(), i)


def _brute_kwik(ids, edges):
    """Serial KwikCluster in _key order — the parallel rounds must
    reproduce this exactly (Chierichetti/Dalvi/Kumar, KDD'14)."""
    nb = _nbrs(ids, edges)
    out = {}
    for v in sorted(ids, key=_key):
        if v in out:
            continue
        out[v] = v
        for u in nb[v]:
            if u not in out:
                out[u] = v
    return out


# -- graph corpora ------------------------------------------------------------

def _random_graph(seed, n, m):
    rng = random.Random(seed)
    ids = list(range(1, n + 1))
    edges = set()
    while len(edges) < m:
        a, b = rng.sample(ids, 2)
        edges.add((min(a, b), max(a, b)))
    return ids, sorted(edges)


PLANTED = [
    # path with alternating degrees (exercises the star fallback-singleton rule)
    (list(range(1, 7)), [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]),
    # two triangles joined by one bridge (closure would over-merge)
    ([1, 2, 3, 4, 5, 6], [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]),
    # star + isolated nodes + clique
    (list(range(1, 12)), [(1, 2), (1, 3), (1, 4), (1, 5), (8, 9), (8, 10), (9, 10)]),
]


def _spark_edges(spark, ids, edges):
    ids_df = spark.createDataFrame([(i,) for i in ids], "id long")
    e_df = (
        spark.createDataFrame([(a, b) for a, b in edges], "src long, dst long")
        if edges
        else spark.createDataFrame([], "src long, dst long")
    )
    return ids_df, e_df


@pytest.mark.parametrize("case", range(len(PLANTED)))
def test_star_planted(spark, case):
    ids, edges = PLANTED[case]
    ids_df, e_df = _spark_edges(spark, ids, edges)
    got = {
        r.id: (r.deg, r.is_center, r.cluster_id)
        for r in star_labels(ids_df, e_df).collect()
    }
    assert got == _brute_star(ids, edges)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_star_random(spark, seed):
    ids, edges = _random_graph(seed, 60, 90)
    ids_df, e_df = _spark_edges(spark, ids, edges)
    got = {
        r.id: (r.deg, r.is_center, r.cluster_id)
        for r in star_labels(ids_df, e_df).collect()
    }
    assert got == _brute_star(ids, edges)


@pytest.mark.parametrize("case", range(len(PLANTED)))
def test_merge_center_planted(spark, case):
    ids, edges = PLANTED[case]
    ids_df, e_df = _spark_edges(spark, ids, edges)
    got = {r.id: r.cluster_id for r in merge_center_labels(ids_df, e_df).collect()}
    assert got == _brute_merge_center(ids, edges)


@pytest.mark.parametrize("seed", [21, 22])
def test_merge_center_random(spark, seed):
    ids, edges = _random_graph(seed, 50, 70)
    ids_df, e_df = _spark_edges(spark, ids, edges)
    got = {r.id: r.cluster_id for r in merge_center_labels(ids_df, e_df).collect()}
    assert got == _brute_merge_center(ids, edges)


@pytest.mark.parametrize("case", range(len(PLANTED)))
def test_pivot_planted(spark, case):
    ids, edges = PLANTED[case]
    ids_df, e_df = _spark_edges(spark, ids, edges)
    got = {r.id: r.cluster_id for r in pivot_labels(ids_df, e_df).collect()}
    assert got == _brute_kwik(ids, edges)


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_pivot_random(spark, seed):
    ids, edges = _random_graph(seed, 80, 140)
    ids_df, e_df = _spark_edges(spark, ids, edges)
    labels = pivot_labels(ids_df, e_df)
    got = {r.id: r.cluster_id for r in labels.collect()}
    assert got == _brute_kwik(ids, edges)
    # structural invariant: every member is a verified neighbor of its pivot
    nb = _nbrs(ids, edges)
    for v, p in got.items():
        assert v == p or p in nb[v]


def test_pivot_empty(spark):
    ids_df, e_df = _spark_edges(spark, [], [])
    assert pivot_labels(ids_df, e_df).count() == 0


# -- string-id graphs (the linkage pipeline's sha-hex ids) --------------------

def _str_graph(seed, n, m):
    ids, edges = _random_graph(seed, n, m)
    name = lambda i: f"doc-{i:04d}"
    return [name(i) for i in ids], [(name(a), name(b)) for a, b in edges]


def _spark_edges_str(spark, ids, edges):
    ids_df = spark.createDataFrame([(i,) for i in ids], "id string")
    e_df = spark.createDataFrame(list(edges), "src string, dst string")
    return ids_df, e_df


def test_star_string_ids(spark):
    ids, edges = _str_graph(41, 50, 70)
    ids_df, e_df = _spark_edges_str(spark, ids, edges)
    got = {
        r.id: (r.deg, r.is_center, r.cluster_id)
        for r in star_labels(ids_df, e_df).collect()
    }
    assert got == _brute_star(ids, edges)


def test_merge_center_string_ids(spark):
    ids, edges = _str_graph(42, 40, 55)
    ids_df, e_df = _spark_edges_str(spark, ids, edges)
    got = {r.id: r.cluster_id for r in merge_center_labels(ids_df, e_df).collect()}
    assert got == _brute_merge_center(ids, edges)


def test_pivot_string_ids(spark):
    ids, edges = _str_graph(43, 60, 90)
    ids_df, e_df = _spark_edges_str(spark, ids, edges)
    got = {r.id: r.cluster_id for r in pivot_labels(ids_df, e_df).collect()}
    assert got == _brute_kwik(ids, edges)
