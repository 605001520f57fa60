"""Bridge pruning / cluster repair (operators/repair.py) on hand graphs."""

from __future__ import annotations

import pyspark.sql.functions as F

from levenshtein_spark.operators.clustering import cluster_labels
from levenshtein_spark.operators.repair import edge_support, prune_bridges


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _clusters(spark, pairs):
    ids = sorted({x for p in pairs for x in p})
    kept = prune_bridges(_edges(spark, pairs))
    lab = cluster_labels(
        spark.createDataFrame([(i,) for i in ids], "id long"), kept
    ).collect()
    out = {}
    for r in lab:
        out.setdefault(r.cluster_id, set()).add(r.id)
    return sorted(sorted(v) for v in out.values())


def test_edge_support_values(spark):
    # triangle 1-2-3 plus pendant 3-4
    rows = {
        (r.src, r.dst): (r.support, r.deg_src, r.deg_dst)
        for r in edge_support(
            _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        ).collect()
    }
    assert rows == {
        (1, 2): (1, 2, 2),
        (2, 3): (1, 2, 3),
        (1, 3): (1, 2, 3),
        (3, 4): (0, 3, 1),
    }


def test_triangle_with_pendant_survives(spark):
    # the pendant edge has deg_dst == 1 → kept; nothing shatters
    assert _clusters(spark, [(1, 2), (2, 3), (1, 3), (3, 4)]) == [[1, 2, 3, 4]]


def test_bridge_between_triangles_is_cut(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    assert _clusters(spark, pairs) == [[1, 2, 3], [4, 5, 6]]


def test_chain_middle_edge_is_cut(spark):
    # 1-2-3-4: the middle edge joins two endpoints that each have another
    # neighbor and closes no triangle → bridge
    assert _clusters(spark, [(1, 2), (2, 3), (3, 4)]) == [[1, 2], [3, 4]]


def test_isolated_pair_and_star_survive(spark):
    # isolated matched pair: both degrees 1 → kept; star center keeps all
    # leaves (each leaf edge has a degree-1 endpoint)
    assert _clusters(spark, [(7, 8)]) == [[7, 8]]
    assert _clusters(spark, [(1, 2), (1, 3), (1, 4)]) == [[1, 2, 3, 4]]
