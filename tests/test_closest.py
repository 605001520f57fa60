"""Closest-match operators: arg-min aggregation + iterative deepening."""

from __future__ import annotations

from levenshtein_spark.operators.closest import (
    min_edit_dist_t,
    min_edit_dist_t_deepening,
    min_similarity_t,
    top_k_matches,
)


def _fixtures(spark):
    cands = spark.createDataFrame(
        [("apple",), ("apples",), ("orange",), ("grape",), ("grapefruit",)],
        "name string",
    )
    probes = spark.createDataFrame([("appl",), ("grap",), ("zzzzzzzz",)], "q string")
    return probes, cands


def test_min_edit_dist_t_matches_bruteforce(spark):
    probes, cands = _fixtures(spark)
    got = {r.q: (r.name, r.dist) for r in min_edit_dist_t(probes, cands, "q", "name", 6).collect()}
    assert got["appl"] == ("apple", 1)
    assert got["grap"] == ("grape", 1)
    # zzzzzzzz: every candidate > 6 edits away -> k_eff+1 with name-asc tie
    assert got["zzzzzzzz"][1] == 7


def test_deepening_equals_single_pass(spark):
    probes, cands = _fixtures(spark)
    single = {tuple(r) for r in min_edit_dist_t(probes, cands, "q", "name", 6).collect()}
    deep = {tuple(r) for r in min_edit_dist_t_deepening(probes, cands, "q", "name", 6, k0=1).collect()}
    assert single == deep


def test_min_similarity_t_argmax(spark):
    probes, cands = _fixtures(spark)
    got = {r.q: r.name for r in min_similarity_t(probes, cands, "q", "name", 0.3).collect()}
    assert got["appl"] == "apple"
    assert got["grap"] == "grape"


def test_top_k_matches_ranked(spark):
    probes, cands = _fixtures(spark)
    rows = top_k_matches(probes, cands, "q", "name", 6, top=2).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.q, []).append((r.rn, r.name))
    assert sorted(by_probe["appl"]) == [(1, "apple"), (2, "apples")]
    assert len(by_probe["grap"]) == 2
