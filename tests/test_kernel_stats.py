"""Kernel instrumentation (reference CAPTURE_METRICS analogue,
tests/metrics.hpp:8-17) and the histogram pass's cell-budget chunking."""

from __future__ import annotations

import numpy as np

from levenshtein_spark import kernel as K


def _with_stats(a, b, k):
    K.enable_stats(True)
    try:
        out = K.batch_edit_distance(a, b, k=k)
        return out, K.stats_snapshot()
    finally:
        K.enable_stats(False)


def test_counters_attribute_every_pair():
    a = [None, "", "abcdef", "same", "abc", "k" * 30]
    b = ["x", "abc", "a", "same", "abd", "q" * 30]
    out, s = _with_stats(a, b, 2)
    assert out.tolist() == [1, 3, 3, 0, 1, 3]
    assert s["pairs"] == 6
    assert s["exit_null"] == 1
    assert s["exit_empty"] == 1
    assert s["exit_ldiff"] == 1
    assert s["exit_identical"] == 1
    # 'abc'/'abd' trims to 'c'/'d' (1+1 <= 2k: histogram skipped), DP runs;
    # 'k'*30/'q'*30 has disjoint histograms -> counting-bound kill, no DP
    assert s["hist_kills"] == 1
    assert s["dp_pairs"] == 1
    assert s["dp_cells"] > 0


def test_stats_off_by_default_and_reset():
    K.enable_stats(True)
    K.batch_edit_distance(["a"], ["b"], k=1)
    K.enable_stats(False)
    before = K.stats_snapshot()
    assert before["pairs"] == 0  # enable/disable resets
    K.batch_edit_distance(["a"], ["b"], k=1)
    assert K.stats_snapshot()["pairs"] == 0  # off: no counting


def test_histogram_cell_budget_long_strings():
    """Long-string pairs must flow through the counting bound in bounded
    temporary memory (ADVICE r01: the old fixed 8192-row chunk allocated
    rows x len bytes). Mixed lengths exercise the width-sorted chunking."""
    rng = np.random.default_rng(3)
    long_a, long_b = [], []
    for i in range(50):
        n = int(rng.integers(10_000, 120_000))
        s = bytes(rng.integers(97, 123, n, dtype=np.uint8))
        # disjoint alphabet partner -> histogram kill at k=4
        t = bytes(rng.integers(65, 91, n, dtype=np.uint8))
        long_a.append(s)
        long_b.append(t)
    short = [("abc", "abd")] * 10
    a = long_a + [x for x, _ in short]
    b = long_b + [y for _, y in short]
    out, s = _with_stats(a, b, 4)
    assert (out[:50] == 5).all()  # k_eff+1 for every disjoint long pair
    assert (out[50:] == 1).all()
    assert s["hist_kills"] == 50
    assert s["dp_pairs"] == 10
