"""cluster_quality + blocking_window_curve: independent recomputation.

The strict gate hash-checks both queries against their DuckDB twins; these
tests are the third derivation — collect the underlying labelings / pair
censuses from the Spark side and recompute every metric in pure Python
(math.log / exact integer counting), requiring agreement at the query's own
rounding. Plus structural invariants that hold for ANY corpus.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def labelings(spark):
    from levenshtein_spark.driver_queries.er_clustering import _labels_pred_gold

    rows = _labels_pred_gold(spark, SF).collect()
    assert rows
    return [(r["p"], r["g"]) for r in rows]


@pytest.fixture(scope="module")
def quality_row(spark):
    from levenshtein_spark.driver_queries.er_clustering import q_cluster_quality

    rows = q_cluster_quality(spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def _pairs2(n: int) -> float:
    return n * (n - 1) / 2.0


def test_quality_vs_python(labelings, quality_row):
    n = len(labelings)
    cells = Counter(labelings)
    psz = Counter(p for p, _ in labelings)
    gsz = Counter(g for _, g in labelings)

    sum_pairs = sum(_pairs2(c) for c in cells.values())
    sum_a = sum(_pairs2(c) for c in psz.values())
    sum_b = sum(_pairs2(c) for c in gsz.values())
    npairs = _pairs2(n)
    exp = sum_a * sum_b / npairs
    den = 0.5 * (sum_a + sum_b) - exp
    ari = 1.0 if den == 0 else (sum_pairs - exp) / den

    mi = sum(
        (c / n) * math.log(c * n / (psz[p] * gsz[g]))
        for (p, g), c in cells.items()
    )
    hp = -sum((c / n) * math.log(c / n) for c in psz.values())
    hg = -sum((c / n) * math.log(c / n) for c in gsz.values())
    nmi = 1.0 if hp == 0 and hg == 0 else (0.0 if hp == 0 or hg == 0 else mi / math.sqrt(hp * hg))
    vi = hp + hg - 2 * mi
    hom = 1.0 if hg == 0 else mi / hg
    com = 1.0 if hp == 0 else mi / hp
    v = 0.0 if hom + com == 0 else 2 * hom * com / (hom + com)

    r = quality_row
    assert r["n_records"] == n
    assert r["n_pred_clusters"] == len(psz)
    assert r["n_gold_clusters"] == len(gsz)
    # the query rounds to 6; allow 1 ulp of the rounding grid for the
    # engine-vs-Python summation-order difference
    for name, ref in [
        ("ari", ari), ("nmi", nmi), ("vi", vi),
        ("homogeneity", hom), ("completeness", com), ("v_measure", v),
    ]:
        assert abs(r[name] - round(ref, 6)) <= 1e-6, (name, r[name], ref)


def test_quality_invariants(quality_row):
    r = quality_row
    # SNM-closure labels are a refinement path of gold: metrics in range
    assert -0.5 <= r["ari"] <= 1.0
    assert 0.0 <= r["nmi"] <= 1.0 + 1e-9
    assert r["vi"] >= -1e-9
    assert 0.0 <= r["homogeneity"] <= 1.0 + 1e-9
    assert 0.0 <= r["completeness"] <= 1.0 + 1e-9
    # the SNM predictor edge set is a SUBSET of gold edges, so pred is a
    # refinement of gold -> every pred cluster is pure -> homogeneity 1
    assert r["homogeneity"] == pytest.approx(1.0, abs=1e-6)
    # v-measure is the harmonic mean of the two
    h, c = r["homogeneity"], r["completeness"]
    assert r["v_measure"] == pytest.approx(round(2 * h * c / (h + c), 6), abs=2e-6)


@pytest.fixture(scope="module")
def window_curve(spark):
    from levenshtein_spark.driver_queries.er_curve import q_blocking_window_curve

    rows = q_blocking_window_curve(spark, SF).collect()
    assert rows
    return sorted(rows, key=lambda r: r["window"])


def test_window_curve_vs_python(spark, window_curve):
    """Recompute the sweep from scratch: rank rows in pure Python with the
    same (name, id) total order, census gaps, join the gold edges collected
    from the Spark side."""
    import pyspark.sql.functions as F

    from levenshtein_spark.driver_queries import tbl
    from levenshtein_spark.driver_queries.er_eval import _gold_edges

    recs = sorted(
        (r["c_name"], int(r["c_custkey"]))
        for r in tbl(spark, SF, "customer").select("c_name", "c_custkey").collect()
    )
    pos = {cid: i for i, (_, cid) in enumerate(recs)}
    gold = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in _gold_edges(spark, SF).collect()
    }
    n = len(recs)
    by_gap_n, by_gap_tp = Counter(), Counter()
    order = [cid for _, cid in recs]
    for i in range(n):
        for g in range(1, 20):
            if i + g >= n:
                break
            a, b = order[i], order[i + g]
            by_gap_n[g] += 1
            by_gap_tp[g] += (min(a, b), max(a, b)) in gold
    cn = ct = 0
    expect = {}
    for g in range(1, 20):
        cn += by_gap_n[g]
        ct += by_gap_tp[g]
        expect[g + 1] = (cn, ct)
    assert len(window_curve) == 19
    for r in window_curve:
        en, et = expect[r["window"]]
        assert (r["n_candidates"], r["tp"]) == (en, et), r["window"]
        assert r["n_gold"] == len(gold)
        assert r["pairs_completeness"] == pytest.approx(round(et / len(gold), 6), abs=1e-9)
        assert r["pairs_quality"] == pytest.approx(round(et / en, 6), abs=1e-9)
        assert r["reduction_ratio"] == pytest.approx(
            round(1.0 - en / (n * (n - 1) / 2.0), 6), abs=1e-9
        )


def test_window_curve_invariants(window_curve):
    prev = None
    for r in window_curve:
        if prev is not None:
            assert r["n_candidates"] > prev["n_candidates"]
            assert r["tp"] >= prev["tp"]
            assert r["pairs_completeness"] >= prev["pairs_completeness"]
            assert r["reduction_ratio"] < prev["reduction_ratio"]
        prev = r


def test_threshold_sweep_monotone(spark):
    from levenshtein_spark.driver_queries.er_clustering import q_cluster_threshold_sweep

    rows = sorted(q_cluster_threshold_sweep(spark, SF).collect(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [0, 1, 2, 3]
    prev = None
    for r in rows:
        assert r["n_clusters"] >= 1 and r["max_size"] >= 1
        if prev is not None:
            # nested edge sets -> coarsening partitions
            assert r["n_edges"] >= prev["n_edges"]
            assert r["n_clusters"] <= prev["n_clusters"]
            assert r["max_size"] >= prev["max_size"]
            assert r["n_singletons"] <= prev["n_singletons"]
        prev = r
    # k=0 edges are exact-name duplicates within nation; clusters can't
    # exceed record count and the sweep must actually move at some level
    assert rows[0]["n_clusters"] >= rows[-1]["n_clusters"]


def test_dedup_canonical_pivot_invariants(spark):
    """Every non-canonical doc must be VERIFIED similar to its canonical
    (radius-1 property) — the exact guarantee the closure collapse lacks —
    and the label set must be a subset-coarsening of the closure's."""
    from levenshtein_spark.driver_queries.dedup import (
        _CANON_J,
        q_dedup_canonical,
        q_dedup_canonical_pivot,
        q_dedup_minhash,
    )

    edges = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in q_dedup_minhash(spark, SF).collect()
        if r["jaccard"] >= _CANON_J
    }
    pv = {r["doc_id"]: r["canonical_id"] for r in q_dedup_canonical_pivot(spark, SF).collect()}
    cc = {r["doc_id"]: r["canonical_id"] for r in q_dedup_canonical(spark, SF).collect()}
    assert set(pv) == set(cc)
    for d, c in pv.items():
        if d != c:
            assert (min(d, c), max(d, c)) in edges, (d, c)
    # pivot refines the closure: docs sharing a pivot canonical share a
    # closure component (pivot clusters never span components)
    for d, c in pv.items():
        assert cc[d] == cc[c], (d, c)
