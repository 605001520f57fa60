"""Randomized differential tests: batch kernel == full-matrix oracle.

Mirrors the reference's property harness (tests/unittests.cpp:186-278 with
cap 25; tests/comparetests.cpp:216-269 per-edit-type sweeps) at pytest-friendly
scale (FIXTURES.md §4).
"""

import numpy as np
import pytest

from levenshtein_spark.kernel import batch_edit_distance, batch_similarity
from levenshtein_spark.oracle import ref_edit_distance, ref_similarity

from tests.gen import EDIT_TYPES, apply_edits, random_affixed_pair, random_word

CAPS = [2, 5, 16, 25, None]


def _pairs(seed: int, n: int, kind=None, word_len=20):
    rng = np.random.default_rng(seed)
    return [random_affixed_pair(rng, word_len=word_len, kind=kind) for _ in range(n)]


@pytest.mark.parametrize("kind", EDIT_TYPES)
@pytest.mark.parametrize("k", CAPS)
def test_differential_per_edit_type(kind, k):
    pairs = _pairs(seed=hash((kind, k)) % 2**32, n=400, kind=kind)
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = batch_edit_distance(a, b, k=k)
    exp = np.array([ref_edit_distance(x, y, k) for x, y in pairs])
    bad = np.flatnonzero(got != exp)
    assert bad.size == 0, [(a[i], b[i], k, got[i], exp[i]) for i in bad[:5]]


@pytest.mark.parametrize("k", [2, 5, None])
def test_differential_no_transpositions(k):
    pairs = _pairs(seed=77, n=400)
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = batch_edit_distance(a, b, k=k, transpositions=False)
    exp = np.array([ref_edit_distance(x, y, k, transpositions=False) for x, y in pairs])
    assert (got == exp).all()


def test_differential_mixed_lengths_and_nulls():
    rng = np.random.default_rng(42)
    a, b, ks = [], [], []
    for _ in range(600):
        la = int(rng.integers(0, 40))
        lb = int(rng.integers(0, 40))
        x = random_word(rng, la) if rng.random() > 0.05 else None
        y = random_word(rng, lb) if rng.random() > 0.05 else None
        a.append(x)
        b.append(y)
        ks.append(int(rng.integers(0, 8)) if rng.random() > 0.2 else -1)
    got = batch_edit_distance(a, b, k=ks)
    exp = np.array(
        [ref_edit_distance(x, y, None if kk < 0 else kk) for x, y, kk in zip(a, b, ks)]
    )
    bad = np.flatnonzero(got != exp)
    assert bad.size == 0, [(a[i], b[i], ks[i], got[i], exp[i]) for i in bad[:5]]


def test_differential_long_strings():
    rng = np.random.default_rng(7)
    a, b = [], []
    for _ in range(40):
        base = random_word(rng, int(rng.integers(200, 600)))
        kind = EDIT_TYPES[int(rng.integers(0, 4))]
        a.append(base)
        b.append(apply_edits(rng, base, int(rng.integers(1, 6)), kind))
    for k in (4, 16):
        got = batch_edit_distance(a, b, k=k)
        exp = np.array([ref_edit_distance(x, y, k) for x, y in zip(a, b)])
        assert (got == exp).all()


def test_symmetry():
    pairs = _pairs(seed=11, n=200)
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    assert (batch_edit_distance(a, b, k=5) == batch_edit_distance(b, a, k=5)).all()


def test_similarity_differential():
    rng = np.random.default_rng(13)
    pairs = _pairs(seed=13, n=300)
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    for p_thr in (0.3, 0.7, 0.9):
        got = batch_similarity(a, b, p_thr)
        exp = np.array([ref_similarity(x, y, p_thr) for x, y in pairs])
        assert np.allclose(got, exp, atol=1e-12)
