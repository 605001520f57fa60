"""Realistic-corpus closest-match differential — default-gate size.

The reference's taxanames workload (``tests/taxanames``, 111,065 binomial
names driven through closest-match queries in ``unittests.cpp:164-184``)
runs at full scale in the nightly suite
(tests/test_kernel_nightly.py::test_realistic_corpus_closest_match). This
is the SAME differential at ~10k names so the realistic-corpus shape —
letter-frequency binomials, mangled probes, oracle-verified winners — is
exercised on every default ``pytest`` run, not just nightly (VERDICT r04
item 5).
"""

from __future__ import annotations

import numpy as np

from levenshtein_spark.kernel import batch_edit_distance
from levenshtein_spark.oracle import ref_edit_distance

from tests.gen import EDIT_TYPES, apply_edits, binomial_corpus

N_CORPUS = 10_000
N_PROBES = 20
K = 5


def test_corpus_closest_match_small():
    """Mangled probes recover their planted source within the edit budget,
    and every winner (plus a random sample) matches the scalar full-matrix
    oracle."""
    rng = np.random.default_rng(2024)
    corpus = binomial_corpus(rng, N_CORPUS)
    src_idx = rng.choice(len(corpus), N_PROBES, replace=False)
    probes = []
    for si in src_idx:
        name = corpus[si].decode()
        kind = EDIT_TYPES[int(rng.integers(0, 4))]
        n_edits = int(rng.integers(1, 4))
        probes.append((apply_edits(rng, name, n_edits, kind).encode(), si, n_edits))

    for probe, si, n_edits in probes:
        dists = batch_edit_distance([probe] * len(corpus), corpus, k=K)
        best = int(dists.min())
        # planted source is reachable within its edit budget
        d_src = int(dists[si])
        assert d_src <= min(n_edits, K + 1)
        assert best <= d_src
        # verify every candidate at the winning distance, plus a sample,
        # against the scalar full-matrix oracle
        winners = np.flatnonzero(dists == best)[:50]
        sample = rng.choice(len(corpus), 25, replace=False)
        for ci in np.concatenate([winners, sample]):
            assert int(dists[ci]) == ref_edit_distance(probe, corpus[ci], K)
