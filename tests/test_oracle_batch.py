"""Pin the batch-vectorized nightly oracle against the scalar Python oracle.

The nightly differentials (test_kernel_nightly.py) trust tests/oracle_batch
as their reference; this fast suite proves it agrees with the independently
written scalar oracle (levenshtein_spark/oracle.py, itself a port of the
reference's edit_dist_t_2d) on an exhaustive small-alphabet universe and on
random longer pairs, for both OSA and plain Levenshtein and for the bounded
convention at several caps.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from levenshtein_spark.oracle import levenshtein_matrix, osa_matrix, ref_edit_distance

from tests.oracle_batch import batch_osa_full, ref_batch


@pytest.fixture(scope="module")
def exhaustive_pairs():
    words = [
        bytes(w) for L in range(0, 5) for w in itertools.product(b"ab", repeat=L)
    ]
    pairs = [(x, y) for x in words for y in words]
    return [p[0] for p in pairs], [p[1] for p in pairs]


def test_exhaustive_osa(exhaustive_pairs):
    a, b = exhaustive_pairs
    got = batch_osa_full(a, b, transpositions=True)
    exp = np.array([osa_matrix(x, y) for x, y in zip(a, b)])
    assert (got == exp).all()


def test_exhaustive_levenshtein(exhaustive_pairs):
    a, b = exhaustive_pairs
    got = batch_osa_full(a, b, transpositions=False)
    exp = np.array([levenshtein_matrix(x, y) for x, y in zip(a, b)])
    assert (got == exp).all()


@pytest.mark.parametrize("k", [0, 1, 2, 5, None])
def test_bounded_convention(exhaustive_pairs, k):
    a, b = exhaustive_pairs
    got = ref_batch(a, b, k)
    exp = np.array([ref_edit_distance(x, y, k) for x, y in zip(a, b)])
    assert (got == exp).all()


def test_random_longer_pairs():
    rng = np.random.default_rng(5)
    a = [bytes(rng.integers(97, 102, int(rng.integers(0, 40)), dtype=np.uint8)) for _ in range(300)]
    b = [bytes(rng.integers(97, 102, int(rng.integers(0, 40)), dtype=np.uint8)) for _ in range(300)]
    got = batch_osa_full(a, b, transpositions=True)
    exp = np.array([osa_matrix(x, y) for x, y in zip(a, b)])
    assert (got == exp).all()
    # OSA-not-DL pin rides along (unittests.cpp / SURVEY §2.2 item 1)
    assert batch_osa_full([b"CA"], [b"ABC"])[0] == 3
