"""Pin common prefix/suffix trimming (reference prealgorithm.h:29-57 role).

Trimming is a pure optimization: OSA and Levenshtein are invariant under
removing a shared prefix and suffix. The exhaustive test proves it on the
complete pair space of a small alphabet (3969 pairs, every cap), which covers
every boundary interaction a transposition can have with a trimmed edge.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from levenshtein_spark.kernel import batch_edit_distance
from levenshtein_spark.oracle import ref_edit_distance

STRINGS = [""] + [
    "".join(t) for L in range(1, 6) for t in itertools.product("ab", repeat=L)
]


@pytest.mark.parametrize("transpositions", [True, False])
@pytest.mark.parametrize("k", [None, 1, 2, 4])
def test_exhaustive_small_alphabet(transpositions, k):
    a, b = zip(*itertools.product(STRINGS, STRINGS))
    got = batch_edit_distance(list(a), list(b), k=k, transpositions=transpositions)
    exp = [ref_edit_distance(x, y, k=k, transpositions=transpositions) for x, y in zip(a, b)]
    assert got.tolist() == exp


def test_long_near_duplicates_trim_to_core():
    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefg"))
    base = ["".join(rng.choice(letters, 500)) for _ in range(200)]
    mutated = [s[:250] + "zz" + s[252:] for s in base]
    d = batch_edit_distance(base, mutated, k=8)
    assert (d == 2).all()


def test_subject_prefix_of_query():
    # full-prefix trim leaves an empty subject; distance = remaining length,
    # capped by k_eff + 1
    assert batch_edit_distance(["abc"], ["abcdefgh"], k=3)[0] == 4
    assert batch_edit_distance(["abc"], ["abcde"], k=3)[0] == 2
    assert batch_edit_distance(["abc"], ["abc"], k=0)[0] == 0


def test_iterative_doubling_unbounded_long_strings():
    # unbounded distances on strings long enough to force cap escalation
    # (16 -> 64 -> ...) must equal the full-matrix oracle
    rng = np.random.default_rng(11)
    letters = np.array(list("abcde"))
    pairs = []
    for i in range(60):
        a = "".join(rng.choice(letters, int(rng.integers(30, 120))))
        b = "".join(rng.choice(letters, int(rng.integers(30, 120))))
        pairs.append((a, b))
    # plus heavy-edit mutations (true distance ~20-50, crosses 16)
    for i in range(40):
        a = "".join(rng.choice(letters, 100))
        bl = list(a)
        for _ in range(int(rng.integers(17, 50))):
            p = int(rng.integers(0, len(bl)))
            bl[p] = letters[int(rng.integers(0, 5))]
        pairs.append((a, "".join(bl)))
    A = [p[0] for p in pairs]
    B = [p[1] for p in pairs]
    for trans in (True, False):
        got = batch_edit_distance(A, B, k=None, transpositions=trans)
        exp = [ref_edit_distance(a, b, k=None, transpositions=trans) for a, b in pairs]
        assert got.tolist() == exp
