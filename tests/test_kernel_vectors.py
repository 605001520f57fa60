"""Fixed kernel test vectors (FIXTURES.md §1) pinning reference semantics.

Every row pins a clause of SURVEY.md §2.2 against the reference sources
(src/edit_dist_t_2d.cpp, src/bounded_edit_dist_t.cpp, src/prealgorithm.h,
src/similarity_t.cpp, ReadMe.md:50-53).
"""

import numpy as np
import pytest

from levenshtein_spark.kernel import batch_edit_distance, batch_similarity
from levenshtein_spark.oracle import ref_edit_distance, ref_similarity

# (a, b, k, expected, note) — k=None means unbounded; OSA over UTF-8 bytes.
VECTORS = [
    ("test", "test", None, 0, "identity"),
    ("string", "strlng", None, 1, "substitution (doc/Testing.md:73)"),
    ("string", "stirng", None, 1, "adjacent transposition counts as 1"),
    ("ab", "ba", None, 1, "minimal transposition"),
    ("CA", "ABC", None, 3, "OSA pin: unrestricted DL would give 2"),
    ("kitten", "sitting", None, 3, "classic"),
    ("", "abc", None, 3, "empty string"),
    (None, "abc", None, 3, "NULL treated as empty (prealgorithm.h:17-23)"),
    ("abc", None, None, 3, "symmetric NULL"),
    (None, None, None, 0, "both NULL"),
    ("kitten", "sitting", 3, 3, "bounded, dist == k -> exact value"),
    ("kitten", "sitting", 2, 3, "bounded, dist > k -> k+1"),
    ("abcdef", "uvwxyz", 3, 4, "bounded, far apart -> k+1"),
    ("a", "abcdefg", 3, 4, "length-diff early exit (prealgorithm.h:77-86)"),
    ("", "abcdefg", 3, 7, "empty exit BYPASSES cap (prealgorithm.h:69-75)"),
    (None, "abcdefg", 3, 7, "NULL exit BYPASSES cap (prealgorithm.h:17-23)"),
    ("é", "e", None, 2, "byte pin: é is 2 UTF-8 bytes (ReadMe.md:50-51)"),
    ("Case", "case", None, 1, "case-sensitive (ReadMe.md:52-53)"),
    ("abc", "abc", 0, 0, "k=0 identical"),
    ("abc", "abd", 0, 1, "k=0 different -> k+1"),
    ("ab", "ba", 10, 1, "cap clamped to max(len)=2; dist 1 unaffected"),
    ("abcd", "badc", None, 2, "two disjoint transpositions"),
    ("abcd", "badc", 1, 2, "bounded k=1 -> k+1=2"),
    ("xxxkitten", "xxxsitting", None, 3, "common prefix"),
    ("kittenyyy", "sittingyyy", None, 3, "common suffix"),
]


@pytest.mark.parametrize("a,b,k,expected,note", VECTORS, ids=[v[4] for v in VECTORS])
def test_vector_osa(a, b, k, expected, note):
    got = batch_edit_distance([a], [b], k=None if k is None else [k])[0]
    assert got == expected, note
    assert ref_edit_distance(a, b, k) == expected, "oracle disagrees: " + note


def test_batch_mixed_vector():
    a = [v[0] for v in VECTORS]
    b = [v[1] for v in VECTORS]
    k = [v[2] for v in VECTORS]
    exp = np.array([v[3] for v in VECTORS])
    got = batch_edit_distance(a, b, k=[(-1 if x is None else x) for x in k])
    assert (got == exp).all(), list(zip(a, b, k, got, exp))


def test_levenshtein_variant_no_transpositions():
    # edit_dist / bounded_edit_dist: transposition costs 2 (sub+sub or ins+del)
    assert batch_edit_distance(["ab"], ["ba"], transpositions=False)[0] == 2
    assert batch_edit_distance(["string"], ["stirng"], transpositions=False)[0] == 2
    assert batch_edit_distance(["kitten"], ["sitting"], transpositions=False)[0] == 3
    assert batch_edit_distance(["CA"], ["ABC"], transpositions=False)[0] == 3


def test_negative_k_raises():
    with pytest.raises(ValueError):
        ref_edit_distance("a", "b", -2)


SIM_VECTORS = [
    ("kitten", "sitting", 0.5, 1.0 - 3.0 / 7.0),
    ("test", "test", 0.9, 1.0),
    ("", "", 0.5, 1.0),
]


@pytest.mark.parametrize("a,b,p,expected", SIM_VECTORS)
def test_similarity_vectors(a, b, p, expected):
    got = batch_similarity([a], [b], p)[0]
    assert got == pytest.approx(expected, abs=1e-12)
    assert ref_similarity(a, b, p) == pytest.approx(expected, abs=1e-12)


def test_similarity_floor_below_threshold():
    # Far-apart pair must classify below p; exact value is the documented floor.
    # p=0.75 is exactly representable, so kmax = int(0.25*10) = 2 without the
    # double-truncation surprise (which the reference shares: similarity_t.cpp:56-58).
    p = 0.75
    got = batch_similarity(["abcdefghij"], ["qrstuvwxyz"], p)[0]
    assert got < p
    m, kmax = 10, int((1 - p) * 10)
    assert got == pytest.approx(max(0.0, 1.0 - (kmax + 1) / m))


def test_similarity_float_truncation_matches_reference_cast():
    # int((1.0-0.8)*10) == 1 in both C and Python double math; the floor is
    # then 1 - 2/10 = 0.8 == p, and the reference would return exactly p.
    got = batch_similarity(["abcdefghij"], ["qrstuvwxyz"], 0.8)[0]
    assert got == pytest.approx(0.8)


def test_similarity_validates_p():
    with pytest.raises(ValueError):
        batch_similarity(["a"], ["b"], 1.5)
