"""Smith–Waterman kernel: vectors, differential vs the scalar reference,
the DuckDB recursive-CTE twin, and batch-composition independence.

The driver query `er_smith_waterman` hash-checks integer scores against
`oracles.sw_cte`, so the NumPy kernel, the scalar reference, and the CTE
must agree exactly — these tests pin all three against each other.
"""

from __future__ import annotations

import random
import string

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levenshtein_spark.functions.align import (
    SW_GAP,
    SW_MATCH,
    SW_MISMATCH,
    batch_smith_waterman,
    smith_waterman_ref,
)
from levenshtein_spark.oracles import sw_cte

# (a, b, expected score at match+2 / mismatch-1 / gap-1)
VECTORS = [
    ("", "", 0),
    ("", "abc", 0),
    (None, "abc", 0),          # NULL → empty (src/prealgorithm.h:17-23)
    ("abc", "abc", 6),         # 3 matches
    ("abc", "xbz", 2),         # single shared byte
    ("abc", "xyz", 0),         # nothing shared
    ("xxabcdxx", "yyabcdyy", 8),   # shared region, unshared flanks free
    ("abcdef", "abXdef", 9),       # 5 matches + 1 interior mismatch = 10 - 1
    ("ab", "ba", 2),           # best single match; no transposition concept
    ("aaaa", "aa", 4),
    ("é", "é", 4),             # 2 matching BYTES (byte semantics)
    ("é", "e", 0),             # no shared byte
]


@pytest.mark.parametrize("a,b,exp", VECTORS)
def test_vectors_ref(a, b, exp):
    assert smith_waterman_ref(a, b) == exp, (a, b, exp)
    assert batch_smith_waterman([a], [b])[0] == exp, (a, b, exp)


def test_scoring_constants_pinned():
    # the CTE and the driver oracle embed these; changing them must be loud
    assert (SW_MATCH, SW_MISMATCH, SW_GAP) == (2, 1, 1)


def _rand_pairs(n, alpha, max_len, seed):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        a = "".join(rng.choices(alpha, k=rng.randint(0, max_len)))
        b = "".join(rng.choices(alpha, k=rng.randint(0, max_len)))
        out.append((a, b))
    return out


def test_batch_matches_ref_random():
    pairs = _rand_pairs(4000, string.ascii_lowercase[:6], 30, seed=3)
    got = batch_smith_waterman([a for a, _ in pairs], [b for _, b in pairs])
    exp = np.array([smith_waterman_ref(a, b) for a, b in pairs])
    assert (got == exp).all()


def test_batch_matches_ref_similar_strings():
    # near-duplicates: long shared regions exercise the scan path hardest
    rng = random.Random(9)
    pairs = []
    for _ in range(500):
        a = "".join(rng.choices(string.ascii_lowercase, k=rng.randint(5, 40)))
        b = list(a)
        for _ in range(rng.randint(0, 4)):
            op = rng.choice("ids")
            pos = rng.randrange(max(len(b), 1))
            if op == "i":
                b.insert(pos, rng.choice(string.ascii_lowercase))
            elif op == "d" and b:
                del b[pos]
            elif b:
                b[pos] = rng.choice(string.ascii_lowercase)
        pairs.append((a, "".join(b)))
    got = batch_smith_waterman([a for a, _ in pairs], [b for _, b in pairs])
    exp = np.array([smith_waterman_ref(a, b) for a, b in pairs])
    assert (got == exp).all()


def test_batch_composition_independence():
    # same pairs, different batch split points → identical scores
    pairs = _rand_pairs(300, string.ascii_lowercase[:4], 20, seed=5)
    whole = batch_smith_waterman([a for a, _ in pairs], [b for _, b in pairs])
    parts = np.concatenate(
        [
            batch_smith_waterman([a for a, _ in pairs[i : i + 77]],
                                 [b for _, b in pairs[i : i + 77]])
            for i in range(0, len(pairs), 77)
        ]
    )
    assert (whole == parts).all()


@given(
    st.text(alphabet=string.printable, max_size=24),
    st.text(alphabet=string.printable, max_size=24),
)
@settings(max_examples=200, deadline=None)
def test_hypothesis_batch_vs_ref(a, b):
    got = batch_smith_waterman([a], [b])[0]
    assert got == smith_waterman_ref(a, b)


def test_bytes_not_codepoints():
    # 'é' = 2 UTF-8 bytes: self-match scores 4, and shares byte 0xc3 with 'ü'
    assert smith_waterman_ref("é", "é") == 4
    assert smith_waterman_ref("é", "ü") == 2
    assert batch_smith_waterman(["é"], ["ü"])[0] == 2


def test_cte_matches_kernel():
    pairs = _rand_pairs(150, string.ascii_lowercase[:8], 16, seed=7)
    vals = ", ".join(
        f"({i}, '{a}', '{b}')" for i, (a, b) in enumerate(pairs)
    )
    sql = (
        f"WITH RECURSIVE {sw_cte(f'SELECT * FROM (VALUES {vals}) AS v(pid, s1, s2)')} "
        "SELECT pid, sw FROM sw_result ORDER BY pid"
    )
    got = {pid: sw for pid, sw in duckdb.sql(sql).fetchall()}
    for i, (a, b) in enumerate(pairs):
        assert got[i] == smith_waterman_ref(a, b), (a, b)


def test_sql_registration(spark):
    from levenshtein_spark.functions.register import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT smith_waterman('xxabcdxx', 'yyabcdyy') AS sw"
    ).collect()[0]
    assert row.sw == 8


def test_area_budget_chunking_one_giant_string():
    # one long value among many short ones must not inflate the whole
    # chunk's scratch to rows x giant (area-budget chunking isolates it),
    # and every score stays exact. The giant pair's best local alignment is
    # the planted 'needle' (the x/y runs share no byte): score 2·6 = 12 —
    # known analytically, since the O(n·m) scalar reference is infeasible
    # at this size.
    a = ["ab" * 3 for _ in range(500)]
    b = ["ba" * 3 for _ in range(500)]
    a[250] = "x" * 30_000 + "needle"
    b[250] = "y" * 20_000 + "needle"
    got = batch_smith_waterman(a, b)
    assert got[250] == 12
    for i in (0, 123, 249, 251, 499):
        assert got[i] == smith_waterman_ref(a[i], b[i])
