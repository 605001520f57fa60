"""Jaro–Winkler kernel: bit-parity vs DuckDB's C++ implementation, vectors,
and batch-composition independence.

The driver query `jw_match_scores` hash-checks RAW doubles against DuckDB's
`jaro_winkler_similarity`, so the kernel must agree to the last bit — these
tests pin that (struct-packed comparison, not approx).
"""

from __future__ import annotations

import random
import struct

import duckdb
import numpy as np
import pytest

from levenshtein_spark.functions.jaro import batch_jaro_winkler, jaro_winkler_ref


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    yield con
    con.close()


def duck_jw(con, s1: str, s2: str) -> float:
    return con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
    ).fetchone()[0]


# (a, b, expected) — classic published vectors (Winkler's examples) plus the
# convention pins that distinguish the DuckDB/rapidfuzz variant.
VECTORS = [
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abc", "abc", 1.0),
    # both empty -> 0.0 (NOT 1.0): the DuckDB/rapidfuzz convention
    ("", "", 0.0),
    ("", "a", 0.0),
    ("a", "", 0.0),
    # jaro 2/3 <= 0.7: NO prefix boost even though 1 prefix char matches
    ("ab", "ac", 2.0 / 3.0),
    # adjacent transposition at len 2: the match window is max(2,2)//2-1 = 0,
    # so nothing matches — 0.0 (a known sharp edge of the Jaro window rule)
    ("ab", "ba", 0.0),
]


def test_vectors_scalar_and_batch(ddb):
    a = [v[0] for v in VECTORS]
    b = [v[1] for v in VECTORS]
    got = batch_jaro_winkler(a, b)
    for i, (s1, s2, exp) in enumerate(VECTORS):
        assert _bits(got[i]) == _bits(exp), (s1, s2, got[i], exp)
        assert _bits(jaro_winkler_ref(s1, s2)) == _bits(exp), (s1, s2)
        assert _bits(duck_jw(ddb, s1, s2)) == _bits(exp), (s1, s2)


def test_null_maps_to_empty():
    # reference NULL -> empty-string convention (src/prealgorithm.h:17-23)
    got = batch_jaro_winkler([None, "abc", None], ["abc", None, None])
    assert got.tolist() == [0.0, 0.0, 0.0]


def test_bytes_not_codepoints(ddb):
    # 'é' is two UTF-8 bytes; DuckDB compares bytes too
    cases = [("é", "e"), ("héllo", "hello"), ("日本語", "日本誤")]
    got = batch_jaro_winkler([c[0] for c in cases], [c[1] for c in cases])
    for i, (s1, s2) in enumerate(cases):
        assert _bits(got[i]) == _bits(duck_jw(ddb, s1, s2)), (s1, s2)


def test_differential_vs_duckdb_bitexact(ddb):
    rng = random.Random(2026)
    cases = []
    for alphabet, n, maxlen in [
        ("abcdefgh", 1500, 12),
        ("ab", 800, 6),  # dense matches, many transpositions
        ("abcdefghijklmnopqrstuvwxyz0123456789", 800, 40),
        ("ab", 200, 64),  # long dense strings, wide windows
    ]:
        for _ in range(n):
            cases.append(
                (
                    "".join(rng.choice(alphabet) for _ in range(rng.randint(0, maxlen))),
                    "".join(rng.choice(alphabet) for _ in range(rng.randint(0, maxlen))),
                )
            )
    a = [c[0] for c in cases]
    b = [c[1] for c in cases]
    got = batch_jaro_winkler(a, b)
    exp = ddb.execute(
        "SELECT jaro_winkler_similarity(a, b) FROM (SELECT unnest(?) AS a, unnest(?) AS b)",
        [a, b],
    ).fetchnumpy()
    exp = next(iter(exp.values()))
    assert got.shape == exp.shape
    neq = np.flatnonzero(got.view(np.int64) != np.asarray(exp).view(np.int64))
    assert neq.size == 0, [(a[i], b[i], got[i], exp[i]) for i in neq[:5]]


def test_batch_vs_scalar_reference():
    rng = random.Random(7)
    cases = [
        (
            "".join(rng.choice("abcd") for _ in range(rng.randint(0, 20))),
            "".join(rng.choice("abcd") for _ in range(rng.randint(0, 20))),
        )
        for _ in range(2000)
    ]
    got = batch_jaro_winkler([c[0] for c in cases], [c[1] for c in cases])
    for i, (s1, s2) in enumerate(cases):
        assert _bits(got[i]) == _bits(jaro_winkler_ref(s1, s2)), (s1, s2)


def test_batch_composition_independence():
    # result must not depend on which other pairs share the batch (padding /
    # chunking invariance)
    rng = random.Random(99)
    cases = [
        (
            "".join(rng.choice("abcdef") for _ in range(rng.randint(0, 30))),
            "".join(rng.choice("abcdef") for _ in range(rng.randint(0, 30))),
        )
        for _ in range(300)
    ]
    cases.append(("x" * 200, "x" * 199 + "y"))  # force a wide pad for everyone
    full = batch_jaro_winkler([c[0] for c in cases], [c[1] for c in cases])
    for i in range(0, len(cases), 97):
        single = batch_jaro_winkler([cases[i][0]], [cases[i][1]])
        assert _bits(full[i]) == _bits(single[0])


try:
    from hypothesis import given, settings, strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    @settings(max_examples=300, deadline=None)
    @given(a=st.text(min_size=0, max_size=30), b=st.text(min_size=0, max_size=30))
    def test_hypothesis_unicode_vs_duckdb(a, b):
        # DuckDB compares the UTF-8 bytes of the VARCHAR; so does the kernel
        con = duckdb.connect()
        try:
            exp = con.execute(
                "SELECT jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
        finally:
            con.close()
        got = batch_jaro_winkler([a], [b])[0]
        assert _bits(got) == _bits(exp), (a, b, got, exp)

    @settings(max_examples=300, deadline=None)
    @given(a=st.binary(min_size=0, max_size=40), b=st.binary(min_size=0, max_size=40))
    def test_hypothesis_bytes_vs_scalar_ref(a, b):
        # arbitrary bytes (incl. NULs / invalid UTF-8) can't ride a DuckDB
        # VARCHAR; differential vs the scalar transcription instead
        got = batch_jaro_winkler([a], [b])[0]
        assert _bits(got) == _bits(jaro_winkler_ref(a, b)), (a, b)


@pytest.mark.nightly
def test_nightly_differential_vs_duckdb(ddb):
    # reference-scale differential (mirrors the kernel nightly regime):
    # 10^5 seeded pairs across alphabet densities, bit-exact vs DuckDB
    rng = random.Random(424242)
    a, b = [], []
    for alphabet, n, maxlen in [
        ("abcdefgh", 40_000, 16),
        ("ab", 20_000, 10),
        ("abcdefghijklmnopqrstuvwxyz0123456789", 30_000, 48),
        ("ab", 10_000, 80),
    ]:
        for _ in range(n):
            a.append("".join(rng.choice(alphabet) for _ in range(rng.randint(0, maxlen))))
            b.append("".join(rng.choice(alphabet) for _ in range(rng.randint(0, maxlen))))
    got = batch_jaro_winkler(a, b)
    exp = ddb.execute(
        "SELECT jaro_winkler_similarity(a, b) FROM (SELECT unnest(?) AS a, unnest(?) AS b)",
        [a, b],
    ).fetchnumpy()
    exp = np.asarray(next(iter(exp.values())))
    neq = np.flatnonzero(got.view(np.int64) != exp.view(np.int64))
    assert neq.size == 0, [(a[i], b[i], got[i], exp[i]) for i in neq[:5]]


def test_udf_parity(spark):
    import pyspark.sql.functions as F

    from levenshtein_spark.functions.distance import jaro_winkler

    rows = [("martha", "marhta"), ("dixon", "dicksonx"), ("", ""), ("é", "e"), (None, "abc")]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["jw"]
        for r in df.select("a", "b", jaro_winkler("a", "b").alias("jw")).collect()
    }
    exp = batch_jaro_winkler([r[0] for r in rows], [r[1] for r in rows])
    for i, r in enumerate(rows):
        assert _bits(got[r]) == _bits(exp[i]), r
