"""Privacy-preserving record linkage (driver_queries.er_eval.pprl_encode):
the CLK encode path pinned bit-for-bit against an independent pure-Python
recomputation, plus the Dice-ranking property the matcher relies on."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from levenshtein_spark.driver_queries.er_eval import (
    _PPRL_K,
    _PPRL_WORD,
    _PPRL_WORDS,
    pprl_encode,
)


def _py_clk(name: str) -> list[int]:
    """Independent recomputation: md5('h|bg') hex prefix(15) as int,
    mod 126 → (word, bit)."""
    words = [0] * _PPRL_WORDS
    m = _PPRL_WORD * _PPRL_WORDS
    for i in range(len(name) - 1):
        bg = name[i : i + 2]
        for h in range(_PPRL_K):
            v = int(hashlib.md5(f"{h}|{bg}".encode()).hexdigest()[:15], 16) % m
            words[v // _PPRL_WORD] |= 1 << (v % _PPRL_WORD)
    return words


def _encode(spark, names):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string"
    )
    rows = pprl_encode(df).orderBy("id").collect()
    return {r["id"]: [r[f"bloom{j}"] for j in range(_PPRL_WORDS)] for r in rows}


def test_clk_bits_match_python_recomputation(spark):
    names = ["Customer#000000001", "ab", "xyzzy plugh"]
    got = _encode(spark, names)
    assert got == {i: _py_clk(n) for i, n in enumerate(names)}


def test_bigramless_name_has_no_encoding(spark):
    """A 1-char name has no bigram, so it carries NO encoding row (it can
    never match) — also guards the Spark sequence(1, 0) descending-sequence
    trap that would otherwise fabricate junk grams."""
    got = _encode(spark, ["A", "ab"])
    assert set(got) == {1}
    assert got[1] == _py_clk("ab")


def _dice(a, b):
    inter = sum(bin(x & y).count("1") for x, y in zip(a, b))
    ca = sum(bin(x).count("1") for x in a)
    cb = sum(bin(x).count("1") for x in b)
    return 2 * inter / (ca + cb)


def test_dice_ranks_near_dup_above_unrelated(spark):
    base = "Customer#000000001"
    near = "Customer#000000002"   # one substitution
    far = "Supplier#999888777"
    got = _encode(spark, [base, near, far])
    eb, en, ef = got[0], got[1], got[2]
    assert _dice(eb, eb) == 1.0
    assert _dice(eb, en) > _dice(eb, ef)
    assert _dice(eb, en) > 0.8  # one edit perturbs at most 2 bigrams
