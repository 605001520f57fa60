"""Differential pin: the generated DuckDB soundex SQL == Spark F.soundex.

Spark's soundex is the NARA/Commons variant (H/W transparent, non-letters
skipped, Y a vowel); the generated SQL must match it bit-for-bit on every
letters-first word, since the driver twin hash-checks raw codes.
"""

import random
import string

import duckdb
import pyspark.sql.functions as F
import pytest

from levenshtein_spark.functions.phonetic import dd_soundex

BATTERY = [
    "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
    "Honeyman", "Ray", "Hannah", "Wu", "Who", "ha", "a", "x", "Jackson",
    "Washington", "Lee", "Gutierrez", "VanDeusen", "Aaa", "BOB", "bob",
    "McDonald", "Lloyd", "czar", "HW", "WH", "Schmidt", "Schneider",
    "goldenrod", "lavender", "spring", "chocolate", "lace", "yellow",
    "Yyyyy", "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz",  # 33-char run: collapse depth
]


def spark_soundex(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "w string")
    return {r.w: r.s for r in df.select("w", F.soundex("w").alias("s")).collect()}


def duck_soundex(words):
    con = duckdb.connect()
    con.sql("CREATE TABLE t(w VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(w,) for w in words])
    return {
        r[0]: r[1]
        for r in con.sql(f"SELECT w, {dd_soundex('w')} AS s FROM t").fetchall()
    }


def test_battery(spark):
    got_s = spark_soundex(spark, BATTERY)
    got_d = duck_soundex(BATTERY)
    for w in BATTERY:
        assert got_s[w] == got_d[w], (w, got_s[w], got_d[w])


def test_random_words(spark):
    rng = random.Random(20260818)
    words = [
        "".join(rng.choice(string.ascii_letters) for _ in range(rng.randint(1, 24)))
        for _ in range(500)
    ]
    words = sorted(set(words))
    got_s = spark_soundex(spark, words)
    got_d = duck_soundex(words)
    bad = [(w, got_s[w], got_d[w]) for w in words if got_s[w] != got_d[w]]
    assert not bad, bad[:10]


def test_hw_transparency_pinned():
    """The variant-defining vector: H/W-separated equal codes collapse."""
    d = duck_soundex(["Ashcraft", "Ashcroft"])
    assert d["Ashcraft"] == d["Ashcroft"] == "A261"


def test_phonetic_pairs_query(spark):
    """driver_queries.phonetic: blocked pairs agree with a reference
    recomputation (within-code pairs only, id_a < id_b distinct, dist is the
    capped kernel distance)."""
    from levenshtein_spark.driver_queries.phonetic import q_phonetic_pairs

    sf = "/root/testdata/sf0.001"
    rows = q_phonetic_pairs(spark, sf).collect()
    parts = {
        r["id"]: r["tok"]
        for r in spark.read.parquet(f"{sf}/part.parquet")
        .selectExpr("p_partkey AS id", "split_part(p_name, ' ', 1) AS tok")
        .collect()
    }
    code = spark_soundex(spark, sorted(set(parts.values())))
    expect = {}
    ids = sorted(parts)
    by_code = {}
    for i in ids:
        by_code.setdefault(code[parts[i]], []).append(i)
    for members in by_code.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                expect[(members[x], members[y])] = None
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in rows}
    assert len(got) == len(rows), "duplicate pairs emitted"
    assert set(got) == set(expect)
    # spot-verify the capped-distance convention on a sample
    import itertools

    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    for (ia, ib), d in itertools.islice(sorted(got.items()), 200):
        ta, tb = parts[ia], parts[ib]
        k_eff = min(3, max(len(ta), len(tb)))
        assert d == min(lev(ta, tb), k_eff + 1), (ta, tb, d)
