"""Type-2 clone canonicalization semantics (driver_queries.curation).

A type-2 (parameterized) clone = equality up to a CONSISTENT bijective
renaming of tokens. The canonical first-occurrence-index stream must be
invariant under renaming and sensitive to structure.
"""

import pyspark.sql.functions as F
import pytest

_T2 = "array_join(transform(toks, t -> cast(array_position(toks, t) as string)), ',')"


def canon(spark, texts):
    from levenshtein_spark.functions.text import word_tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    rows = (
        df.select("i", word_tokens(F.col("text")).alias("toks"))
        .select("i", F.expr(_T2).alias("c"))
        .orderBy("i")
        .collect()
    )
    return [r.c for r in rows]


def test_renaming_invariance(spark):
    a, b = canon(spark, ["foo bar foo baz qux", "xx yy xx zz ww"])
    assert a == b == "1,2,1,4,5"


def test_structure_sensitivity(spark):
    # same multiset of tokens, different repetition structure
    a, b = canon(spark, ["a b a b", "a a b b"])
    assert a == "1,2,1,2" and b == "1,1,3,3"
    assert a != b


def test_non_bijective_not_clones(spark):
    # two tokens mapping onto one is NOT a type-2 clone (rename must be
    # consistent, but need not be injective in the classic definition —
    # our first-occurrence scheme treats it as different, matching the
    # stricter bijective variant)
    a, b = canon(spark, ["a b", "a a"])
    assert a == "1,2" and b == "1,1"


def test_empty_and_single(spark):
    a, b = canon(spark, ["", "word"])
    assert a == "" and b == "1"


def test_driver_query_groups(spark):
    """End-to-end on a toy corpus routed through the real query logic:
    renamed twins land in one class, structural oddballs alone."""
    from levenshtein_spark.functions.text import word_tokens

    docs = spark.createDataFrame(
        [
            (1, "en", "alpha beta alpha gamma one two three"),
            (2, "en", "x y x z eins zwei drei"),  # rename of doc 1
            (3, "en", "alpha alpha beta gamma one two three"),  # different shape
            (4, "de", "alpha beta alpha gamma one two three"),  # other lang
        ],
        "doc_id long, lang string, text string",
    )
    t = docs.select(
        "doc_id", "lang", F.slice(word_tokens(F.col("text")), 1, 12).alias("toks")
    )
    keyed = t.select(
        "doc_id",
        F.md5(F.concat_ws("|", F.col("lang"), F.expr(_T2))).alias("clone_key"),
    )
    groups = (
        keyed.groupBy("clone_key")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("rep"))
        .where(F.col("n") >= 2)
        .collect()
    )
    assert len(groups) == 1
    assert groups[0].n == 2 and groups[0].rep == 1


# ---------------------------------------------------------------------------
# Type-3 (near-miss) clones — MOSS fingerprint-set overlap
# ---------------------------------------------------------------------------


def _gram_hash(gram: str) -> int:
    """The engine's gram hash: md5 hex prefix(15) as int (matches both the
    Spark conv(substring(md5)) expression and the DuckDB twin)."""
    import hashlib

    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _five_tokens(mod_ok: bool) -> str:
    """A 5-token doc whose single gram's hash does (not) pass the mod-4
    sample — searched deterministically so the tests don't depend on luck."""
    from levenshtein_spark.driver_queries.curation import _T3_MOD

    for i in range(1000):
        toks = [f"tok{i}a", f"tok{i}b", f"tok{i}c", f"tok{i}d", f"tok{i}e"]
        hit = _gram_hash("_".join(toks)) % _T3_MOD == 0
        if hit == mod_ok:
            return " ".join(toks)
    raise AssertionError("unreachable: 1000 misses at rate 1/4")


def _t3(spark, rows):
    from levenshtein_spark.driver_queries.curation import type3_clone_pairs

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return type3_clone_pairs(df).collect()


def test_type3_containment_pair(spark):
    """B = A plus appended statements: every fingerprint of A survives in B,
    so containment overlap is EXACTLY 1.0 regardless of which grams the
    mod-p sample keeps — the deterministic planted case. An unrelated doc
    shares no grams and must not pair."""
    base = " ".join(f"stmt{i} call{i}" for i in range(20))  # 40 tokens
    near = base + " " + " ".join(f"extra{i}" for i in range(8))
    other = " ".join(f"alien{i} blob{i}" for i in range(20))
    out = _t3(spark, [(1, base), (2, near), (3, other)])
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id_a, r.doc_id_b) == (1, 2)
    assert r.n_a > 0 and r.n_inter == r.n_a  # full containment
    assert r.overlap == 1.0


def test_type3_df_cap_boundary(spark):
    """A fingerprint shared by more than _T3_DF_CAP docs is purged before
    the join (the MOSS too-common rule): 16 identical docs pair (C(16,2)
    = 120), 17 identical docs produce NOTHING."""
    from levenshtein_spark.driver_queries.curation import _T3_DF_CAP

    text = _five_tokens(mod_ok=True)  # exactly one gram, sampled
    at_cap = _t3(spark, [(i, text) for i in range(_T3_DF_CAP)])
    assert len(at_cap) == _T3_DF_CAP * (_T3_DF_CAP - 1) // 2
    assert all(r.overlap == 1.0 and r.doc_id_a < r.doc_id_b for r in at_cap)
    over_cap = _t3(spark, [(i, text) for i in range(_T3_DF_CAP + 1)])
    assert over_cap == []


def test_type3_unsampled_doc_cannot_match(spark):
    """mod-p sampling is probabilistic recall: a doc whose only gram hash
    fails the mod filter has no fingerprints, so even its exact twin does
    not pair here (dedup_exact is the operator that catches it)."""
    text = _five_tokens(mod_ok=False)
    assert _t3(spark, [(1, text), (2, text)]) == []
