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
