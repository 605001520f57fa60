"""Distributed prefix sum + token-budget packing (operators/packing.py) and
the curation-query building blocks (prefix-containment dedup, repetition
stats) pinned against single-partition / brute-force equivalents."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from levenshtein_spark.operators.packing import global_prefix_sum, pack_by_budget


def _tokens_df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, n long"
    )


def test_global_prefix_sum_matches_single_partition_window(spark):
    vals = [5, 0, 17, 3, 3, 3, 100, 1, 2, 8, 40, 0, 0, 9] * 10
    df = _tokens_df(spark, vals)
    got = {
        r["id"]: r["cum"]
        for r in global_prefix_sum(df, ["id"], "n", num_partitions=7).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("n").over(w)).collect()
    }
    assert got == want


def test_multi_value_prefix_sum_streams_are_independent(spark):
    """Two value streams through ONE call must each equal their own
    single-stream run — regression for the census bug where every offset
    stream summed the LAST value column (a stale comprehension variable),
    which left stream 0 carrying stream 1's offsets."""
    df = spark.createDataFrame(
        [(i, 1, i % 2) for i in range(100)], "id long, one long, hit long"
    )
    both = {
        r["id"]: (r["n"], r["ch"])
        for r in global_prefix_sum(
            df, ["id"], ["one", "hit"], out_col=["n", "ch"], num_partitions=9
        ).collect()
    }
    n_only = {
        r["id"]: r["n"]
        for r in global_prefix_sum(df, ["id"], "one", out_col="n", num_partitions=9).collect()
    }
    ch_only = {
        r["id"]: r["ch"]
        for r in global_prefix_sum(df, ["id"], "hit", out_col="ch", num_partitions=9).collect()
    }
    assert both == {k: (n_only[k], ch_only[k]) for k in n_only}
    assert both[99] == (100, 50)  # global totals, not per-partition restarts


def test_global_prefix_sum_stable_across_partition_counts(spark):
    vals = list(range(50))
    df = _tokens_df(spark, vals)
    a = {r["id"]: r["cum"] for r in global_prefix_sum(df, ["id"], "n", num_partitions=2).collect()}
    b = {r["id"]: r["cum"] for r in global_prefix_sum(df, ["id"], "n", num_partitions=13).collect()}
    assert a == b


def test_pack_by_budget_start_offset_semantics(spark):
    # tokens: 4,4,4 with budget 10 -> starts at 0,4,8 -> shards 0,0,0;
    # then 5 starts at 12 -> shard 1; an oversized doc (25) starts at 17
    # (shard 1) and the NEXT doc starts at 42 -> shard 4.
    df = _tokens_df(spark, [4, 4, 4, 5, 25, 1])
    got = {r["id"]: r["shard_id"] for r in pack_by_budget(df, ["id"], "n", 10).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 4}


def test_grouped_prefix_sum_resets_per_group(spark):
    """group_cols packing: each group is an independent stream, equal to the
    per-group single-partition window, even when the range partitioner puts
    a group boundary mid-partition."""
    rows = [(i, ["a", "b", "c"][i % 3], (i * 7) % 11 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, grp string, n long")
    got = {
        (r["grp"], r["id"]): r["cum"]
        for r in global_prefix_sum(
            df, ["id"], "n", group_cols=["grp"], num_partitions=7
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["grp"], r["id"]): r["cum"]
        for r in df.withColumn("cum", F.sum("n").over(w)).collect()
    }
    assert got == want


def test_pack_by_budget_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        pack_by_budget(_tokens_df(spark, [1]), ["id"], "n", 0)


def test_prefix_sum_rejects_float_values(spark):
    """Float prefix sums are not partitioning-independent (non-associative
    addition) — the primitive must refuse rather than silently truncate."""
    df = spark.createDataFrame([(0, 1.5), (1, 2.5)], "id long, n double")
    with pytest.raises(ValueError, match="integral"):
        global_prefix_sum(df, ["id"], "n")


def test_grouped_prefix_sum_keeps_null_groups(spark):
    """A NULL group value is a real group: rows must not vanish through the
    offset join (null-safe equality, not an equi-join)."""
    rows = [(0, None, 3), (1, "a", 5), (2, None, 4), (3, "a", 1), (4, None, 2)]
    df = spark.createDataFrame(rows, "id long, grp string, n long")
    got = {
        r["id"]: r["cum"]
        for r in global_prefix_sum(
            df, ["id"], "n", group_cols=["grp"], num_partitions=3
        ).collect()
    }
    assert got == {0: 3, 2: 7, 4: 9, 1: 5, 3: 6}


# ---------------------------------------------------------------------------
# dedup_prefix blocking losslessness on adversarial shapes the sf corpus
# lacks: docs shorter than the 32-char key, mass-duplicated prefixes (hot
# block), prefix-of-prefix chains, and equal-text pairs (must NOT match).
# ---------------------------------------------------------------------------
def test_dedup_prefix_matches_brute_force_incl_short_docs(spark, tmp_path):
    texts = {
        0: "ab",                      # len < key width
        1: "abc",                     # 0 is a prefix of 1
        2: "abc",                     # exact dupe of 1 -> not a PROPER prefix
        3: "abcdef",                  # 1,2 (and 0) are prefixes
        4: "x" * 40,                  # long doc
        5: "x" * 60,                  # shares full 32-char key with 4
        6: "x" * 40 + "y",            # contains 4, shares key with 4/5
        7: "zq",                      # no relation
        29: "",                       # empty text: proper prefix of EVERYTHING
        30: "",                       # second empty: not a proper prefix of 29
    }
    # a hot prefix block: many docs starting with the same 32+ chars
    base = "hot prefix block " + "p" * 30
    for i in range(8, 28):
        texts[i] = base + f" tail {i}"
    texts[28] = base  # prefix of all 20 above
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    p = str(tmp_path / "documents.parquet")
    df.write.parquet(p)
    # point the driver query at a directory laid out like an sf dir
    from levenshtein_spark.driver_queries.dedup import q_dedup_prefix

    got = {
        (r["doc_a"], r["doc_b"])
        for r in q_dedup_prefix(spark, str(tmp_path)).collect()
    }
    want = {
        (a, b)
        for a, ta in texts.items()
        for b, tb in texts.items()
        if a != b and len(ta) < len(tb) and tb.startswith(ta)
    }
    assert got == want
    assert (28, 8) in got and (0, 1) in got and (4, 6) in got
    assert (29, 1) in got                            # empty doc is a prefix of all
    assert (1, 2) not in got and (2, 1) not in got  # equal text excluded
    assert (29, 30) not in got and (30, 29) not in got  # empty == empty excluded


def test_text_repetition_pinned_values(spark, tmp_path):
    rows = [
        (0, "spark spark spark spark", "en", "s", 23),   # 1 distinct of 4
        (1, "a b c d", "en", "s", 7),                    # all distinct
        (2, "a b a b", "en", "s", 7),                    # bigrams: a_b x2, b_a x1
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from levenshtein_spark.driver_queries.text import q_text_repetition

    got = {r["doc_id"]: r.asDict() for r in q_text_repetition(spark, str(tmp_path)).collect()}
    assert got[0]["word_top_frac"] == 1.0
    assert got[0]["word_dup_frac"] == 0.75
    assert got[1]["word_top_frac"] == 0.25
    assert got[1]["word_dup_frac"] == 0.0
    # doc 2: words a,b,a,b -> top 0.5, dup 0.5; bigrams a_b,b_a,a_b -> top 2/3
    assert got[2]["word_top_frac"] == 0.5
    assert got[2]["bigram_top_frac"] == round(2 / 3, 6)


def test_decontaminate_flags_planted_overlap(spark, tmp_path):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, bench_text, "en", "src0", len(bench_text)),           # benchmark
        (1, "prefix words " + bench_text, "en", "src1", 10),      # contains an 8-gram of it
        (2, "totally different words here no overlap at all now", "en", "src1", 10),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from levenshtein_spark.driver_queries.curation import q_decontaminate

    got = {r.doc_id: (r.n_shared, r.contaminated) for r in
           q_decontaminate(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2}          # benchmark docs excluded from output
    assert got[1][1] is True and got[1][0] >= 1
    assert got[2] == (0, False)


def test_decontaminate_tokenless_docs_do_not_match(spark, tmp_path):
    """Two token-less docs share no content; the '' shingle both emit must
    not count as overlap."""
    rows = [
        (0, "!!!", "en", "src0", 3),   # benchmark, zero word tokens
        (1, "???", "en", "src1", 3),   # training, zero word tokens
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from levenshtein_spark.driver_queries.curation import q_decontaminate

    got = {r.doc_id: (r.n_shared, r.contaminated) for r in
           q_decontaminate(spark, str(tmp_path)).collect()}
    assert got == {1: (0, False)}


def test_redact_pii_planted_and_clean(spark, tmp_path):
    rows = [
        (5, "clean text without anything", "en", "s", 27),   # doc_id%5==0 -> planted
        (7, "reach me at real.user@corp.org or 555-867-5309 or 078-05-1120", "en", "s", 60),
        (11, "nothing to redact", "en", "s", 17),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from levenshtein_spark.driver_queries.curation import q_text_redact_pii

    got = {r.doc_id: r.was_redacted for r in q_text_redact_pii(spark, str(tmp_path)).collect()}
    assert got == {5: True, 7: True, 11: False}
