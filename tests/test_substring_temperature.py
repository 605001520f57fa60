"""Pins for the duplicated-substring-span dedup and temperature sampling
operators — the invariants the driver's oracle parity can't see (planted
spans, within-doc repetition exclusion, flattening monotonicity)."""

from __future__ import annotations

import pyspark.sql.functions as F

from levenshtein_spark.driver_queries.curation import _TEMP_SCALE, q_sample_temperature
from levenshtein_spark.driver_queries.dedup import substring_spans

W = 4  # test window width


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_planted_span(spark):
    # docs 0 and 1 share a 6-token run -> three shared width-4 windows at
    # known positions; doc 2 is disjoint
    shared = "alpha beta gamma delta epsilon zeta"
    d = _docs(
        spark,
        [
            (0, "x0 x1 " + shared + " x2"),
            (1, shared + " y0 y1 y2"),
            (2, "q0 q1 q2 q3 q4 q5 q6 q7 q8"),
        ],
    )
    out = substring_spans(d, width=W).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc
    # doc 0: shared run occupies token positions 3..8 (1-based), so shared
    # width-4 windows start at 3, 4, 5; doc 1: starts at 1, 2, 3
    assert sorted(r.pos for r in by_doc[0]) == [3, 4, 5]
    assert sorted(r.pos for r in by_doc[1]) == [1, 2, 3]
    # the SAME gram hashes, pairwise, in run order
    g0 = [r.gram_md5 for r in sorted(by_doc[0], key=lambda r: r.pos)]
    g1 = [r.gram_md5 for r in sorted(by_doc[1], key=lambda r: r.pos)]
    assert g0 == g1
    assert all(r.n_docs == 2 for r in out)


def test_substring_within_doc_repetition_not_flagged(spark):
    # a window repeated 5x inside ONE doc is not a cross-doc duplicate
    d = _docs(
        spark,
        [
            (0, " ".join(["spam ham eggs toast"] * 5)),
            (1, "u0 u1 u2 u3 u4 u5"),
        ],
    )
    assert substring_spans(d, width=W).count() == 0


def test_substring_short_docs_excluded(spark):
    # doc shorter than the window can never emit, even if its full text is
    # contained in another doc
    d = _docs(spark, [(0, "a b c"), (1, "a b c d e f")])
    assert substring_spans(d, width=W).count() == 0


def test_temperature_flattening(spark, tmp_path):
    # build a skewed corpus in the sf-dir layout the query expects
    rows = [(i, f"text {i}", "big" if i < 400 else "small", 6) for i in range(440)]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    d.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = q_sample_temperature(spark, str(tmp_path)).collect()
    small = [r for r in out if r.lang == "small"]
    big = [r for r in out if r.lang == "big"]
    # the smallest domain keeps everything: p = sqrt(40/40) = 1.0 exactly
    assert all(r.p_keep == 1.0 and r.kept for r in small)
    # head domain: p = sqrt(40/400) ~ 0.316; kept fraction within binomial
    # noise of p, and strictly downsampled
    p = big[0].p_keep
    assert abs(p - (40 / 400) ** 0.5) < 1e-12
    frac = sum(r.kept for r in big) / len(big)
    assert 0.15 < frac < 0.5
    # determinism: kept is a pure function of doc_id (re-run identical)
    out2 = q_sample_temperature(spark, str(tmp_path)).collect()
    assert sorted((r.doc_id, r.kept) for r in out2) == sorted(
        (r.doc_id, r.kept) for r in out
    )
    # threshold rule matches a direct recomputation for a couple of rows
    import hashlib

    for r in big[:5]:
        h = int(hashlib.md5(f"temp\x1f{r.doc_id}".encode()).hexdigest()[:15], 16)
        assert r.kept == ((h % _TEMP_SCALE) < int(r.p_keep * _TEMP_SCALE))


def test_substring_multi_finds_sub8_repeats(spark):
    """Round-3 detection-floor pin (VERDICT r02 #5): a 5-token verbatim
    repeat (short license line) is INVISIBLE to the width-8 pass but must
    surface in the width-4 rows of the multi-width query."""
    from levenshtein_spark.driver_queries.dedup import substring_spans_multi

    short = "licensed under the apache license"  # 5 tokens
    filler_a = " ".join(f"a{i}" for i in range(10))
    filler_b = " ".join(f"b{i}" for i in range(10))
    d = _docs(
        spark,
        [
            (0, short + " " + filler_a),
            (1, filler_b + " " + short),
            (2, "zz zy zx zw zv zu zt zs"),
        ],
    )
    out = substring_spans_multi(d, widths=(4, 8)).collect()
    w8 = [r for r in out if r.width == 8]
    w4 = [r for r in out if r.width == 4]
    assert w8 == []  # 5-token repeat < 8: width-8 pass is blind, as in r02
    got = {(r.doc_id, r.span_start, r.span_end) for r in w4}
    # doc 0: tokens 1..5 -> width-4 windows at pos 1,2 -> span [1, 5]
    # doc 1: tokens 11..15 -> windows at 11,12 -> span [11, 15]
    assert (0, 1, 5) in got and (1, 11, 15) in got
    assert all(r.doc_id != 2 for r in w4)


def test_substring_multi_width8_rows_match_single_width(spark):
    from levenshtein_spark.driver_queries.dedup import substring_spans_multi

    shared = " ".join(f"s{i}" for i in range(9))  # 9-token repeat
    d = _docs(spark, [(0, shared + " x0 x1"), (1, "y0 " + shared)])
    multi8 = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in substring_spans_multi(d, widths=(4, 8)).collect()
        if r.width == 8
    }
    single = set()
    from levenshtein_spark.driver_queries.dedup import substring_spans

    spans = substring_spans(d, width=8).select("doc_id", "pos")
    w = F.col("pos") - F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy("doc_id").orderBy("pos")
    )
    isl = spans.withColumn("grp", w)
    for r in (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + 7).alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    ):
        single.add((r.doc_id, r.s, r.e, r.n))
    assert multi8 == single and len(multi8) == 2


def test_substring_multi_exact_boundaries(spark):
    """Exact-boundary property: a maximal L-token repeat (L >= w) yields a
    width-w island with span EXACTLY [s, s+L-1] — token-granular boundaries,
    not window-quantized (the round-2 critique applied to width-8-only; at
    the smallest width the islands ARE the maximal repeats)."""
    from levenshtein_spark.driver_queries.dedup import substring_spans_multi

    rep = " ".join(f"r{i}" for i in range(13))  # 13-token repeat
    # doc 0: repeat at token positions 3..15; doc 1: at 1..13 — surrounded
    # by unique filler so the repeat is maximal on both sides
    d = _docs(
        spark,
        [
            (0, "u0 u1 u2 " + rep + " u3 u4"),
            (1, "v0 " + rep + " v1 v2 v3"),
            (2, "w0 w1 w2 w3 w4 w5 w6 w7"),
        ],
    )
    out = substring_spans_multi(d, widths=(4, 8)).collect()
    got4 = {(r.doc_id, r.span_start, r.span_end) for r in out if r.width == 4}
    got8 = {(r.doc_id, r.span_start, r.span_end) for r in out if r.width == 8}
    # width 4: exact boundaries of the 13-token repeat in both docs
    assert got4 == {(0, 4, 16), (1, 2, 14)}
    # width 8 agrees on the same repeat (L >= 8, so boundaries match too)
    assert got8 == {(0, 4, 16), (1, 2, 14)}
    # window counts: L - w + 1 consecutive duplicated windows per doc
    n4 = {(r.doc_id): r.n_windows for r in out if r.width == 4}
    assert n4 == {0: 10, 1: 10}


def test_suffix_lcp_planted(spark):
    """Character-granular longest-shared-substring: a planted 17-char
    cross-doc string reports EXACTLY 17 (the window families would quantize
    it); identical docs hit the 64-char cap; overlaps under the 4-char
    detection floor report 0."""
    from levenshtein_spark.driver_queries.dedup import suffix_lcp

    shared17 = "qwertyuiopasdfghj"
    long_z = "".join(f"z{i % 10}" for i in range(50))  # 100 chars, all 'z'+digit
    d = _docs(
        spark,
        [
            (0, "aaaaaaaaaa" + shared17 + "bbbbbbbbbb"),
            (1, "cccccccccc" + shared17 + "dddddddddd"),
            (2, long_z),
            (3, long_z),
            (4, "mnopmnop"),  # alphabet disjoint from every other doc
            (5, "eeeeeexyzffffff"),  # shares only 'xyz' (3 chars) with doc 6
            (6, "gggggwxyzhhhhh"),
        ],
    )
    got = {r.doc_id: r.shared_len for r in suffix_lcp(d).collect()}
    assert got[0] == 17 and got[1] == 17
    assert got[2] == 64 and got[3] == 64  # cap, not 100
    assert got[4] == 0
    assert got[5] == 0 and got[6] == 0  # 'xyz' is under the 4-char floor


def test_suffix_lcp_matches_bruteforce(spark):
    """Dense-overlap regime: tiny alphabet makes every doc share substrings
    with every other; the suffix-ordering result equals per-doc brute force
    (max longest-common-substring vs any other doc, clamped to [4, 64])."""
    import random

    from levenshtein_spark.driver_queries.dedup import suffix_lcp

    rng = random.Random(42)
    texts = ["".join(rng.choice("ab") for _ in range(40)) for _ in range(10)]

    def lcs_len(a: str, b: str) -> int:
        best = 0
        for i in range(len(a)):
            for j in range(len(b)):
                k = 0
                while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                    k += 1
                best = max(best, k)
        return best

    want = {}
    for i, a in enumerate(texts):
        mx = max(lcs_len(a, b) for j, b in enumerate(texts) if j != i)
        want[i] = min(mx, 64) if mx >= 4 else 0

    d = _docs(spark, list(enumerate(texts)))
    got = {r.doc_id: r.shared_len for r in suffix_lcp(d).collect()}
    assert got == want


def test_suffix_spans_char_exact_boundaries(spark):
    """Duplicated-region cut-list: a planted 120-char cross-doc repeat (well
    past the 64-char suffix cap) emits ONE span with character-exact
    boundaries — interval union chains past the cap; repeats under the
    16-char floor emit nothing."""
    from levenshtein_spark.driver_queries.dedup import suffix_spans

    rep = ("0123456789abcdef" * 8)[:120]  # alphabet disjoint from filler
    short = "stuvwstuvw"  # 10 chars, under the floor
    d = _docs(
        spark,
        [
            (0, "g" * 30 + rep + "h" * 25),
            (1, "i" * 10 + rep + "j" * 40),
            (2, "k" * 20 + short + "l" * 20),
            (3, "m" * 25 + short + "n" * 15),
            (4, "p" * 50),
        ],
    )
    got = {(r.doc_id, r.span_start, r.span_end) for r in suffix_spans(d).collect()}
    # 1-based inclusive char positions: doc 0 repeat at 31..150, doc 1 at 11..130
    assert got == {(0, 31, 150), (1, 11, 130)}


def test_suffix_spans_match_bruteforce_union(spark):
    """Dense-overlap property: on a tiny-alphabet corpus the span table
    equals the brute-force union of all >= minlen cross-doc repeat
    intervals (per-position max shared length, capped at 64, interval
    union in Python)."""
    import random

    from levenshtein_spark.driver_queries.dedup import suffix_spans

    rng = random.Random(7)
    texts = ["".join(rng.choice("ab") for _ in range(60)) for _ in range(6)]
    minlen = 8

    def shared_at(i: int, p: int) -> int:
        a = texts[i]
        best = 0
        for j, b in enumerate(texts):
            if j == i:
                continue
            for q in range(len(b)):
                k = 0
                while (p + k < len(a) and q + k < len(b) and k < 64
                       and a[p + k] == b[q + k]):
                    k += 1
                best = max(best, k)
        return best

    want = set()
    for i in range(len(texts)):
        covered = set()
        for p in range(len(texts[i])):
            s = shared_at(i, p)
            if s >= minlen:
                covered.update(range(p, p + s))
        # contiguous runs of covered positions -> (start, end), 1-based
        run = None
        for p in sorted(covered) + [10**9]:
            if run and p == run[1] + 1:
                run = (run[0], p)
            else:
                if run:
                    want.add((i, run[0] + 1, run[1] + 1))
                run = (p, p) if p < 10**9 else None

    d = _docs(spark, list(enumerate(texts)))
    got = {(r.doc_id, r.span_start, r.span_end)
           for r in suffix_spans(d, minlen=minlen).collect()}
    assert got == want
