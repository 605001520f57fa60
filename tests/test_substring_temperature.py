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
