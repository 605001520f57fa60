"""Similarity-threshold self-join: lossless log-length banding + exactness
vs the scalar reference oracle."""

from __future__ import annotations

import math

import numpy as np
import pytest

from levenshtein_spark.operators.simjoin import log_length_bands, similarity_self_join
from levenshtein_spark.oracle import ref_similarity

from tests.gen import apply_edits, random_word


def test_log_bands_cover_every_ratio_bounded_pair():
    """Arithmetic property behind losslessness: any (la, lb) with
    min >= p*max shares >= 1 of the exploded (band, band+1) keys."""
    p = 0.7
    base = math.log(1.0 / p)

    def keys(n):
        if n <= 0:
            return {"empty"}
        b = math.floor(math.log(n) / base)
        return {b, b + 1}

    rng = np.random.default_rng(0)
    for _ in range(20000):
        la = int(rng.integers(1, 5000))
        lb = int(rng.integers(max(1, int(la * p)), int(la / p) + 1))
        if min(la, lb) >= p * max(la, lb):
            assert keys(la) & keys(lb), (la, lb)
    assert keys(0) & keys(0)


def test_similarity_self_join_matches_bruteforce(spark):
    """Blocked join == brute-force sim >= p over a variable-length corpus
    (mangles at several length scales so multiple bands and the cross-band
    explode both matter)."""
    rng = np.random.default_rng(11)
    rows = []
    rid = 0
    for wl in (6, 12, 25, 60, 130):
        for _ in range(8):
            base = random_word(rng, wl)
            rows.append((rid, base))
            rid += 1
            rows.append((rid, apply_edits(rng, base, int(rng.integers(1, 3)), "substitute")))
            rid += 1
    p = 0.7
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r.id_a, r.id_b): round(r.sim, 9)
        for r in similarity_self_join(df, "text", p, hot_threshold=20, num_salts=4).collect()
    }
    exp = {}
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            s = ref_similarity(ta, tb, p)
            if s >= p:
                exp[(ia, ib)] = round(s, 9)
    assert got == exp
    assert len(exp) >= len(rows) // 3  # the corpus genuinely has matches


def test_log_bands_rejects_bad_p():
    import pyspark.sql.functions as F

    with pytest.raises(ValueError):
        log_length_bands(F.lit(5), 1.0)


def _brute_pairs(rows, k, dist):
    exp = {}
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            d = dist(ta, tb)
            if d <= k:
                exp[(ia, ib)] = d
    return exp


def test_edit_distance_self_join_matches_bruteforce_levenshtein(spark):
    """Ed-Join prefix-filter candidates + verification == brute force, on a
    corpus that stresses every regime: strings below the short-block
    threshold (len < k*q + q), mid-length near-dups with each edit type,
    identical strings, and a hot block of strings sharing rare grams."""
    from levenshtein_spark.operators.simjoin import edit_distance_self_join
    from levenshtein_spark.oracle import levenshtein_matrix

    rng = np.random.default_rng(7)
    rows, rid = [], 0
    for wl in (2, 4, 7, 12, 30, 60):
        for _ in range(6):
            base = random_word(rng, wl)
            rows.append((rid, base)); rid += 1
            for op in ("substitute", "delete", "insert"):
                rows.append((rid, apply_edits(rng, base, int(rng.integers(1, 4)), op)))
                rid += 1
    rows.append((rid, "")); rid += 1          # empty string
    rows.append((rid, "")); rid += 1          # duplicate empty
    rows.append((rid, rows[0][1])); rid += 1  # exact duplicate
    k, q = 2, 3
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in edit_distance_self_join(
            df, "text", k=k, q=q, hot_threshold=20, num_salts=4
        ).collect()
    }
    exp = _brute_pairs(
        rows, k, lambda a, b: levenshtein_matrix(a.encode(), b.encode())
    )
    assert got == exp
    assert len(exp) >= 10  # non-vacuous


def test_edit_distance_self_join_matches_bruteforce_osa(spark):
    """Transpositions mode: per-edit gram damage rises to q+1 (a swap
    touches q+1 grams), so the prefix widens — pinned against the OSA
    full-matrix oracle including planted adjacent swaps."""
    from levenshtein_spark.operators.simjoin import edit_distance_self_join
    from levenshtein_spark.oracle import osa_matrix

    rng = np.random.default_rng(13)
    rows, rid = [], 0
    for wl in (3, 8, 20, 40):
        for _ in range(8):
            base = random_word(rng, wl)
            rows.append((rid, base)); rid += 1
            rows.append((rid, apply_edits(rng, base, int(rng.integers(1, 3)), "transpose")))
            rid += 1
    k, q = 2, 2
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in edit_distance_self_join(
            df, "text", k=k, q=q, transpositions=True, hot_threshold=20, num_salts=4
        ).collect()
    }
    exp = _brute_pairs(rows, k, lambda a, b: osa_matrix(a.encode(), b.encode()))
    assert got == exp
    assert len(exp) >= 8


def test_edit_distance_self_join_rejects_bad_params(spark):
    from levenshtein_spark.operators.simjoin import edit_distance_self_join

    df = spark.createDataFrame([(0, "x")], "id long, text string")
    with pytest.raises(ValueError):
        edit_distance_self_join(df, "text", k=-1)
    with pytest.raises(ValueError):
        edit_distance_self_join(df, "text", k=1, q=0)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

if HAS_HYPOTHESIS:

    @settings(max_examples=10, deadline=None)
    @given(
        texts=st.lists(st.text(min_size=0, max_size=14), min_size=2, max_size=25),
        k=st.integers(min_value=0, max_value=3),
        q=st.integers(min_value=1, max_value=4),
    )
    def test_edjoin_hypothesis_unicode(spark, texts, k, q):
        """Arbitrary unicode corpora: the prefix-filter join must equal
        brute force under the BYTE-based kernel even though the q-grams and
        the short-block threshold are codepoint-based — valid because byte
        edits >= codepoint edits, so byte-dist <= k implies codepoint-gram
        damage <= k*q and the count-filter lemma still binds."""
        from levenshtein_spark.operators.simjoin import edit_distance_self_join
        from levenshtein_spark.oracle import levenshtein_matrix

        rows = list(enumerate(texts))
        df = spark.createDataFrame(rows, "id long, text string")
        got = {
            (r.id_a, r.id_b): r.dist
            for r in edit_distance_self_join(
                df, "text", k=k, q=q, hot_threshold=10, num_salts=3
            ).collect()
        }
        exp = {}
        for i, (ia, ta) in enumerate(rows):
            for ib, tb in rows[i + 1 :]:
                d = levenshtein_matrix(ta.encode(), tb.encode())
                if d <= k:
                    exp[(ia, ib)] = d
        assert got == exp
