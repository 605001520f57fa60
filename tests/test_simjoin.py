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
