"""Pins for the soft-TFIDF comparator and the weighted deterministic sample."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_soft_tfidf_score_range_and_typo_pairs(spark):
    """The mutation corpus has no identical names, only near-typo pairs — those
    must land near (but below) 1.0, every score must stay within the
    soft-cosine ceiling, and unrelated blocked pairs must score low."""
    from levenshtein_spark.driver_queries.er_eval import q_er_soft_tfidf

    rows = q_er_soft_tfidf(spark, SF).collect()
    assert rows
    scores = sorted((r.soft_tfidf for r in rows), reverse=True)
    # single-token-typo mutation pairs (known to exist in the linkage corpus)
    # keep nearly all the weighted mass: top pair > 0.9, but < 1 (no exact
    # name dupes in this corpus)
    assert 0.9 < scores[0] < 1.0
    assert all(0.0 <= s <= 1.000001 for s in scores)
    # the comparator separates: some blocked pairs score ~0
    assert scores[-1] < 0.1


def test_sample_weighted_rate_tracks_weight(spark):
    """Keep rate must be ~w/W per weight stratum, and the heaviest doc is
    always kept (its threshold is exactly 2^30)."""
    from levenshtein_spark.driver_queries.curation import q_sample_weighted

    out = q_sample_weighted(spark, SF).collect()
    w_max = max(r.w_max for r in out)
    heavy = [r for r in out if r.w == w_max]
    assert all(r.sampled for r in heavy)
    # aggregate realized rate ≈ E[rate] = mean(w)/W over the corpus
    exp = sum(r.w for r in out) / (len(out) * w_max)
    got = sum(1 for r in out if r.sampled) / len(out)
    assert abs(got - exp) < 0.15

    # determinism: a second run is row-identical
    again = q_sample_weighted(spark, SF).collect()
    assert sorted((r.doc_id, r.sampled) for r in again) == sorted(
        (r.doc_id, r.sampled) for r in out
    )
