"""Pins for the session-4 review-pass fixes — each test encodes the exact
boundary the review found inverted/missing, so it can't silently regress."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from levenshtein_spark.driver_queries.er_eval import q_linkage_rule_cascade
from levenshtein_spark.driver_queries.relational import q_events_funnel

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_session_window_exact_gap_merges(spark):
    # Spark's session_window MERGES an event at exactly prev + gap (verified
    # behavior the streaming twin's strict > rule mirrors); one at gap + 1s
    # splits. Batch groupBy uses the same expression as the stream.
    rows = [
        (1, _T0), (1, _T0 + dt.timedelta(minutes=30)),             # exact gap
        (2, _T0), (2, _T0 + dt.timedelta(minutes=30, seconds=1)),  # beyond gap
    ]
    e = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_user = {}
    for r in got:
        per_user.setdefault(r.user_id, []).append(r.n)
    assert per_user[1] == [2]          # merged into ONE session
    assert sorted(per_user[2]) == [1, 1]  # split into TWO


def test_cascade_null_fields_join_nothing(spark, tmp_path):
    # a NULL acctbal / NULL segment must null the whole rule-1/3 block key
    # (concat, not concat_ws), matching the oracle's NULL-propagating
    # equality — the NULL rows pair with nobody
    rows = [
        (1, "Customer#000000001", 0, None, "AUTO"),
        (2, "Customer#000000902", 0, None, "AUTO"),  # same NULL balance
        (3, "Customer#000000333", 0, 500.0, None),
        (4, "Customer#000000944", 0, 501.0, None),   # same NULL segment
    ]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    got = q_linkage_rule_cascade(spark, str(tmp_path)).collect()
    assert got == []  # names are all dist > 1, so rule 2 is silent too


def test_funnel_zero_base_yields_null_conversion(spark, tmp_path):
    # no 'view' events: n_base = 0 -> conversion must be NULL (not NaN),
    # matching DuckDB's 0.0/0.0
    rows = [(1, _T0, 10, "click", 1.0, "{}")]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r.step: r for r in q_events_funnel(spark, str(tmp_path)).collect()}
    assert got[1].n_users == 0
    assert got[1].conversion is None
    assert got[2].conversion is None


def test_sw_norm_empty_name_no_nan(spark):
    """ADVICE r03 #2: sw_norm's denominator is clamped greatest(1, lmin) —
    an empty name on either side must yield a finite 0.0, not NaN/Inf
    (and DuckDB would diverge from Spark on the unguarded divide)."""
    import math

    from levenshtein_spark.functions.align import SW_MATCH
    from levenshtein_spark.functions.distance import jaro_winkler  # noqa: F401
    from levenshtein_spark.functions.align import smith_waterman

    rows = [(1, "", "Customer#1"), (2, "Customer#1", ""), (3, "", "")]
    df = spark.createDataFrame(rows, "pid long, name_a string, name_b string")
    scored = df.select(
        "pid",
        F.least(F.octet_length("name_a"), F.octet_length("name_b")).alias("__lmin"),
        smith_waterman("name_a", "name_b").alias("sw"),
    ).select(
        "pid",
        F.round(
            F.col("sw").cast("double")
            / (F.lit(float(SW_MATCH)) * F.greatest(F.lit(1), F.col("__lmin")).cast("double")),
            6,
        ).alias("sw_norm"),
    )
    for r in scored.collect():
        assert r.sw_norm is not None and math.isfinite(r.sw_norm)
        assert r.sw_norm == 0.0


def test_dbscan_duplicate_edges_do_not_flip_core(spark):
    """ADVICE r03 #3: dbscan_labels distincts the symmetrized edge stream,
    so duplicated (or pre-symmetrized) input edges cannot double-count
    degree and flip is_core. min_pts=3: a point with ONE distinct
    neighbor (deg 1, |N_eps| = 2) is not core no matter how many times
    the edge is repeated."""
    from levenshtein_spark.operators.clustering import dbscan_labels

    ids = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    edges = spark.createDataFrame(
        [("a", "b")] * 4 + [("b", "a")] * 3,  # one undirected edge, spammed
        "src string, dst string",
    )
    got = {r.id: (r.deg, r.is_core) for r in dbscan_labels(ids, edges, min_pts=3).collect()}
    assert got["a"] == (1, False)
    assert got["b"] == (1, False)
    assert got["c"] == (0, False)
