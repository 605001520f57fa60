"""As-of join + binned time-window join: semantics vs brute force, tie
rules, boundary exactness, and plan shape (no products, no per-key range
join).

Reference role: the host-DBMS relational surface the reference's UDFs plug
into (doc/Usage.md) — these are the time-series join operators that host
would supply; semantics pinned here against per-row brute force.
"""

from __future__ import annotations

import datetime as dt

import pytest

from levenshtein_spark.operators.asof import asof_join
from levenshtein_spark.operators.rangejoin import time_window_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(microseconds=round(sec * 1_000_000))


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


@pytest.fixture(scope="module")
def sides(spark):
    # Deterministic pseudo-random event layout WITH planted collisions:
    # duplicate right timestamps per key (tie rule), right rows exactly at
    # a left ts (at-or-before includes them), empty keys on either side.
    import random

    rng = random.Random(0xA50F)
    left, right = [], []
    rid = 1000
    for key in range(8):
        n_l = rng.randint(0, 12)
        n_r = rng.randint(0, 12)
        for i in range(n_l):
            left.append((key, 100 * key + i, _ts(rng.uniform(0, 7200))))
        for _ in range(n_r):
            t = rng.uniform(0, 7200)
            right.append((key, rid, _ts(t), round(rng.uniform(0, 100), 2)))
            rid += 1
            if rng.random() < 0.3:  # planted equal-ts right pair (tie)
                right.append((key, rid, _ts(t), round(rng.uniform(0, 100), 2)))
                rid += 1
    # exact-boundary plants: right at the same instant as a left row, and
    # right exactly one window (1h) before a left row (must be EXCLUDED by
    # the half-open (t-w, t] window but INCLUDED by as-of <=).
    left.append((99, 9900, _ts(3600.0)))
    right.append((99, 9990, _ts(3600.0), 1.0))
    right.append((99, 9991, _ts(0.0), 2.0))
    l = _mk(spark, left, ["k", "lid", "ts"])
    r = _mk(spark, right, ["k", "rid", "ts", "v"])
    return l, r, left, right


def test_asof_matches_bruteforce(spark, sides):
    l, r, left, right = sides
    out = asof_join(l, r, ["k"], right_payload=["v"], tie_cols=["rid"], prefix="m_")
    got = {row["lid"]: (row["m_rid"], row["m_v"]) for row in out.collect()}
    assert len(got) == len(left)
    for k, lid, lts in left:
        cand = [(rts, rid, v) for (rk, rid, rts, v) in right if rk == k and rts <= lts]
        if cand:
            _, rid, v = max(cand)
            assert got[lid] == (rid, v), lid
        else:
            assert got[lid] == (None, None), lid


def test_asof_tie_breaks_by_greatest_tie_col(spark):
    l = _mk(spark, [(1, 1, _ts(10))], ["k", "lid", "ts"])
    r = _mk(
        spark,
        [(1, 7, _ts(10), 7.0), (1, 9, _ts(10), 9.0), (1, 8, _ts(10), 8.0)],
        ["k", "rid", "ts", "v"],
    )
    row = asof_join(l, r, ["k"], right_payload=["v"], tie_cols=["rid"]).collect()[0]
    assert (row["r_rid"], row["r_v"]) == (9, 9.0)


def test_asof_plan_has_no_join(spark, sides):
    l, r, *_ = sides
    plan = (
        asof_join(l, r, ["k"], right_payload=["v"], tie_cols=["rid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan  # union + ONE window; never a join
    assert "CartesianProduct" not in plan


def test_window_join_matches_bruteforce(spark, sides):
    l, r, left, right = sides
    win = 3600
    out = time_window_join(l, r, ["k"], window_sec=win)
    got = sorted((row["l_lid"], row["r_rid"]) for row in out.collect())
    want = sorted(
        (lid, rid)
        for (lk, lid, lts) in left
        for (rk, rid, rts, _v) in right
        if lk == rk and rts <= lts and rts > lts - dt.timedelta(seconds=win)
    )
    assert got == want
    # the exact-boundary plants: same-instant right IS in, t-3600 right is OUT
    assert (9900, 9990) in got and (9900, 9991) not in got


def test_window_join_plan_is_equi(spark, sides):
    l, r, *_ = sides
    plan = (
        time_window_join(l, r, ["k"], window_sec=3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan
