"""Unsupervised Fellegi–Sunter EM: parameter recovery on a planted mixture,
SQL-twin bit parity, and estimator-property pins.

The driver query `fs_em_weights` hash-checks raw doubles, which only works
because the Python fit (operators/scoring.py fs_em_fit) and the unrolled
iteration-CTE SQL (driver_queries/er_eval.py _fs_em_sql) execute the same
IEEE ops in the same order — pinned here over random count vectors.
"""

from __future__ import annotations

import random
import struct

import duckdb
import pytest

from levenshtein_spark.driver_queries.er_eval import _FS_EM_FIELDS, _FS_EM_ITERS, _fs_em_sql
from levenshtein_spark.operators.scoring import fs_em_fit


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def _mixture_counts(m, u, p, n, rng):
    """Pattern counts sampled from a known two-class FS model."""
    counts = [0] * 8
    for _ in range(n):
        match = rng.random() < p
        g = 0
        for f in range(3):
            prob = m[f] if match else u[f]
            if rng.random() < prob:
                g |= 1 << f
        counts[g] += 1
    return counts


def test_recovers_planted_parameters():
    rng = random.Random(31337)
    true_m = [0.95, 0.85, 0.9]
    true_u = [0.02, 0.2, 0.1]
    true_p = 0.05
    counts = _mixture_counts(true_m, true_u, true_p, 200_000, rng)
    m, u, p = fs_em_fit([float(x) for x in counts], 3, iters=60)
    assert abs(p - true_p) < 0.01
    for f in range(3):
        assert abs(m[f] - true_m[f]) < 0.03, (f, m[f])
        assert abs(u[f] - true_u[f]) < 0.02, (f, u[f])


def test_estimates_are_probabilities():
    rng = random.Random(5)
    for _ in range(20):
        counts = [float(rng.randint(0, 10_000)) for _ in range(8)]
        if sum(counts) == 0:
            counts[0] = 1.0
        m, u, p = fs_em_fit(counts, 3)
        assert 0.0 < p < 1.0
        for f in range(3):
            assert 0.0 <= m[f] <= 1.0
            assert 0.0 <= u[f] <= 1.0


def test_deterministic():
    counts = [17885.0, 572.0, 4389.0, 135.0, 1780.0, 55.0, 444.0, 14.0]
    assert fs_em_fit(counts, 3) == fs_em_fit(counts, 3)


def test_validation():
    with pytest.raises(ValueError):
        fs_em_fit([1.0] * 4, 3)  # needs 8 counts for 3 fields
    with pytest.raises(ValueError):
        fs_em_fit([0.0] * 8, 3)  # nothing to fit on


def test_sql_twin_bit_parity():
    """The unrolled-CTE SQL and the Python fit agree to the last bit on
    random pattern counts (incl. zero patterns) — the property the driver's
    raw-double hash check rests on."""
    rng = random.Random(2026)
    con = duckdb.connect()
    try:
        for trial in range(8):
            counts = [float(rng.randint(0, 50_000)) for _ in range(8)]
            if trial % 3 == 0:  # plant empty patterns
                counts[rng.randrange(8)] = 0.0
                counts[rng.randrange(8)] = 0.0
            cc = "SELECT " + ", ".join(
                f"CAST({counts[g]!r} AS DOUBLE) AS c{g}" for g in range(8)
            )
            rows = {r[0]: r for r in con.execute(_fs_em_sql(cc_select=cc)).fetchall()}
            m, u, p = fs_em_fit(counts, 3, iters=_FS_EM_ITERS)
            for f, name in enumerate(_FS_EM_FIELDS):
                field, got_m, got_u, got_ao, got_do, got_p = rows[name]
                assert _bits(got_m) == _bits(m[f]), (trial, name, got_m, m[f])
                assert _bits(got_u) == _bits(u[f]), (trial, name, got_u, u[f])
                assert _bits(got_ao) == _bits(m[f] / u[f])
                assert _bits(got_do) == _bits((1.0 - m[f]) / (1.0 - u[f]))
                assert _bits(got_p) == _bits(p)
    finally:
        con.close()
