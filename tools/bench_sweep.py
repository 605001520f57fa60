"""Kernel parameter sweep — the reference's benchmark_data_gen regime
(tests/benchmark_data_gen.cpp:487-527: word_len 100-250 x cutoff 2-16 x
edits 2-16 → CSV), re-expressed for the vectorized kernel and extended with
the instrumentation counters so the regime analysis ("where do the counting
bound / trim / doubling win?") is measured, not asserted.

Writes BENCH/sweep.csv: one row per (word_len, cutoff, edits_made) cell with
single-core pairs/sec and the counter breakdown over 20k pairs per cell
(half mangled near-dups, half unrelated words — the needle-in-haystack mix
of tests/benchmark.cpp:305-383).

Usage: python tools/bench_sweep.py [--pairs 20000] [--out BENCH/sweep.csv]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from levenshtein_spark import kernel  # noqa: E402
from tests.gen import apply_edits, random_word  # noqa: E402

WORD_LENS = (100, 150, 200, 250)
CUTOFFS = (2, 4, 8, 16)
EDITS = (2, 4, 8, 16)
KINDS = ("transpose", "delete", "insert", "substitute")


def _cell_pairs(rng: np.random.Generator, n: int, word_len: int, edits: int):
    """Half near-dup (mangled copy), half unrelated — per reference mix."""
    a, b = [], []
    for i in range(n):
        base = random_word(rng, word_len)
        if i % 2 == 0:
            kind = KINDS[i // 2 % 4]
            b.append(apply_edits(rng, base, edits, kind).encode())
        else:
            b.append(random_word(rng, word_len).encode())
        a.append(base.encode())
    return a, b


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=20_000)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "BENCH", "sweep.csv"))
    args = ap.parse_args()

    rng = np.random.default_rng(42)
    rows = []
    for wl in WORD_LENS:
        for ed in EDITS:
            a, b = _cell_pairs(rng, args.pairs, wl, ed)
            for k in CUTOFFS:
                kernel.enable_stats(True)
                t0 = time.perf_counter()
                kernel.batch_edit_distance(a, b, k=k)
                secs = time.perf_counter() - t0
                s = kernel.stats_snapshot()
                kernel.enable_stats(False)
                rows.append(
                    {
                        "word_len": wl,
                        "cutoff": k,
                        "edits_made": ed,
                        "pairs": args.pairs,
                        "secs": round(secs, 4),
                        "pairs_per_sec": round(args.pairs / secs, 1),
                        "exit_ldiff": s["exit_ldiff"],
                        "exit_identical": s["exit_identical"],
                        "trim_collapsed": s["trim_collapsed"],
                        "hist_pairs": s["hist_pairs"],
                        "hist_kills": s["hist_kills"],
                        "dp_pairs": s["dp_pairs"],
                        "dp_cells": s["dp_cells"],
                        "doubling_rounds": s["doubling_rounds"],
                    }
                )
                print(
                    f"wl={wl:3d} k={k:2d} edits={ed:2d}  {rows[-1]['pairs_per_sec']:>10.0f} p/s  "
                    f"kills={s['hist_kills']:6d} dp={s['dp_pairs']:6d}"
                )
    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} cells -> {out}")


if __name__ == "__main__":
    main()
