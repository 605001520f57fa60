"""Vectorized Jaro–Winkler similarity — the second classic ER comparator.

The reference library is the edit-distance half of a record-linkage
comparator stack; production ER systems (and the Fellegi–Sunter literature)
pair it with Jaro–Winkler, the name-comparator of the U.S. Census Bureau
record-linkage line (Winkler 1990). This module supplies it with the same
batch-kernel discipline as ``levenshtein_spark.kernel``: NumPy across the
Arrow batch, zero per-row Python on the hot path.

Semantics are pinned bit-for-bit to DuckDB's ``jaro_winkler_similarity``
(which follows the rapidfuzz conventions), so the driver's DuckDB twin can
hash-check raw doubles:

* UTF-8 **byte** comparisons (consistent with the reference's byte
  semantics, ReadMe.md:50-51).
* Either string empty (or NULL, which the reference maps to empty —
  src/prealgorithm.h:17-23) → similarity 0.0, including both-empty.
* Match window ``max(len)//2 - 1`` (floored at 0); greedy left-to-right
  matching; transpositions = half the mismatched aligned match bytes.
* Winkler prefix boost (common prefix capped at 4, scale 0.1) applied only
  when the Jaro similarity exceeds 0.7.
* Float evaluation order fixed to ``(m/la + m/lb + (m-t)/m) / 3`` and
  ``sim + (l*0.1)*(1-sim)`` — the order DuckDB uses, so results are
  bit-identical (verified over 10^4 random + adversarial pairs in
  tests/test_jaro_winkler.py).

Scale shape: the kernel is O(batch · la · lb) byte ops, fully vectorized;
pairs are processed in row chunks so peak memory is bounded by the chunk's
(rows × max_len) bool/int16 matrices, independent of batch size.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from levenshtein_spark.kernel import _to_bytes

# Rows per vectorized chunk: bounds the (rows x max_len) scratch matrices
# (at 256-byte strings: ~8k x 256 x ~4 arrays = ~8 MB, L3-resident).
_JW_PAIRS_CHUNK = 1 << 13

_WINKLER_PREFIX_CAP = 4
_WINKLER_SCALE = 0.1
_WINKLER_THRESHOLD = 0.7


def jaro_winkler_ref(s1: Union[str, bytes, None], s2: Union[str, bytes, None]) -> float:
    """Scalar reference implementation (tests / documentation of the exact
    conventions). Straight transcription of the published algorithm; the
    batch kernel below is differentially tested against it and against
    DuckDB's C++ implementation."""
    a = _to_bytes(s1) or b""
    b = _to_bytes(s2) or b""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(max(la, lb) // 2 - 1, 0)
    b_used = [False] * lb
    a_used = [False] * la
    m = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_used[j] and a[i] == b[j]:
                a_used[i] = b_used[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if a_used[i]:
            while not b_used[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    sim = (m / la + m / lb + (m - t) / m) / 3.0
    if sim > _WINKLER_THRESHOLD:
        l = 0
        for x, y in zip(a[:_WINKLER_PREFIX_CAP], b[:_WINKLER_PREFIX_CAP]):
            if x != y:
                break
            l += 1
        sim = sim + (l * _WINKLER_SCALE) * (1.0 - sim)
    return sim


def batch_jaro_winkler(
    a: Sequence[Union[str, bytes, None]],
    b: Sequence[Union[str, bytes, None]],
) -> np.ndarray:
    """Jaro–Winkler similarity for a batch of pairs; returns float64 array."""
    a_b = [_to_bytes(x) for x in a]
    b_b = [_to_bytes(x) for x in b]
    n = len(a_b)
    if len(b_b) != n:
        raise ValueError("a and b must have equal length")
    la = np.fromiter((0 if x is None else len(x) for x in a_b), np.int64, n)
    lb = np.fromiter((0 if x is None else len(x) for x in b_b), np.int64, n)
    out = np.zeros(n, np.float64)
    todo = np.flatnonzero((la > 0) & (lb > 0))
    for lo in range(0, todo.size, _JW_PAIRS_CHUNK):
        idx = todo[lo : lo + _JW_PAIRS_CHUNK]
        out[idx] = _jw_chunk(
            [a_b[i] for i in idx], [b_b[i] for i in idx], la[idx], lb[idx]
        )
    return out


def _jw_chunk(
    a_b: list, b_b: list, tla: np.ndarray, tlb: np.ndarray
) -> np.ndarray:
    rows = len(a_b)
    La = int(tla.max())
    Lb = int(tlb.max())
    # Distinct pad sentinels (>255) so padding never matches anything.
    A = np.full((rows, La), 256, np.int16)
    B = np.full((rows, Lb), 257, np.int16)
    for r in range(rows):
        A[r, : tla[r]] = np.frombuffer(a_b[r], np.uint8)
        B[r, : tlb[r]] = np.frombuffer(b_b[r], np.uint8)

    window = np.maximum(np.maximum(tla, tlb) // 2 - 1, 0)
    b_matched = np.zeros((rows, Lb), bool)
    a_matched = np.zeros((rows, La), bool)
    j_idx = np.arange(Lb)
    # Greedy match in lockstep over a-positions: each active row claims the
    # first unmatched in-window equal byte of b (vectorized argmax).
    for i in range(La):
        in_window = (j_idx >= np.maximum(0, i - window)[:, None]) & (
            j_idx < np.minimum(tlb, i + window + 1)[:, None]
        )
        eq = (A[:, i : i + 1] == B) & ~b_matched & in_window
        has = eq.any(axis=1)
        if not has.any():
            continue
        hit_rows = np.flatnonzero(has)
        first = eq[hit_rows].argmax(axis=1)
        b_matched[hit_rows, first] = True
        a_matched[hit_rows, i] = True

    m = a_matched.sum(axis=1)
    sim = np.zeros(rows, np.float64)
    ok = m > 0
    if ok.any():
        # k-th matched byte of a vs k-th matched byte of b: scatter each
        # side's matched bytes into rank-indexed matrices, count mismatches.
        max_m = int(m.max())
        Ma = np.zeros((rows, max_m), np.int16)
        Mb = np.full((rows, max_m), -1, np.int16)
        rank_a = a_matched.cumsum(axis=1) - 1
        rank_b = b_matched.cumsum(axis=1) - 1
        rr, cc = np.nonzero(a_matched)
        Ma[rr, rank_a[rr, cc]] = A[rr, cc]
        rr, cc = np.nonzero(b_matched)
        Mb[rr, rank_b[rr, cc]] = B[rr, cc]
        t = ((Ma != Mb) & (np.arange(max_m) < m[:, None])).sum(axis=1) // 2

        mf = m.astype(np.float64)
        sim[ok] = (mf[ok] / tla[ok] + mf[ok] / tlb[ok] + (mf[ok] - t[ok]) / mf[ok]) / 3.0

        # Winkler prefix boost (only above the 0.7 threshold).
        pmax = min(_WINKLER_PREFIX_CAP, La, Lb)
        if pmax > 0:
            prefix_eq = A[:, :pmax] == B[:, :pmax]
            # common prefix length = position of first mismatch
            l = np.where(prefix_eq.all(axis=1), pmax, (~prefix_eq).argmax(axis=1))
            l = np.minimum(l, np.minimum(tla, tlb))
        else:  # pragma: no cover - La/Lb >= 1 whenever this runs
            l = np.zeros(rows, np.int64)
        boost = sim > _WINKLER_THRESHOLD
        sim[boost] = sim[boost] + (l[boost] * _WINKLER_SCALE) * (1.0 - sim[boost])
    return sim
