"""Vectorized Smith–Waterman local alignment — the third ER comparator.

The reference catalog is the edit-distance half of a comparator stack
(ReadMe.md:29-38); record-linkage practice pairs it with Jaro–Winkler
(``functions/jaro.py``) and with local-alignment scores (Smith & Waterman
1981; Monge & Elkan 1996 use an affine variant as their character-level
base). Where edit distance charges every byte of two strings, local
alignment finds the best-scoring *substring* alignment — robust to long
unshared prefixes/suffixes (addresses embedded in fields, middle names,
concatenated values) that drown a global measure.

Same batch-kernel discipline as ``levenshtein_spark.kernel``: NumPy across
the Arrow batch, zero per-row Python on the hot path. The within-row
left-gap dependency ``H[i][j] >= H[i][j-1] - gap`` — the part that defeats
naive vectorization — is closed in one pass with the max-plus prefix scan
``H[i][j] = max_{t<=j}(c[t] + gap·t) - gap·j`` (``np.maximum.accumulate``),
the same trick the DuckDB twin uses (``oracles.sw_cte``), so both engines
evaluate the identical recurrence.

Semantics (pinned by tests and the recursive-CTE oracle):

* classic linear-gap scoring, integer-valued: match ``+2``, mismatch
  ``-1``, gap ``-1`` per byte, floor 0 per cell; score = max cell.
* UTF-8 **byte** comparisons (reference byte semantics, ReadMe.md:50-51).
* NULL → empty string (src/prealgorithm.h:17-23); any empty side → 0.

All scores are exact integers, so cross-engine comparison is bit-trivial;
the normalized form ``score / (2·min(len))`` is one correctly-rounded
divide.

Scale shape: O(batch · la · lb) int16/int32 ops, fully vectorized; pairs
are processed in row chunks so peak memory is the chunk's
(rows × max_len) matrices, independent of batch size.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import col as _col, pandas_udf
from pyspark.sql.types import LongType

from levenshtein_spark.kernel import _to_bytes

SW_MATCH = 2
SW_MISMATCH = 1  # penalty (subtracted)
SW_GAP = 1  # penalty per gap byte (subtracted)

# Chunking bounds (kernel.py's cell-budget discipline): a chunk closes when
# rows x max_la x max_lb — the WORK the lockstep loop actually does, since
# every row is padded to the chunk maxima — would exceed _SW_CELL_BUDGET,
# or at _SW_PAIRS_CHUNK rows. Row-count-only chunking would let ONE long
# string inflate both the scratch (8k rows x a 1 MB value ≈ 32 GB) and the
# compute (8k x 1M x short) for the whole chunk; the cell budget isolates
# oversized pairs into their own chunks instead (a single pair may exceed
# the budget alone — its cost is irreducible).
_SW_PAIRS_CHUNK = 1 << 13
_SW_CELL_BUDGET = 1 << 27


def smith_waterman_ref(
    s1: Union[str, bytes, None], s2: Union[str, bytes, None]
) -> int:
    """Scalar reference implementation (tests / documentation of the exact
    conventions). Straight transcription of the published recurrence; the
    batch kernel is differentially tested against it."""
    a = _to_bytes(s1) or b""
    b = _to_bytes(s2) or b""
    la, lb = len(a), len(b)
    best = 0
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        for j in range(1, lb + 1):
            s = SW_MATCH if a[i - 1] == b[j - 1] else -SW_MISMATCH
            cur[j] = max(0, prev[j - 1] + s, prev[j] - SW_GAP, cur[j - 1] - SW_GAP)
            if cur[j] > best:
                best = cur[j]
        prev = cur
    return best


def batch_smith_waterman(
    a_list: Sequence[Union[str, bytes, None]],
    b_list: Sequence[Union[str, bytes, None]],
) -> np.ndarray:
    """Local-alignment scores for a batch of pairs (int64 array)."""
    n = len(a_list)
    out = np.zeros(n, dtype=np.int64)
    # Encode once; the cell budget must be sized in UTF-8 BYTES (the unit the
    # scratch matrices are padded to), not code points — multi-byte text would
    # otherwise blow the budget by up to 4x per side.
    ab = [_to_bytes(v) or b"" for v in a_list]
    bb = [_to_bytes(v) or b"" for v in b_list]
    lo = 0
    while lo < n:
        hi = lo
        max_la = max_lb = 1
        while hi < n and (hi - lo) < _SW_PAIRS_CHUNK:
            la = max(max_la, len(ab[hi]))
            lb = max(max_lb, len(bb[hi]))
            if (hi - lo + 1) * la * lb > _SW_CELL_BUDGET and hi > lo:
                break
            max_la, max_lb = la, lb
            hi += 1
        out[lo:hi] = _sw_chunk(ab[lo:hi], bb[lo:hi])
        lo = hi
    return out


def _sw_chunk(ab, bb) -> np.ndarray:
    """Score one chunk; inputs are pre-encoded byte strings."""
    rows = len(ab)
    la = np.fromiter((len(x) for x in ab), dtype=np.int64, count=rows)
    lb = np.fromiter((len(x) for x in bb), dtype=np.int64, count=rows)
    la_max = int(la.max(initial=0))
    lb_max = int(lb.max(initial=0))
    if la_max == 0 or lb_max == 0:
        return np.zeros(rows, dtype=np.int64)
    # distinct pad sentinels: padding never scores as a match
    A = np.full((rows, la_max), -1, dtype=np.int16)
    B = np.full((rows, lb_max), -2, dtype=np.int16)
    for r, x in enumerate(ab):
        if x:
            A[r, : len(x)] = np.frombuffer(x, dtype=np.uint8)
    for r, x in enumerate(bb):
        if x:
            B[r, : len(x)] = np.frombuffer(x, dtype=np.uint8)
    js = np.arange(lb_max + 1, dtype=np.int32)
    # score cells past lb are computed but masked out of the row max; the
    # left-to-right scan means they never influence valid cells to their left
    col_valid = js[None, 1:] <= lb[:, None]
    offs = (SW_GAP * js)[None, :].astype(np.int32)
    prev = np.zeros((rows, lb_max + 1), dtype=np.int32)
    candfull = np.zeros((rows, lb_max + 1), dtype=np.int32)
    best = np.zeros(rows, dtype=np.int32)
    for i in range(1, la_max + 1):
        active = la >= i
        if not active.any():
            break
        s = np.where(A[:, i - 1 : i] == B, SW_MATCH, -SW_MISMATCH).astype(np.int32)
        cand = np.maximum(prev[:, :-1] + s, prev[:, 1:] - SW_GAP)
        np.maximum(cand, 0, out=cand)
        candfull[:, 1:] = cand
        # H[i][j] = max(c[j], H[i][j-1]-gap) closed form: max-plus prefix scan
        cur = np.maximum.accumulate(candfull + offs, axis=1) - offs
        rowmax = np.max(np.where(col_valid, cur[:, 1:], 0), axis=1)
        upd = active & (rowmax > best)
        best[upd] = rowmax[upd]
        prev[active] = cur[active]
    return best.astype(np.int64)


@pandas_udf(LongType())
def _sw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(batch_smith_waterman(a.tolist(), b.tolist()))


def smith_waterman(a, b) -> Column:
    """Smith–Waterman local-alignment score over UTF-8 bytes (match +2,
    mismatch −1, gap −1, floor 0) as an Arrow-batched column function."""
    return _sw_udf(_col(a) if isinstance(a, str) else a,
                   _col(b) if isinstance(b, str) else b)
