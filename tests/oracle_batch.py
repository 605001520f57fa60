"""Batch-vectorized full-matrix OSA/Levenshtein oracle for nightly-scale
differential fuzzing.

The pure-Python ``levenshtein_spark.oracle`` verifies ~10^4 pairs in seconds;
the reference's randomized harness runs 10^5-10^6 pairs per edit type
(tests/unittests.cpp:186-278, comparetests.cpp:216-269). This oracle keeps
that scale affordable while staying STRUCTURALLY INDEPENDENT of the kernel
under test: plain full-matrix DP advanced cell-column by cell-column across
the batch — no band, no min-plus prefix scan, no trimming, no counting
bound, no iterative doubling. Agreement between the two is therefore a
meaningful differential, and ``tests/test_oracle_batch.py`` separately pins
this batch oracle against the scalar Python oracle (exhaustive small-
alphabet universe + random pairs, both variants, several caps).
"""

from __future__ import annotations

import numpy as np

_PAD = 0  # strings are letters; 0 never equals a real byte here


def _pack(words: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    n = np.fromiter((len(w) for w in words), np.int32, len(words))
    M = np.zeros((len(words), int(n.max(initial=1))), np.uint8)
    for r, w in enumerate(words):
        M[r, : len(w)] = np.frombuffer(w, np.uint8)
    return M, n


def batch_osa_full(a: list[bytes], b: list[bytes], transpositions: bool = True) -> np.ndarray:
    """Unbounded full-matrix distance for a batch of byte-string pairs.

    Direct batch transcription of oracle.osa_matrix / levenshtein_matrix
    (src/edit_dist_t_2d.cpp:101-123): dp rows kept per pair, every (i, j)
    cell computed — O(n*m) work, vectorized only across the batch axis.
    Cells beyond a pair's own lengths are computed but ignored; the answer
    is read at (n_r, m_r) per pair.
    """
    assert len(a) == len(b)
    if not a:
        return np.zeros(0, np.int64)
    A, na = _pack(a)
    B, nb = _pack(b)
    bsz, n_max = A.shape
    m_max = B.shape[1]

    width = m_max + 1
    prev2 = np.zeros((bsz, width), np.int32)
    prev = np.zeros((bsz, width), np.int32)
    cur = np.zeros((bsz, width), np.int32)
    prev[:] = np.arange(width, dtype=np.int32)[None, :]

    out = np.zeros(bsz, np.int64)
    # answers where one side is empty
    out[na == 0] = nb[na == 0]
    done0 = na == 0

    for i in range(1, n_max + 1):
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]  # (bsz, 1)
        cost = (B != ai).astype(np.int32)  # (bsz, m_max)
        for j in range(1, m_max + 1):
            c = np.minimum(prev[:, j] + 1, prev[:, j - 1] + cost[:, j - 1])
            np.minimum(c, cur[:, j - 1] + 1, out=c)
            if transpositions and i >= 2 and j >= 2:
                tr = (A[:, i - 1] == B[:, j - 2]) & (A[:, i - 2] == B[:, j - 1])
                c = np.where(tr, np.minimum(c, prev2[:, j - 2] + cost[:, j - 1]), c)
            cur[:, j] = c
        fin = (~done0) & (na == i)
        if fin.any():
            rows = np.flatnonzero(fin)
            out[rows] = cur[rows, nb[rows]]
        prev2, prev, cur = prev, cur, prev2
    return out


def ref_batch(
    a: list[bytes], b: list[bytes], k: int | None, transpositions: bool = True
) -> np.ndarray:
    """Reference bounded convention over the unbounded full-matrix batch:
    k_eff = min(k, max(len)); NULL/empty exits bypass the cap; length-diff
    and exceeded distances return k_eff + 1 (SURVEY.md §2.2)."""
    la = np.fromiter((len(x) for x in a), np.int64, len(a))
    lb = np.fromiter((len(x) for x in b), np.int64, len(b))
    m = np.maximum(la, lb)
    keff = m if k is None else np.minimum(k, m)
    d = batch_osa_full(a, b, transpositions)
    out = np.minimum(d, keff + 1)
    empty = (la == 0) | (lb == 0)
    out[empty] = m[empty]  # cap bypassed (prealgorithm.h:17-23,69-75)
    return out
