"""Full-matrix OSA oracle — the correctness reference for the kernel.

Direct port of the reference's own oracle UDF ``edit_dist_t_2d``
(``src/edit_dist_t_2d.cpp:93-124``) and of the differential-test oracle
``calculateDamLevDistance`` (``tests/unittests.cpp:42-69``), wrapped with the
same pre-algorithm semantics as the production kernels
(``src/prealgorithm.h:17-86``, ``src/validate_max.h:19``). Pure Python, O(n*m)
— used only in tests and gold-label generation, never on the hot path.
"""

from __future__ import annotations

from typing import Optional, Union


def _to_bytes(v: Union[str, bytes, None]) -> Optional[bytes]:
    if v is None:
        return None
    if isinstance(v, bytes):
        return v
    return str(v).encode("utf-8")


def osa_matrix(s1: bytes, s2: bytes) -> int:
    """Restricted Damerau–Levenshtein (OSA), full matrix.

    Port of ``src/edit_dist_t_2d.cpp:101-123``: transposition candidate is
    ``dp[i-2][j-2] + cost`` with ``cost`` the substitution cost of the current
    pair; no edits inside a transposed pair.
    """
    n, m = len(s1), len(s2)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        dp[i][0] = i
    for j in range(m + 1):
        dp[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if s1[i - 1] == s2[j - 1] else 1
            d = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1, dp[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and s1[i - 1] == s2[j - 2] and s1[i - 2] == s2[j - 1]:
                d = min(d, dp[i - 2][j - 2] + cost)
            dp[i][j] = d
    return dp[n][m]


def levenshtein_matrix(s1: bytes, s2: bytes) -> int:
    """Plain Levenshtein, full matrix (``src/edit_dist.cpp`` semantics)."""
    n, m = len(s1), len(s2)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if s1[i - 1] == s2[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def ref_edit_distance(
    a: Union[str, bytes, None],
    b: Union[str, bytes, None],
    k: Optional[int] = None,
    transpositions: bool = True,
) -> int:
    """Reference-semantics edit distance (the contract of SURVEY.md §2.2)."""
    ab, bb = _to_bytes(a), _to_bytes(b)
    la = 0 if ab is None else len(ab)
    lb = 0 if bb is None else len(bb)
    m, n = max(la, lb), min(la, lb)
    if ab is None or bb is None:
        return m  # prealgorithm.h:17-23 — cap bypassed
    if k is not None and k < 0:
        raise ValueError("maximum edit distance cannot be negative")
    keff = m if k is None else min(k, m)  # validate_max.h:19 + bounded_*.cpp:113
    if n == 0:
        return m  # prealgorithm.h:69-75 — cap bypassed
    if m - n > keff:
        return keff + 1  # prealgorithm.h:77-86
    d = osa_matrix(ab, bb) if transpositions else levenshtein_matrix(ab, bb)
    return min(keff + 1, d)  # bounded_edit_dist_t.cpp:284


def ref_similarity(
    a: Union[str, bytes, None], b: Union[str, bytes, None], p: float
) -> float:
    """Reference-semantics similarity (``src/similarity_t.cpp``)."""
    if not (0.0 <= p <= 1.0):
        raise ValueError("similarity must be in the interval [0.0, 1.0]")
    ab, bb = _to_bytes(a), _to_bytes(b)
    la = 0 if ab is None else len(ab)
    lb = 0 if bb is None else len(bb)
    m = max(la, lb)
    if m == 0:
        return 1.0  # documented deviation: empty/empty is identical
    kmax = int((1.0 - p) * m)  # similarity_to_max_edits, similarity_t.cpp:56-58
    d = min(
        ref_edit_distance(ab if ab is not None else b"", bb if bb is not None else b"", kmax),
        kmax + 1,
    )
    result = max(0.0, 1.0 - d / m)
    floor = max(0.0, 1.0 - (kmax + 1.0) / m)  # similarity_t.cpp:141-142
    return max(result, floor)  # similarity_t.cpp:290
