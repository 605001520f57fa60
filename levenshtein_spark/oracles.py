"""DuckDB oracle-SQL generators for the driver's correctness gate.

Every query in ``__spark_entry__.queries()`` carries an ANSI-SQL twin that
DuckDB runs on the same parquet tables. Most expressions are portable by
construction (md5 hex, integer math, window functions). The two non-trivial
pieces live here:

* **A true-OSA oracle in SQL.** DuckDB's ``damerau_levenshtein`` is the
  *unrestricted* distance (``damerau_levenshtein('CA','ABC') = 2``) while the
  reference is the restricted OSA variant (``edit_dist_t('CA','ABC') = 3``,
  rljacobson/Levenshtein ``src/edit_dist_t_2d.cpp:110-121``, oracle duplicated
  at ``tests/unittests.cpp:55-66``). We therefore ship the full OSA dynamic
  program as a recursive CTE: the DP advances one subject row per recursion
  step, the intra-row left-neighbour dependency is resolved with the same
  min-plus prefix identity the NumPy kernel uses
  (``D[i][j] = j + min_{t<=j}(cand[t] - t)``), and the transposition term uses
  the reference's quirk of adding the *current pair's substitution cost*
  rather than a constant 1.

* **Portable 60-bit hashing.** Spark ``conv(substr(md5(x),1,15),16,10)`` and
  DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT`` produce the same
  non-negative 60-bit integer, so MinHash/SimHash/winnowing fingerprints can
  be verified bit-for-bit.
"""

from __future__ import annotations

# DuckDB expression computing the same 60-bit portable hash as
# levenshtein_spark.functions.hashing.hash64 (seed mixed in as text).
def dd_hash64(expr: str, seed: int = 0) -> str:
    payload = f"concat('{seed}', chr(31), {expr})" if seed else expr
    return f"(('0x' || substr(md5({payload}), 1, 15))::BIGINT)"


def dd_word_tokens(expr: str) -> str:
    """DuckDB twin of functions.text.word_tokens (lowercased [a-z0-9]+ runs)."""
    return f"list_filter(regexp_split_to_array(lower({expr}), '[^a-z0-9]+'), t -> t <> '')"


def osa_cte(pairs_sql: str, max_i_expr: str = "p.n") -> str:
    """Recursive-CTE computing reference OSA over a pair relation.

    ``pairs_sql`` must be a complete SELECT producing columns
    ``(pid, s1, s2)`` with unique pid. The returned WITH-clause body defines
    ``osa_result(pid, osa)``. Cost is O(n * m^2) list ops per pair — intended
    for oracle duty on hundreds-to-thousands of short strings, never the hot
    path (mirrors the role of the reference's full-matrix ``edit_dist_t_2d``,
    "testing and benchmarking purposes only", src/edit_dist_t_2d.cpp:8-9).
    """
    return f"""
osa_pairs AS ({pairs_sql}),
osa_p AS (
  SELECT pid, s1, s2, length(s1) AS n, length(s2) AS m FROM osa_pairs
),
osa_dp(pid, i, prev2, prev) AS (
  SELECT pid, 0, CAST(NULL AS BIGINT[]),
         list_transform(range(0, m + 1), j -> CAST(j AS BIGINT))
  FROM osa_p
  UNION ALL
  SELECT d.pid, d.i + 1, d.prev,
    (
      WITH c AS (
        SELECT list_transform(range(0, p.m + 1), j ->
          CASE WHEN j = 0 THEN CAST(d.i + 1 AS BIGINT)
          ELSE least(
            d.prev[j + 1] + 1,
            d.prev[j] + (CASE WHEN substr(p.s1, d.i + 1, 1) = substr(p.s2, j, 1)
                         THEN 0 ELSE 1 END),
            CASE WHEN d.i >= 1 AND j >= 2
                      AND substr(p.s1, d.i + 1, 1) = substr(p.s2, j - 1, 1)
                      AND substr(p.s1, d.i, 1) = substr(p.s2, j, 1)
                 THEN d.prev2[j - 1] +
                      (CASE WHEN substr(p.s1, d.i + 1, 1) = substr(p.s2, j, 1)
                       THEN 0 ELSE 1 END)
                 ELSE 1048576 END
          ) END) AS cand
      )
      SELECT list_transform(range(0, p.m + 1), j ->
        CASE WHEN j = 0 THEN cand[1]
             ELSE j + list_min(list_transform(range(0, j + 1), t -> cand[t + 1] - t))
        END)
      FROM c
    )
  FROM osa_dp d JOIN osa_p p USING (pid)
  WHERE d.i < {max_i_expr}
),
osa_result AS (
  SELECT d.pid, d.prev[p.m + 1] AS osa
  FROM osa_dp d JOIN osa_p p USING (pid)
  WHERE d.i = p.n
)"""


def bounded_osa_expr(k: int, la: str = "length(s1)", lb: str = "length(s2)") -> str:
    """least(osa, k_eff + 1) with k_eff = least(k, greatest(len_a, len_b)) —
    the reference's bounded convention (src/bounded_edit_dist_t.cpp:284)."""
    return f"least(osa, least({k}, greatest({la}, {lb})) + 1)"


def sw_cte(pairs_sql: str) -> str:
    """Recursive-CTE computing the Smith–Waterman local-alignment score
    (match +2, mismatch -1, gap -1, floor 0 — functions/align.py constants)
    over a pair relation.

    ``pairs_sql`` must be a complete SELECT producing ``(pid, s1, s2)`` with
    unique pid and non-NULL strings. Defines ``sw_result(pid, sw)``. The
    within-row left-gap dependency is closed with the same max-plus prefix
    scan the NumPy kernel uses: ``H[i][j] = max_{t<=j}(c[t] + t) - j`` where
    ``c[t] = max(0, diag, up-1)`` and ``c[0] = 0``. The recursion retains
    every row i, so the global max cell is an aggregate over iterations —
    no running-best column needed. Oracle duty only (O(n·m²) list ops per
    pair), mirroring the role of the reference's full-matrix
    ``edit_dist_t_2d`` (src/edit_dist_t_2d.cpp:8-9).

    Unit caveat (shared with ``osa_cte``): DuckDB ``substr``/``length``
    count CHARACTERS while the NumPy kernel scores UTF-8 BYTES — identical
    on ASCII, divergent on multi-byte text ('é' scores 4 in the kernel,
    2 here). Every driver query routed through this CTE runs on ASCII
    columns (customer names); a non-ASCII corpus needs a blob-based twin.
    """
    from levenshtein_spark.functions.align import SW_GAP, SW_MATCH, SW_MISMATCH

    g = SW_GAP
    return f"""
sw_pairs AS ({pairs_sql}),
sw_p AS (
  SELECT pid, s1, s2, length(s1) AS n, length(s2) AS m FROM sw_pairs
),
sw_dp(pid, i, prev) AS (
  SELECT pid, 0, list_transform(range(0, m + 1), j -> CAST(0 AS BIGINT))
  FROM sw_p
  UNION ALL
  SELECT d.pid, d.i + 1,
    (
      WITH c AS (
        SELECT list_transform(range(0, p.m + 1), j ->
          CASE WHEN j = 0 THEN CAST(0 AS BIGINT)
          ELSE greatest(
            CAST(0 AS BIGINT),
            d.prev[j] + (CASE WHEN substr(p.s1, d.i + 1, 1) = substr(p.s2, j, 1)
                         THEN {SW_MATCH} ELSE {-SW_MISMATCH} END),
            d.prev[j + 1] - {g}
          ) END) AS cand
      )
      SELECT list_transform(range(0, p.m + 1), j ->
        CASE WHEN j = 0 THEN CAST(0 AS BIGINT)
             ELSE list_max(list_transform(range(0, j + 1), t -> cand[t + 1] + {g} * t)) - {g} * j
        END)
      FROM c
    )
  FROM sw_dp d JOIN sw_p p USING (pid)
  WHERE d.i < p.n
),
sw_result AS (
  SELECT pid, greatest(max(list_max(prev)), 0) AS sw FROM sw_dp GROUP BY pid
)"""
