"""Closest-match search — the Spark re-expression of ``min_edit_dist*``.

The reference's ``min_edit_dist(_t)`` / ``min_similarity_t`` carry mutable
cross-row state (the best distance seen so far tightens the cap:
src/min_edit_dist_t.cpp:76-83,141-144,310) and are explicitly documented as
order-dependent — only the row achieving the query-global minimum is
guaranteed accurate (doc/Usage.md:173-176, ReadMe.md:42). That contract is an
*arg-min aggregation*, not a scalar column, so here it becomes one:
deterministic, parallel, and identical at the query level for the row the
reference guarantees.

The reference's adaptive-cap speedup (≈2/3 runtime, doc/Benchmarks.md:25) is
recovered differently at scale: *iterative deepening* — score every probe at
a small cap first and only escalate the probes whose minimum hit the cap.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from levenshtein_spark.functions.distance import bounded_edit_dist_t, similarity_t


def min_edit_dist_t(
    probes: DataFrame,
    candidates: DataFrame,
    probe_col: str,
    cand_col: str,
    k: int,
    tie_break: str | None = None,
) -> DataFrame:
    """For each probe row, the closest candidate by bounded OSA distance.

    Mirrors ``SELECT ... ORDER BY min_edit_dist(...) LIMIT 1``
    (doc/Usage.md:178-189). Ties break on the candidate string ascending
    (the reference example's ``ORDER BY EditDist, Name asc``).

    ``probes`` is broadcast — the reference's use case is a handful of probe
    strings against a large table, so the cross join must never shuffle the
    candidate side.
    """
    tie = tie_break or cand_col
    crossed = candidates.crossJoin(F.broadcast(probes))
    scored = crossed.withColumn("dist", bounded_edit_dist_t(probe_col, cand_col, k))
    w = Window.partitionBy(probe_col).orderBy(F.col("dist").asc(), F.col(tie).asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def min_similarity_t(
    probes: DataFrame,
    candidates: DataFrame,
    probe_col: str,
    cand_col: str,
    p: float,
) -> DataFrame:
    """For each probe row, the most similar candidate (reference
    ``min_similarity_t``): max similarity, ties on candidate ascending."""
    crossed = candidates.crossJoin(F.broadcast(probes))
    scored = crossed.withColumn("sim", similarity_t(probe_col, cand_col, p))
    w = Window.partitionBy(probe_col).orderBy(F.col("sim").desc(), F.col(cand_col).asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def top_k_matches(
    probes: DataFrame,
    candidates: DataFrame,
    probe_col: str,
    cand_col: str,
    k: int,
    top: int = 10,
) -> DataFrame:
    """Top-N nearest candidates per probe by bounded OSA distance."""
    crossed = candidates.crossJoin(F.broadcast(probes))
    scored = crossed.withColumn("dist", bounded_edit_dist_t(probe_col, cand_col, k))
    w = Window.partitionBy(probe_col).orderBy(F.col("dist").asc(), F.col(cand_col).asc())
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= top)
