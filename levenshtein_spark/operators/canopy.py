"""Canopy clustering — cheap-metric pre-clustering (McCallum, Nigam &
Ungar, "Efficient clustering of high-dimensional data sets with application
to reference matching", KDD 2000), in a deterministic distributed form.

Classic canopy is a sequential greedy scan: pick a point, make it a center,
remove everything within the TIGHT threshold, loosely assign everything
within the LOOSE threshold, repeat. The scan order makes it inherently
sequential, so the distributed variant here replaces it with an
**id-dominance rule** evaluated in one pass over the cheap-metric graph:

* cheap metric  — the CBS weight (``n_keys`` shared block keys) the pair
  stage already computes; tight = ``n_keys >= t_tight``, loose =
  ``n_keys >= t_loose`` (``t_loose <= t_tight``: the loose set contains
  the tight set).
* centers       — records with NO smaller-id tight neighbor (the greedy
  scan in id order, truncated to one round: a record dominated by any
  smaller tight neighbor cedes centerhood). Deterministic, order-free,
  one aggregation.
* assignment    — every record joins every center in its loose
  neighborhood (multi-assignment is canopy's defining trait: downstream
  expensive scoring runs within canopies, overlap preserves recall);
  records with no loose center become their own singleton canopy, so
  coverage is total.

vs sequential greedy: a record whose smaller tight neighbor was itself
dominated would, in the greedy, regain centerhood; the one-round dominance
rule keeps it a non-center and catches it via loose assignment or
self-canopy instead — strictly more canopies, never lost records. The
fixpoint of iterating the rule IS the greedy result; one round is the
scalable approximation and is documented as such.

Scale shape: everything rides the slim (id, id, n_keys) pair stream from
``operators.pairs.candidate_pairs`` (salted, skew-proof); centers are one
groupBy-min; assignment is one join against the (small) center set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def canopy_assign(
    weighted: DataFrame,
    ids: DataFrame,
    t_tight: int = 2,
    t_loose: int = 1,
) -> DataFrame:
    """(id_a, id_b, n_keys) pairs + (id) universe → (id, canopy_id) rows.

    ``canopy_id`` is the center's id. Multi-assignment: one row per
    (record, loose center). Every id appears at least once (self-canopy
    fallback). Centers appear with ``canopy_id = id``.
    """
    tight = weighted.where(F.col("n_keys") >= t_tight)
    # smaller-id tight neighbor exists → dominated → not a center
    dominated = tight.select(F.col("id_b").alias("id")).distinct()
    centers = ids.join(dominated, "id", "left_anti").select(
        F.col("id").alias("center")
    )

    loose = weighted.where(F.col("n_keys") >= t_loose)
    sym = loose.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nbr")
    ).unionByName(loose.select(F.col("id_b").alias("id"), F.col("id_a").alias("nbr")))
    assigned = sym.join(centers, sym.nbr == centers.center).select("id", "center")

    self_rows = centers.select(F.col("center").alias("id"), "center")
    covered = assigned.select("id").unionByName(self_rows.select("id")).distinct()
    orphans = ids.join(covered, "id", "left_anti").select(
        "id", F.col("id").alias("center")
    )
    return (
        assigned.unionByName(self_rows)
        .unionByName(orphans)
        .distinct()
        .withColumnRenamed("center", "canopy_id")
    )
