"""Cluster repair for transitive-closure over-merging.

Connected components is recall-maximal by construction: ONE spurious edge
bridges two real entities into a single cluster, and no amount of scoring
after the fact undoes it. The standard production repair is structural —
an edge that (a) closes no triangle in the match graph and (b) joins two
endpoints that each have independent support elsewhere is a *bridge*: the
only evidence for the merge is the edge itself, and pruning it splits the
over-merged cluster while leaving stars, chains' end edges, and isolated
matched pairs intact (truss/edge-support decomposition is the same test
with higher thresholds; ``linkage_cluster_density`` is the companion
scorecard that finds the clusters worth repairing).

Scale shape: triangle support is the canonical one-round common-neighbor
join over the symmetrized edge list — cost Σ deg², the same envelope as
the meta-blocking node statistics; degrees are one map-side-combining
groupBy. Everything is exact integer arithmetic, so the DuckDB twin
hash-matches by construction.

Reference tie-in: the reference stops at pair distances
(doc/Usage.md:101-189); repair operates on the match graph those distances
induce, a stage the reference's host SQL cannot express.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def edge_support(edges: DataFrame) -> DataFrame:
    """(src, dst, support, deg_src, deg_dst) for a (src, dst) edge list
    (undirected, stored src < dst). ``support`` = number of triangles the
    edge closes; degrees count all incident edges."""
    e = edges.select("src", "dst")
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    na = sym.select(F.col("src").alias("_a"), F.col("dst").alias("_xa"))
    nb = sym.select(F.col("src").alias("_b"), F.col("dst").alias("_xb"))
    supp = (
        e.join(na, F.col("src") == F.col("_a"))
        .join(nb, (F.col("dst") == F.col("_b")) & (F.col("_xa") == F.col("_xb")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    return (
        e.join(supp, ["src", "dst"], "left")
        .withColumn("support", F.coalesce("support", F.lit(0)).cast("long"))
        .join(deg.select(F.col("id").alias("src"), F.col("deg").alias("deg_src")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("deg_dst")), "dst")
        .select("src", "dst", "support", "deg_src", "deg_dst")
    )


def prune_bridges(edges: DataFrame) -> DataFrame:
    """Keep an edge iff it closes ≥1 triangle OR either endpoint has no
    other neighbor. What gets pruned is exactly the bridge case: zero
    triangle support while BOTH endpoints are independently matched
    elsewhere — the single-edge merges transitive closure cannot be
    trusted on."""
    s = edge_support(edges)
    return s.where(
        (F.col("support") >= 1) | (F.col("deg_src") == 1) | (F.col("deg_dst") == 1)
    ).select("src", "dst")
