"""Scale evidence for KwikCluster pivot clustering (operators/clustering.py).

Synthetic deterministic random graphs at two sizes (10x apart), generated
distributed (no driver-side edge list): nodes 1..N, E = 3N edges with
xxhash64-derived endpoints — a supercritical sparse regime (giant component
plus fringe), the adversarial case for round counts.

Reports, per size: wall, MIS rounds, the per-round active-set decay, and
cluster count — the claim under test is rounds ~ O(log N) (Blelloch/
Fineman/Shun for greedy-MIS random-order rounds), so 10x the graph should
add ~constant rounds, not 10x, and wall should track the edge count, not
N^2. An invariant check (every member adjacent to its pivot; pivots form
an independent set) runs on the small config via a collected sample.

Writes BENCH/pivot_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from levenshtein_spark.operators.clustering import pivot_labels
from levenshtein_spark.session import get_spark, release_caches


def graph(spark, n: int, seed: int):
    ids = spark.range(1, n + 1).select(F.col("id").cast("long"))
    e = (
        spark.range(3 * n)
        .select(
            (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(n)) + 1).alias("src"),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(n)) + 1).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    return ids, e


def run(spark, n: int, seed: int = 7) -> dict:
    ids, e = graph(spark, n, seed)
    stats: dict = {}
    t0 = time.perf_counter()
    labels = pivot_labels(ids, e, stats=stats)
    n_labeled, n_clusters = labels.agg(
        F.count(F.lit(1)), F.countDistinct("cluster_id")
    ).collect()[0]
    wall = time.perf_counter() - t0
    release_caches(spark)
    return {
        "n_nodes": n,
        "n_edges_drawn": 3 * n,
        "wall_s": round(wall, 2),
        "rounds": stats["rounds"],
        "active_per_round": stats["active_per_round"],
        "n_labeled": int(n_labeled),
        "n_clusters": int(n_clusters),
    }


def check_invariants(spark, n: int = 20000, seed: int = 7) -> dict:
    ids, e = graph(spark, n, seed)
    labels = pivot_labels(ids, e)
    sym = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    pivots = labels.where(F.col("id") == F.col("cluster_id")).select("id")
    # members adjacent to their pivot
    members = labels.where(F.col("id") != F.col("cluster_id"))
    bad_member = members.join(
        sym,
        (members["id"] == sym["src"]) & (members["cluster_id"] == sym["dst"]),
        "left_anti",
    ).count()
    # pivots form an independent set
    bad_pivot = (
        sym.join(pivots.withColumnRenamed("id", "src"), "src")
        .join(pivots.withColumnRenamed("id", "dst"), "dst")
        .count()
    )
    release_caches(spark)
    assert bad_member == 0, f"{bad_member} members not adjacent to their pivot"
    assert bad_pivot == 0, f"{bad_pivot} pivot-pivot edges (not an independent set)"
    return {"n": n, "non_adjacent_members": int(bad_member), "pivot_pivot_edges": int(bad_pivot)}


def main() -> None:
    spark = get_spark("bench_pivot")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "invariants": check_invariants(spark),
        "configs": [run(spark, 100_000), run(spark, 1_000_000)],
    }
    a, b = out["configs"]
    out["wall_ratio_10x"] = round(b["wall_s"] / a["wall_s"], 2)
    out["rounds_delta_10x"] = b["rounds"] - a["rounds"]
    print(json.dumps(out, indent=2))
    with open("BENCH/pivot_scale.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
