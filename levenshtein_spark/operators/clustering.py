"""Stage 5 — transitive closure: large-star/small-star connected components.

Pure-DataFrame implementation of the two-phase star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) — O(log n)
rounds, no GraphFrames/MLlib dependency, no ``collect_list`` (the per-node
neighbor minimum comes from a groupBy().min() + join, so a hot node never
materializes its neighbor list in one task).

Each star phase is a groupBy + join; the round's edge set is deduplicated
once (at the end of small-star) rather than per phase, and
``steps_per_check`` rounds compose lazily into a single lineage-truncating
materialization + convergence job, so the loop pays one Spark job per check
instead of one per phase. Convergence = the canonical edge set is unchanged
(count + order-insensitive hash), at which point every component is a star
rooted at its minimum id.

The reference has no equivalent operator — its host DBMS queries stop at
pairs (doc/Usage.md) — but the north_rule's entity clusters require the
closure of the match relation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _canon(df: DataFrame, a: str, b: str, dedup: bool = True) -> DataFrame:
    """Undirected edge set in canonical (src < dst) form, no self-loops.

    ``dedup=False`` skips the distinct(): both star phases are insensitive to
    duplicate edges (groupBy().min() and the join fan-out dedup at the end of
    the round), so deduping once per round instead of once per phase removes
    a full shuffle from the loop body at every scale.
    """
    out = df.select(
        F.least(F.col(a), F.col(b)).alias("src"),
        F.greatest(F.col(a), F.col(b)).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return out.distinct() if dedup else out


def _large_star(edges: DataFrame) -> DataFrame:
    d = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    mins = d.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.withColumn("m", F.least("mn", "u")).select("u", "m")
    out = d.join(mins, "u").where(F.col("v") > F.col("u")).select("v", "m")
    # no dedup here: small-star dedups the round's output one shuffle later
    return _canon(out, "v", "m", dedup=False)


def _small_star(edges: DataFrame) -> DataFrame:
    # canonical edges already have src < dst; key by the larger endpoint
    d = edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    out1 = d.join(mins, "u").where(F.col("v") != F.col("m")).select("v", "m")
    out2 = mins.select(F.col("u").alias("v"), "m")
    return _canon(out1.unionAll(out2), "v", "m")


def _signature(edges: DataFrame) -> tuple[int, int]:
    # XOR-fold is order-insensitive and can't overflow under ANSI mode.
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
    steps_per_check: int = 1,
) -> DataFrame:
    """edge list (src, dst) → labels (id, cluster_id) for every edge endpoint.

    cluster_id is the minimum member id — deterministic across runs and
    partitionings. Nodes not present in any edge are absent (callers union
    singletons back; see ``cluster_labels``).

    Lineage truncation per round: ``localCheckpoint`` by default (fast, but
    executor-local blocks — one lost executor kills the iteration on a real
    cluster), or **reliable** parquet round-trips under ``checkpoint_dir``
    when provided (the production setting: each round's edge set is a
    re-readable table, so executor loss only recomputes the current round —
    same discipline as the warehouse stage checkpoints in plans/linkage.py).
    """
    spark = edges.sparkSession

    def materialize(df: DataFrame, rnd: int) -> DataFrame:
        if checkpoint_dir is None:
            # lazy: the signature action right after is the ONE job that
            # both materializes the checkpoint and checks convergence —
            # an eager checkpoint would double the job count of the loop,
            # which is pure scheduling overhead at every scale
            return df.localCheckpoint(eager=False)
        path = f"{checkpoint_dir}/cc_round_{rnd:03d}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    e = materialize(_canon(edges, "src", "dst"), 0)
    sig = _signature(e)  # materializes round 0 + counts in one job
    if sig[0] == 0:
        return spark.createDataFrame([], "id string, cluster_id string")

    for rnd in range(1, max_iterations + 1):
        # ``steps_per_check`` star-rounds compose lazily into one
        # materialization + one signature job. Measured on this host the
        # deep composed plan costs more than the saved signature jobs, so
        # the default stays 1; the knob remains for clusters where the
        # convergence-check action (not stage setup) dominates. Extra
        # rounds past convergence are no-ops on a star forest (both phases
        # are idempotent there), so overshooting by one is safe.
        for _ in range(steps_per_check):
            e = _small_star(_large_star(e))
        e = materialize(e, rnd)
        new_sig = _signature(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")

    # Star forest: src is the component root (min id).
    members = e.select(F.col("dst").alias("id"), F.col("src").alias("cluster_id"))
    roots = e.select(F.col("src").alias("id"), F.col("src").alias("cluster_id")).distinct()
    return members.unionAll(roots)


def cluster_labels(
    all_ids: DataFrame, edges: DataFrame, checkpoint_dir: str | None = None
) -> DataFrame:
    """Labels for every row id: component root for matched rows, self for
    singletons. ``all_ids`` must have column ``id``."""
    comp = connected_components(edges, checkpoint_dir=checkpoint_dir)
    return (
        all_ids.select("id")
        .join(comp, "id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "id"))
    )


def dbscan_labels(all_ids: DataFrame, edges: DataFrame, min_pts: int) -> DataFrame:
    """DBSCAN labels over a precomputed eps-neighborhood edge set
    (Ester et al. 1996, the graph phase): given undirected ``edges(src,
    dst)`` — whatever candidate generator + verifier produced them — and
    ``all_ids(id)``, returns ``(id, deg, is_core, cluster)``:

    * ``deg``      — eps-neighbor count (excluding the point itself);
    * ``is_core``  — ``deg + 1 >= min_pts`` — the textbook rule counts the
      point inside its own eps-neighborhood (|N_eps(p)| includes p), so a
      published MinPts configuration ports verbatim;
    * ``cluster``  — cores: min core id of their core-core component (the
      same star-contraction closure as linkage clustering); border points
      (non-core with a core neighbor): the MIN core neighbor's cluster —
      plain DBSCAN leaves border assignment order-dependent, min-label is
      the canonical tie-free choice; noise: -1.

    Scale shape: degree is a map-side-combining count on the slim symmetric
    edge stream; components run over core-core edges only; border
    assignment is one edge-keyed join + min-agg. Nothing here ever touches
    payloads — the operator composes with any blocked edge family.
    """
    # .distinct() makes deg robust to duplicate edges or an input that is
    # already symmetrized — double-counted degrees would silently flip
    # is_core. The extra shuffle is on the slim (v, nb) pair stream.
    sym = (
        edges.select(F.col("src").alias("v"), F.col("dst").alias("nb"))
        .unionByName(edges.select(F.col("dst").alias("v"), F.col("src").alias("nb")))
        .distinct()
    )
    from levenshtein_spark.session import scoped_persist

    sym = sym.transform(scoped_persist)
    deg = (
        all_ids.select(F.col("id").alias("v"))
        .join(sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg")), "v", "left")
        .select("v", F.coalesce("deg", F.lit(0)).cast("long").alias("deg"))
    )
    core = deg.where(F.col("deg") + 1 >= min_pts).select("v").transform(scoped_persist)
    core_edges = (
        sym.join(core.withColumnRenamed("v", "__ca"), sym["v"] == F.col("__ca"))
        .join(core.withColumnRenamed("v", "__cb"), sym["nb"] == F.col("__cb"))
        .select(F.col("v").alias("src"), F.col("nb").alias("dst"))
    )
    comp = cluster_labels(core.select(F.col("v").alias("id")), core_edges).select(
        F.col("id").alias("v"), F.col("cluster_id").alias("core_cl")
    )
    border = (
        sym.join(
            comp.select(F.col("v").alias("nb"), F.col("core_cl").alias("nb_cl")), "nb"
        )
        .groupBy("v")
        .agg(F.min("nb_cl").alias("border_cl"))
    )
    return (
        deg.join(comp, "v", "left")
        .join(border, "v", "left")
        .select(
            F.col("v").alias("id"),
            "deg",
            F.col("core_cl").isNotNull().alias("is_core"),
            F.coalesce("core_cl", "border_cl", F.lit(-1)).cast("long").alias("cluster"),
        )
    )
