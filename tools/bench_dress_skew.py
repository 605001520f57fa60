"""Skew dress rehearsal (round 3, VERDICT r02 #4): adaptive per-block
salting vs fixed salt count on a Zipf-skewed block distribution.

The r02 dress rehearsals used uniform synthetic corpora; the adaptive-salting
claim (``candidate_pairs(adaptive_target_rows=…)``) deserves a corpus where
one block holds a double-digit share of all rows. This tool builds exactly
that — one giant block, a band of warm blocks, a long uniform tail — runs
the SAME lossless pair generation in both modes, and records the straggler
evidence the claim rests on:

* **wall time** per mode (same input, same session settings);
* **max-task / median-task duration** of the dominant (join) stage, read
  from Spark's own task metrics (UI REST ``taskSummary`` quantiles) — the
  literal straggler ratio;
* pair-count equality across modes (salting never changes the produced SET).

Under fixed S, the giant block's per-task pair fan-out is (n/S)² while warm
blocks idle at tiny tasks — ratio >> 1. Adaptive sizes S_b = ceil(n_b/target)
so every salted task sees ~target left rows — ratio ≈ 1.

Usage: python tools/bench_dress_skew.py [n_rows]   (default 50_000)
Writes BENCH/dress_rehearsal_skew.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def _build_session(tag: str):
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName(f"dress_skew_{tag}")
        .master(f"local[{cpus}]")
        # AQE off + many fixed-width partitions IN THIS TOOL ONLY: the
        # measurement wants raw task boundaries (AQE coalescing merges the
        # tail's tiny tasks and blurs the per-salt fan-out the experiment
        # isolates). The engine itself keeps AQE on — explicit salting and
        # AQE skew handling compose, per operators/blocking.py.
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "256")
        # no auto-broadcast: at this toy scale Spark would broadcast the
        # 50k-row side and run the join inside the (evenly partitioned)
        # cache scan, hiding the skew entirely; at 10^9-row scale the side
        # cannot broadcast and the shuffle join this experiment measures is
        # the plan that actually runs.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.session.timeZone", "UTC")
        # UI on: the REST API is the task-duration source
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def _zipf_blocks(spark, n: int):
    """(block_key, id): block 0 holds ~16% of rows, blocks 1-20 ~1.2% each,
    the rest a uniform tail of ~30-row blocks. Deterministic (id-derived)."""
    giant = int(n * 0.16)
    warm_each = int(n * 0.012)
    warm_total = warm_each * 20
    ids = spark.range(0, n).select(F.col("id"))
    key = (
        F.when(F.col("id") < giant, F.lit("giant"))
        .when(
            F.col("id") < giant + warm_total,
            F.concat(F.lit("warm"), ((F.col("id") - giant) / warm_each).cast("long").cast("string")),
        )
        .otherwise(F.concat(F.lit("tail"), (F.col("id") / 30).cast("long").cast("string")))
    )
    return ids.select(key.alias("block_key"), "id")


def _stage_straggler_ratio(spark) -> dict:
    """max/median task duration of the longest completed stage, via the UI
    REST API (taskSummary quantiles)."""
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def get(path):
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}{path}") as r:
            return json.loads(r.read())

    stages = [s for s in get("/stages?status=complete") if s.get("numCompleteTasks", 0) > 0]
    # the join stage: where the salted equi-join PRODUCES pairs — the stage
    # with the largest shuffle WRITE (the pair stream feeding the dedup
    # aggregation, whose own read side is hash-balanced in every mode)
    dom = max(stages, key=lambda s: s.get("shuffleWriteBytes", 0))
    summ = get(
        f"/stages/{dom['stageId']}/{dom['attemptId']}/taskSummary?quantiles=0.5,1.0"
    )
    med, mx = summ["executorRunTime"]
    n = dom["numCompleteTasks"]
    mean = dom.get("executorRunTime", 0) / max(n, 1)
    return {
        "stage_id": dom["stageId"],
        "n_tasks": n,
        "task_runtime_median_ms": med,
        "task_runtime_mean_ms": round(mean, 1),
        "task_runtime_max_ms": mx,
        # max/mean is the straggler metric that matters on a fixed-width
        # cluster: with T tasks on C cores the stage ends no earlier than
        # max(total/C, max_task); max/mean >> n_tasks/cores means one task
        # gates the stage. (max/median is noisy here: the uniform tail
        # contributes many near-zero tasks that drag the median.)
        "straggler_ratio_max_over_mean": round(mx / max(mean, 1e-9), 2),
        "straggler_ratio_max_over_median": round(mx / max(med, 1e-9), 2),
    }


def _run_mode(n: int, tag: str, **pair_kwargs) -> dict:
    from levenshtein_spark.operators.pairs import candidate_pairs

    spark = _build_session(tag)
    try:
        blocks = _zipf_blocks(spark, n).persist()
        blocks.count()
        t0 = time.monotonic()
        n_pairs = candidate_pairs(blocks, **pair_kwargs).count()
        wall = round(time.monotonic() - t0, 2)
        rec = {"mode": tag, "n_rows": n, "n_pairs": n_pairs, "wall_s": wall}
        rec.update(_stage_straggler_ratio(spark))
        return rec
    finally:
        spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    fixed = _run_mode(n, "fixed_s8", hot_threshold=500, num_salts=8)
    # target 250 ⇒ the giant block splits into S=ceil(8000/250)=32 salts
    # (~62k pairs/task) while warm blocks get S=2-3 — per-task pair fan-out
    # equalizes across the whole Zipf curve, which fixed S=8 cannot do
    # (giant tasks (n/8)² = 1M pairs, warm tasks ~10k).
    adaptive = _run_mode(
        n, "adaptive_t250", hot_threshold=500, num_salts=8, adaptive_target_rows=250
    )
    assert fixed["n_pairs"] == adaptive["n_pairs"], "salting changed the pair set!"
    out = {
        "corpus": "zipf: giant block 16% of rows, 20 warm blocks 1.2% each, 30-row tail",
        "fixed": fixed,
        "adaptive": adaptive,
        "speedup": round(fixed["wall_s"] / max(adaptive["wall_s"], 1e-9), 2),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/dress_rehearsal_skew.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
