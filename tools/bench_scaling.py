"""Scaling-efficiency evidence: the same job at two parallelism levels.

The north_rule's N vs 4N executor criterion cannot use a real cluster in
this sandbox, so (per the driver instruction) we run the identical scoring
job at local[8] and local[32] on the same input and report throughput at
both plus scaling efficiency

    eff = (T_8core * 8) / (T_32core * 32)        (work-normalized, target >= 0.8)

Each run is a fresh spark-submit-style subprocess (fresh JVM + Python
workers) so neither run inherits the other's warm state. The measured job is
the heart of the pipeline: candidate-pair scoring with the Arrow-batched
banded-OSA kernel over the documents corpus, after a warm-up pass that
amortizes one-time Python-worker startup out of the measurement.

Usage: python tools/bench_scaling.py [sf_dir]   (writes BENCH/scaling.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import time
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
import pyspark.sql.functions as F
from levenshtein_spark.session import get_spark
from levenshtein_spark.driver_queries.linkage import _LEN_BAND, _PREFIX, docs_as_code_files
from levenshtein_spark.functions.distance import bounded_edit_dist_t
from levenshtein_spark.operators.blocking import exploded_blocks
from levenshtein_spark.operators.normalize import normalize
from levenshtein_spark.operators.pairs import attach_pair_payload, candidate_pairs
from levenshtein_spark.session import warm_python_workers

cpus = int(sys.argv[1])
sf_dir = sys.argv[2]
spark = get_spark(f"scaling_{cpus}", master=f"local[{cpus}]")
warm_python_workers(spark)

norm = normalize(docs_as_code_files(spark, sf_dir), prefix_len=_PREFIX)
slim = candidate_pairs(
    exploded_blocks(norm, len_band=_LEN_BAND), hot_threshold=50, num_salts=8
)
# replicate the pair set so the measured job is compute-bound (~minutes of
# single-core kernel work), not dominated by per-stage fixed overhead
REP = 8
pairs = (
    attach_pair_payload(slim, norm, ["content_prefix"])
    .select("content_prefix_a", "content_prefix_b")
    .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(REP))))
    .repartition(4 * cpus)
    .persist()
)
n_pairs = pairs.count()

def job():
    return (
        pairs.select(bounded_edit_dist_t("content_prefix_a", "content_prefix_b", 8).alias("d"))
        .agg(F.sum("d")).collect()[0][0]
    )

job()  # warm-up: Python worker fork + import + cache-read cost paid here
times = []
for _ in range(5):
    t0 = time.perf_counter(); job(); times.append(time.perf_counter() - t0)
best = min(times)
print(json.dumps({"cpus": cpus, "pairs": n_pairs, "sec": round(best, 3),
                  "all_runs_sec": [round(t, 2) for t in times],
                  "pairs_per_sec": round(n_pairs / best, 1)}))
"""


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), sf_dir],
        capture_output=True, text=True, env=env, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _kernel_mp_scaling() -> dict:
    """Control: the raw NumPy kernel under plain multiprocessing (no JVM).

    Separates kernel scalability from single-JVM local-mode co-location
    artifacts (Arrow writer threads, task threads, and Python workers all
    share the same 32 cores in local mode — three thread pools per core at
    local[32], which a real N-executor cluster never has)."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    results = {}
    for nproc in (8, 32):
        with ctx.Pool(nproc) as pool:
            t0 = time.perf_counter()
            pool.map(_mp_work, range(32))
            results[nproc] = round(time.perf_counter() - t0, 2)
    eff = (results[8] * 8) / (results[32] * 32)
    return {"wall_8": results[8], "wall_32": results[32], "efficiency": round(eff, 3)}


def _mp_work(seed: int) -> float:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np

    from levenshtein_spark.kernel import batch_edit_distance

    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghij "))
    a = ["".join(rng.choice(letters, 40)) for _ in range(25000)]
    b = [s[:20] + "x" + s[21:] for s in a]
    t0 = time.perf_counter()
    batch_edit_distance(a, b, k=8)
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    result = {"sf_dir": sf_dir, "pairs": {}}
    for lo, hi in ((8, 32), (4, 16)):
        r_lo = run(lo, sf_dir)
        r_hi = run(hi, sf_dir)
        eff = (r_lo["sec"] * lo) / (r_hi["sec"] * hi)
        result["pairs"][f"local[{lo}]->local[{hi}]"] = {
            "low": r_lo, "high": r_hi, "scaling_efficiency": round(eff, 3),
        }
    result["kernel_multiprocessing_control"] = _kernel_mp_scaling()
    result["method"] = (
        "same scoring job, fresh JVM per parallelism level, warm workers, "
        "best of 5 runs; eff = (T_lo*lo)/(T_hi*hi). The multiprocessing "
        "control isolates kernel scaling from single-JVM local-mode "
        "co-location (3 thread pools per core at local[32])."
    )
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
