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
from levenshtein_spark.operators.pairs import candidate_pairs

cpus = int(sys.argv[1])
sf_dir = sys.argv[2]
spark = get_spark(f"scaling_{cpus}", master=f"local[{cpus}]")

norm = normalize(docs_as_code_files(spark, sf_dir), prefix_len=_PREFIX)
pairs = candidate_pairs(
    exploded_blocks(norm, len_band=_LEN_BAND), hot_threshold=200, num_salts=8
).select("content_prefix_a", "content_prefix_b").persist()
n_pairs = pairs.count()

def job():
    return (
        pairs.select(bounded_edit_dist_t("content_prefix_a", "content_prefix_b", 8).alias("d"))
        .agg(F.sum("d")).collect()[0][0]
    )

job()  # warm-up: Python worker fork + import cost paid here
t0 = time.perf_counter(); job(); dt = time.perf_counter() - t0
print(json.dumps({"cpus": cpus, "pairs": n_pairs, "sec": round(dt, 3),
                  "pairs_per_sec": round(n_pairs / dt, 1)}))
"""


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), sf_dir],
        capture_output=True, text=True, env=env, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    lo, hi = 8, 32
    r_lo = run(lo, sf_dir)
    r_hi = run(hi, sf_dir)
    eff = (r_lo["sec"] * lo) / (r_hi["sec"] * hi)
    result = {
        "sf_dir": sf_dir,
        "low": r_lo,
        "high": r_hi,
        "scaling_efficiency": round(eff, 3),
        "method": "same scoring job, fresh JVM per parallelism level, "
                  "post-warm-up measurement; eff = (T_lo*lo)/(T_hi*hi)",
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
