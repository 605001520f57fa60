"""Headline benchmark — one JSON line for the round driver.

Runs the engine's flagship workloads at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints exactly one
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline queries:

* ``link_pipeline``   — full customer entity-resolution pipeline (blocking →
  salted pairs → Arrow-batched bounded-distance scoring → star-contraction
  transitive closure), the north_star workload.
* ``doc_block_pairs`` — documents-corpus blocking + lossless salted candidate
  generation (dual length grids + path-token MinHash bands).
* ``osa_scoring``     — raw vectorized banded-OSA kernel throughput over the
  candidate pairs' 64-char content prefixes (reports pairs/sec too).
* ``closest_match``   — broadcast probe set vs part names, window arg-min
  (reference ``min_edit_dist`` query shape, doc/Usage.md:178-189).

Extra context (scored pairs/sec, row counts) rides in the ``detail`` key;
scaling runs live in tools/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from levenshtein_spark.driver_queries.catalog import q_min_edit_dist
    from levenshtein_spark.driver_queries.linkage import (
        _LEN_BAND,
        _PREFIX,
        docs_as_code_files,
        flagship_clusters,
    )
    from levenshtein_spark.functions.distance import bounded_edit_dist_t
    from levenshtein_spark.operators.blocking import exploded_blocks
    from levenshtein_spark.operators.normalize import normalize
    from levenshtein_spark.operators.pairs import attach_pair_payload, candidate_pairs
    from levenshtein_spark.session import get_spark, warm_python_workers

    spark = get_spark("bench")
    warm_python_workers(spark)
    times: dict[str, float] = {}
    detail: dict[str, float] = {}

    def clock(name: str, fn) -> object:
        t0 = time.perf_counter()
        out = fn()
        times[name] = round(time.perf_counter() - t0, 3)
        return out

    # q1: full ER pipeline on customers
    n_clusters = clock("link_pipeline", lambda: flagship_clusters(spark, sf_dir).count())
    detail["clusters"] = float(n_clusters)

    # q2: documents blocking + salted candidate pairs (cache pairs for q3)
    norm = normalize(docs_as_code_files(spark, sf_dir), prefix_len=_PREFIX)
    # hot_threshold low enough that the big length-band blocks route through
    # the lossless triangle-salted join — the skew path is part of the bench
    slim_pairs = candidate_pairs(
        exploded_blocks(norm, len_band=_LEN_BAND).persist(), hot_threshold=50, num_salts=8
    )
    pairs = attach_pair_payload(slim_pairs, norm, ["content_prefix"]).select(
        "content_prefix_a", "content_prefix_b"
    ).persist()
    n_pairs = clock("doc_block_pairs", pairs.count)
    detail["candidate_pairs"] = float(n_pairs)

    # q2b: Arrow round-trip floor (reference noop, src/noop.cpp:1-8)
    from levenshtein_spark.functions.distance import noop

    clock(
        "arrow_noop",
        lambda: pairs.select(noop("content_prefix_a", "content_prefix_b").alias("d"))
        .agg(F.sum("d"))
        .collect(),
    )

    # q3: vectorized banded-OSA kernel over content prefixes
    def score() -> int:
        return (
            pairs.select(
                bounded_edit_dist_t("content_prefix_a", "content_prefix_b", 8).alias("d")
            )
            .agg(F.sum("d"))
            .collect()[0][0]
        )

    clock("osa_scoring", score)
    detail["scored_pairs_per_sec"] = round(n_pairs / max(times["osa_scoring"], 1e-9), 1)
    pairs.unpersist()

    # q4: closest-match window arg-min
    clock("closest_match", lambda: q_min_edit_dist(spark, sf_dir).count())

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "detail": detail,
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            }
        )
    )


if __name__ == "__main__":
    main()
