"""Regime benchmark for candidate_pairs_collapsed: planted blocking clones.

The sf1 replica corpus is the WRONG regime for clone collapse — each replica
mutates its path (doc_id token) and its length (+5 bytes), so full-key-set
clone groups barely exist (measured collapse factor 1.05x at sf1; the plain
operator wins there and the bench keeps using it — see BENCH/BASELINE.md).

The RIGHT regime is exact re-ingestion: the same file under the same path
re-uploaded across commits/snapshots (vendored deps, mirrored corpora,
nightly crawl re-fetches), where every copy carries an IDENTICAL key set.
This tool builds that corpus deterministically from sf0.1 documents (R
replicas per doc, distinct commit => distinct id, same path/content), runs
plain vs collapsed candidate generation over identical exploded blocks, and
asserts the (id_a, id_b, n_keys) sets hash-equal.

Usage: python tools/bench_collapsed_clones.py  -> writes BENCH/collapsed_clones.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_R = 10  # replicas per document


def main() -> None:
    from levenshtein_spark.driver_queries.linkage import _LEN_BAND, _PREFIX, docs_as_code_files
    from levenshtein_spark.operators.blocking import exploded_blocks
    from levenshtein_spark.operators.normalize import normalize
    from levenshtein_spark.operators.pairs import candidate_pairs, candidate_pairs_collapsed
    from levenshtein_spark.session import get_spark, release_caches, warm_python_workers

    spark = get_spark("bench_collapsed_clones")
    warm_python_workers(spark)

    # Re-ingestion corpus: R commits of every file, content+path verbatim.
    files = docs_as_code_files(spark, _SF).select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(_R - 1))).alias("r")
    ).select(
        "repo", "path",
        F.concat(F.col("commit"), F.lit("@"), F.col("r").cast("string")).alias("commit"),
        "lang", "content",
    )
    norm = normalize(files, prefix_len=_PREFIX)

    record: dict = {"sf_dir": _SF, "replicas": _R}
    hashes = {}
    for name, gen in (("plain", candidate_pairs), ("collapsed", candidate_pairs_collapsed)):
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            blocks = exploded_blocks(norm, len_band=_LEN_BAND).persist()
            t0 = time.perf_counter()
            slim = gen(blocks, hot_threshold=50, num_salts=8)
            # decimal(38,0) sum: 54M xxhash64 longs overflow a long under ANSI
            agg = slim.select(
                F.xxhash64("id_a", "id_b", "n_keys").cast("decimal(38,0)").alias("h")
            ).agg(F.sum("h").alias("hsum"), F.count("*").alias("n")).collect()[0]
            best = min(best, time.perf_counter() - t0)
            release_caches(include_pinned=True)
        hashes[name] = (int(agg.hsum), int(agg.n))
        record[name] = {"t_best_s": round(best, 2), "n_pairs": int(agg.n)}
        print(name, record[name], flush=True)

    if hashes["plain"] != hashes["collapsed"]:
        raise RuntimeError(f"pair-set mismatch: {hashes}")
    record["pair_set_hash_equal"] = True
    record["speedup"] = round(record["plain"]["t_best_s"] / record["collapsed"]["t_best_s"], 2)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "BENCH", "collapsed_clones.json"), "w") as fh:
        json.dump(record, fh, indent=2)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
