"""Suffix-family scale dress rehearsal: character-exact duplicated-region
detection at 1x and Rx the sf0.1 documents corpus.

Replicates every document R times (id offsets + a distinct 40-char tail per
replica so clone sets share long verbatim PREFIX regions but are not exact
dupes), then runs the UNCHANGED suffix pipeline (explode suffixes -> one
4-char-prefix hash shuffle -> per-group sorted windows -> interval union).
Reports, per corpus size:

* suffix rows (the linear blow-up the plan is built around: O(total_chars));
* wall time and suffix rows/sec;
* spans found and chars covered (the planted replicas guarantee real work);
* prefix-group skew: rows in the hottest 4-char group / total — the number
  that says when to lengthen the partition key at bigger corpora.

Usage: python tools/bench_suffix.py [replicas]   (default 10)
Writes/merges BENCH/suffix_scale.json (keyed by replica count).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "BENCH", "suffix_scale.json")


def _corpus(spark, reps: int):
    base = spark.read.parquet(f"{_SF}/documents.parquet").select("doc_id", "text")
    parts = [base]
    for j in range(1, reps):
        # distinct tail per replica: the shared region is the original text,
        # the tail is unique -> spans must stop at the original's end
        tail = F.concat_ws("", *[F.lit(f"#r{j}tail"), F.md5(F.concat(F.lit(j), F.col("doc_id").cast("string")))])
        parts.append(
            base.select(
                (F.col("doc_id") + 1_000_000 * j).alias("doc_id"),
                F.concat("text", tail).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from levenshtein_spark.driver_queries.dedup import _suffix_shared, suffix_spans
    from levenshtein_spark.session import get_spark

    spark = get_spark("bench_suffix")
    results = {}
    for r in (1, reps):
        d = _corpus(spark, r).persist()
        n_docs = d.count()
        n_chars = d.agg(F.sum(F.length("text"))).collect()[0][0]

        # skew census on the shuffle key (4-char suffix prefix)
        grp = (
            d.select(F.explode(F.sequence(F.lit(1), F.length("text"))).alias("pos"), "text")
            .select(F.expr("substring(text, pos, 4)").alias("g"))
            .groupBy("g").count()
        )
        top = grp.orderBy(F.col("count").desc()).limit(1).collect()[0]

        t0 = time.time()
        spans = suffix_spans(d).persist()
        n_spans = spans.count()
        covered = spans.agg(
            F.sum(F.col("span_end") - F.col("span_start") + 1)
        ).collect()[0][0]
        wall = time.time() - t0
        spans.unpersist()
        d.unpersist()
        results[str(r)] = {
            "replicas": r,
            "docs": int(n_docs),
            "suffix_rows": int(n_chars),
            "wall_s": round(wall, 2),
            "suffix_rows_per_sec": round(n_chars / wall),
            "spans": int(n_spans),
            "chars_covered": int(covered),
            "hot_group": top["g"],
            "hot_group_rows": int(top["count"]),
            "hot_group_frac": round(top["count"] / n_chars, 5),
        }
        print(json.dumps(results[str(r)]))

    lo, hi = results["1"], results[str(reps)]
    summary = {
        "sf_dir": _SF,
        "rows_scale": round(hi["suffix_rows"] / lo["suffix_rows"], 2),
        "wall_scale": round(hi["wall_s"] / lo["wall_s"], 2),
        "throughput_ratio": round(
            hi["suffix_rows_per_sec"] / lo["suffix_rows_per_sec"], 2
        ),
        "runs": results,
    }
    prev = {}
    if os.path.exists(_OUT):
        with open(_OUT) as f:
            prev = json.load(f)
    prev[f"x{reps}"] = summary
    with open(_OUT, "w") as f:
        json.dump(prev, f, indent=1, sort_keys=True)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
