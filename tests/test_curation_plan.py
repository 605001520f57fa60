"""End-to-end curation plan: quality gate → exact dedup → near-dup collapse
→ splits → token-budget shards, with checkpoint/resume semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from levenshtein_spark.plans.curation import CurationConfig, run_curation

GOOD = (
    "the data engine reads the table and joins the rows with the index "
    "then writes the result to the warehouse for the next stage to scan"
)
GOOD2 = (
    "a query plan is optimized and executed in stages that shuffle rows "
    "between the workers while the driver tracks progress for the job"
)


def _docs(spark):
    rows = [
        (0, GOOD),
        (1, GOOD),                                   # exact dupe of 0
        (2, GOOD + " trailing words appended here"),  # near dupe of 0
        (3, GOOD2),
        (4, "zz"),                                   # low quality: too short
        (5, "spark " * 40),                          # degenerate repetition
        (6, GOOD2.replace("driver", "leader")),      # near dupe of 3
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cfg(tmp_path, **kw):
    return CurationConfig(
        checkpoint_dir=str(tmp_path / "wh"),
        jaccard=0.6,
        shard_budget=30,
        hot_threshold=50,
        num_salts=4,
        **kw,
    )


def test_curation_pipeline_end_to_end(spark, tmp_path):
    out = run_curation(spark, _docs(spark), _cfg(tmp_path))
    kept = {r.doc_id for r in out["kept"].collect()}
    assert 4 not in kept and 5 not in kept          # quality gate
    exact = {r.doc_id for r in out["exact_canon"].collect()}
    assert 1 not in exact and 0 in exact            # exact dupe collapsed to min id
    canon = {r.doc_id for r in out["canon"].collect()}
    assert canon == {0, 3}                          # near dupes 2, 6 collapsed
    shards = {r.doc_id: (r.split, r.shard_id) for r in out["shards"].collect()}
    assert set(shards) == canon
    # packing is per split: shard ids start at 0 within each split
    for s in {v[0] for v in shards.values()}:
        assert min(sh for sp, sh in shards.values() if sp == s) == 0
    # lineage metrics written for every stage
    wh = out["warehouse"]
    for stage in ("profiled", "kept", "exact_canon", "neardup_edges", "canon",
                  "splits", "shards"):
        assert wh.exists(f"metrics_{stage}"), stage


def test_curation_resume_skips_completed_stages(spark, tmp_path):
    cfg = _cfg(tmp_path)
    first = run_curation(spark, _docs(spark), cfg)
    assert len(cfg.stage_times) == 7                # everything computed

    cfg2 = _cfg(tmp_path)
    second = run_curation(spark, _docs(spark), cfg2)
    assert cfg2.stage_times == {}                   # fully resumed, zero recompute
    a = sorted(map(tuple, first["shards"].collect()))
    b = sorted(map(tuple, second["shards"].collect()))
    assert a == b


def test_curation_resume_mid_pipeline(spark, tmp_path):
    """Kill-after-stage-N: drop the later stage tables and re-run — the
    early stages resume from the warehouse, the rest recompute, and the
    result matches an uninterrupted run."""
    cfg = _cfg(tmp_path)
    full = sorted(map(tuple, run_curation(spark, _docs(spark), cfg)["shards"].collect()))

    import shutil

    for stage in ("canon", "splits", "shards", "metrics_canon", "metrics_splits",
                  "metrics_shards"):
        shutil.rmtree(str(tmp_path / "wh" / stage), ignore_errors=True)
    cfg2 = _cfg(tmp_path)
    redo = run_curation(spark, _docs(spark), cfg2)
    assert set(cfg2.stage_times) == {"canon", "splits", "shards"}
    assert sorted(map(tuple, redo["shards"].collect())) == full
