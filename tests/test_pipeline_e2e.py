"""End-to-end pipeline: pairwise F1 >= 0.99 vs oracle gold (the BASELINE metric).

Gold derivation (FIXTURES.md §3): enumerate candidate pairs within the same
blocking key (the pipeline's own key universe), label each with the
full-matrix oracle — ``is_match = sha_equal OR oracle_OSA(prefix) <= k`` —
then gold clusters = union-find closure. The pipeline must reproduce both the
pair labels and the co-clustering relation.
"""

import itertools

import pytest

from levenshtein_spark.oracle import ref_edit_distance
from levenshtein_spark.plans.linkage import LinkageConfig, run_linkage
from levenshtein_spark.sources.code_files import code_files_df


# Heavy module (multi-second Spark jobs / hypothesis sweeps): excluded
# from the fast gate `pytest -m "not slow"` (README: Testing).
pytestmark = pytest.mark.slow

K_CONTENT = 8


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    src = code_files_df(spark, num_clusters=60, seed=42)
    cfg = LinkageConfig(checkpoint_dir=ckpt, k_content=K_CONTENT, hot_threshold=150, num_salts=4)
    out = run_linkage(spark, src, cfg)
    return out, cfg


def _gold_labels(out):
    """Oracle labels over the pipeline's own candidate universe."""
    rows = {
        r.id: r
        for r in out["normalized"].select("id", "sha", "content_prefix").collect()
    }
    blocks = {}
    for r in out["blocks"].select("block_key", "id").collect():
        blocks.setdefault(r.block_key, []).append(r.id)
    gold = {}
    for key, ids in blocks.items():
        for a, b in itertools.combinations(sorted(set(ids)), 2):
            if (a, b) in gold:
                continue
            ra, rb = rows[a], rows[b]
            match = ra.sha == rb.sha or (
                ref_edit_distance(ra.content_prefix, rb.content_prefix, K_CONTENT)
                <= K_CONTENT
            )
            gold[(a, b)] = match
    return gold


def _f1(tp, fp, fn):
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0


def test_pairwise_f1_vs_oracle(pipeline):
    out, _ = pipeline
    gold = _gold_labels(out)
    pred = {
        (r.id_a, r.id_b): r.is_match
        for r in out["scored"].select("id_a", "id_b", "is_match").collect()
    }
    assert set(pred) == set(gold), "candidate universe must match gold universe"
    tp = sum(1 for k, m in pred.items() if m and gold[k])
    fp = sum(1 for k, m in pred.items() if m and not gold[k])
    fn = sum(1 for k, m in pred.items() if not m and gold[k])
    f1 = _f1(tp, fp, fn)
    assert tp + fn > 50, "fixture must contain a meaningful number of gold matches"
    assert f1 >= 0.99, (tp, fp, fn, f1)


def test_cluster_pairwise_f1_vs_oracle(pipeline):
    out, _ = pipeline
    gold = _gold_labels(out)

    # gold closure via union-find over gold-match pairs
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), m in gold.items():
        if m:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    labels = {r.id: r.cluster_id for r in out["clusters"].collect()}
    gold_root = {i: find(i) for i in labels}

    ids = sorted(labels)
    tp = fp = fn = 0
    for a, b in itertools.combinations(ids, 2):
        same_pred = labels[a] == labels[b]
        same_gold = gold_root[a] == gold_root[b]
        tp += same_pred and same_gold
        fp += same_pred and not same_gold
        fn += (not same_pred) and same_gold
    f1 = _f1(tp, fp, fn)
    assert f1 >= 0.99, (tp, fp, fn, f1)


def test_sha_invariant_held(pipeline):
    out, _ = pipeline
    # run_linkage raises if sha256 drifts; assert the column exists & is full-width
    n = out["normalized"].where("length(sha) = 64").count()
    assert n == out["normalized"].count()


def test_resume_skips_stages_and_is_identical(pipeline, spark):
    out, cfg = pipeline
    before = {r.id: r.cluster_id for r in out["clusters"].collect()}
    src = code_files_df(spark, num_clusters=60, seed=42)
    cfg2 = LinkageConfig(
        checkpoint_dir=cfg.checkpoint_dir,
        k_content=cfg.k_content,
        hot_threshold=cfg.hot_threshold,
        num_salts=cfg.num_salts,
    )
    out2 = run_linkage(spark, src, cfg2)
    after = {r.id: r.cluster_id for r in out2["clusters"].collect()}
    assert before == after
    assert cfg2.stage_times == {}, "resume must not recompute any stage"


def test_incremental_matches_full_batch(spark, tmp_path):
    """run_incremental_linkage (delta vs checkpointed base) reproduces the
    full-batch labels exactly, recomputing no base stage."""
    import pyspark.sql.functions as F

    from levenshtein_spark.plans.linkage import run_incremental_linkage

    src = code_files_df(spark, num_clusters=25, seed=7)
    full_cfg = LinkageConfig(
        checkpoint_dir=str(tmp_path / "full"), k_content=K_CONTENT,
        hot_threshold=150, num_salts=4,
    )
    want = {
        r.id: r.cluster_id
        for r in run_linkage(spark, src, full_cfg)["clusters"].collect()
    }

    is_delta = F.pmod(F.xxhash64("path"), F.lit(4)) == 0
    ckpt = str(tmp_path / "incr")
    base_cfg = LinkageConfig(
        checkpoint_dir=ckpt, k_content=K_CONTENT, hot_threshold=150, num_salts=4
    )
    run_linkage(spark, src.where(~is_delta), base_cfg)
    incr_cfg = LinkageConfig(
        checkpoint_dir=ckpt, k_content=K_CONTENT, hot_threshold=150, num_salts=4
    )
    out = run_incremental_linkage(spark, src.where(is_delta), incr_cfg)
    got = {r.id: r.cluster_id for r in out["clusters"].collect()}
    assert got == want
    assert set(incr_cfg.stage_times) == {
        "delta_normalized",
        "delta_blocks",
        "delta_pairs",
        "delta_scored",
        "delta_edges",
        "delta_clusters",
        "delta_all_normalized",
        "delta_all_blocks",
        "delta_all_edges",
    }, "incremental must not recompute base stages"

    # guard: an id already in the base must raise, not silently duplicate
    with pytest.raises(ValueError, match="already exist in the base"):
        run_incremental_linkage(
            spark, src.where(~is_delta).limit(3), incr_cfg, batch_id="dupe_batch"
        )

    # guard: reusing a batch_id with a DIFFERENT delta must raise, not
    # silently return the first batch's checkpointed tables
    with pytest.raises(ValueError, match="different delta"):
        run_incremental_linkage(spark, src.where(is_delta).limit(3), incr_cfg)


def test_incremental_chained_batches(spark, tmp_path):
    """Two day-over-day deltas chained via base_prefix reproduce the
    full-batch labels; day 2 reuses day 1's merged tables."""
    import pyspark.sql.functions as F

    from levenshtein_spark.plans.linkage import run_incremental_linkage

    src = code_files_df(spark, num_clusters=20, seed=13)
    full_cfg = LinkageConfig(
        checkpoint_dir=str(tmp_path / "full"), k_content=K_CONTENT,
        hot_threshold=150, num_salts=4,
    )
    want = {
        r.id: r.cluster_id
        for r in run_linkage(spark, src, full_cfg)["clusters"].collect()
    }

    bucket = F.pmod(F.xxhash64("path"), F.lit(3))
    ckpt = str(tmp_path / "chain")
    cfg = LinkageConfig(
        checkpoint_dir=ckpt, k_content=K_CONTENT, hot_threshold=150, num_salts=4
    )
    run_linkage(spark, src.where(bucket == 0), cfg)
    run_incremental_linkage(spark, src.where(bucket == 1), cfg, batch_id="day1")
    out = run_incremental_linkage(
        spark, src.where(bucket == 2), cfg, batch_id="day2", base_prefix="day1_all_"
    )
    got = {r.id: r.cluster_id for r in out["clusters"].collect()}
    assert got == want


def test_resume_from_mid_pipeline(spark, tmp_path):
    import shutil, os

    ckpt = str(tmp_path / "ckpt2")
    src = code_files_df(spark, num_clusters=25, seed=9)
    cfg = LinkageConfig(checkpoint_dir=ckpt, k_content=K_CONTENT)
    out = run_linkage(spark, src, cfg)
    full = {r.id: r.cluster_id for r in out["clusters"].collect()}

    # Kill everything after 'pairs' — simulates a job dying mid-pipeline.
    for stage in ("scored", "edges", "clusters", "metrics_scored", "metrics_edges", "metrics_clusters"):
        p = os.path.join(ckpt, stage)
        if os.path.exists(p):
            shutil.rmtree(p)

    cfg2 = LinkageConfig(checkpoint_dir=ckpt, k_content=K_CONTENT)
    out2 = run_linkage(spark, src, cfg2)
    resumed = {r.id: r.cluster_id for r in out2["clusters"].collect()}
    assert resumed == full
    assert set(cfg2.stage_times) == {"scored", "edges", "clusters"}


def test_collapse_clones_pipeline_identical(spark, tmp_path_factory, pipeline):
    """LinkageConfig(collapse_clones=True) must reproduce the default
    pipeline's pair set and cluster labels exactly (the collapsed pair
    generator is pinned pair-for-pair equal; this pins the plan wiring)."""
    out, cfg = pipeline
    ckpt = str(tmp_path_factory.mktemp("ckpt_collapse"))
    src = code_files_df(spark, num_clusters=60, seed=42)
    cfg2 = LinkageConfig(
        checkpoint_dir=ckpt, k_content=K_CONTENT, hot_threshold=150, num_salts=4,
        collapse_clones=True,
    )
    out2 = run_linkage(spark, src, cfg2)
    base_pairs = {(r.id_a, r.id_b, r.n_keys) for r in out["pairs"].collect()}
    coll_pairs = {(r.id_a, r.id_b, r.n_keys) for r in out2["pairs"].collect()}
    assert coll_pairs == base_pairs
    base_lab = {r.id: r.cluster_id for r in out["clusters"].collect()}
    coll_lab = {r.id: r.cluster_id for r in out2["clusters"].collect()}
    assert coll_lab == base_lab

    # the guard: collapse + adaptive salting is rejected
    with pytest.raises(ValueError):
        run_linkage(
            spark,
            src,
            LinkageConfig(
                checkpoint_dir=ckpt, collapse_clones=True, adaptive_target_rows=100
            ),
        )


def test_cluster_method_pivot(spark, tmp_path):
    """cluster_method="pivot" forms entities with KwikCluster over the same
    verified edge stage, on the pipeline's real sha-hex string ids — checked
    against the serial KwikCluster reference on the collected edge set."""
    from tests.test_er_clustering import _brute_kwik

    src = code_files_df(spark, num_clusters=25, seed=7)
    cfg = LinkageConfig(
        checkpoint_dir=str(tmp_path / "ckpt"),
        k_content=K_CONTENT,
        hot_threshold=150,
        num_salts=4,
        cluster_method="pivot",
    )
    out = run_linkage(spark, src, cfg)
    ids = [r.id for r in out["normalized"].select("id").collect()]
    edges = [(r.src, r.dst) for r in out["edges"].select("src", "dst").collect()]
    got = {r.id: r.cluster_id for r in out["clusters"].collect()}
    assert got == _brute_kwik(ids, edges)
    # pivot never merges two whole clusters through one bridge: every member
    # is a verified neighbor of its pivot
    nbrs = set(edges) | {(b, a) for a, b in edges}
    for v, p in got.items():
        assert v == p or (v, p) in nbrs
