"""Driver-contract query registry.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB SQL twins; a query with
no oracle gets the driver's weaker rows-only check). ``__spark_entry__``
aggregates them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def collect() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from levenshtein_spark.driver_queries import (
        ann,
        catalog,
        curation,
        dedup,
        er_curve,
        er_clustering,
        er_eval,
        linkage,
        lm,
        multimodal,
        phonetic,
        relational,
        streaming,
        text,
    )

    queries: dict = {}
    oracles: dict = {}
    for mod in (
        catalog, linkage, dedup, text, ann, relational, multimodal, streaming, er_eval, curation,
        phonetic, lm, er_curve, er_clustering,  # appended last: keeps the banked registry order of the first 139 intact
    ):
        overlap = queries.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    unknown = oracles.keys() - queries.keys()
    if unknown:
        raise ValueError(f"oracle without query: {unknown}")

    # The round driver verifies the FIRST 50 registry entries against their
    # DuckDB oracles. Rounds 1-4 banked driver-green rows for 107 of the 152
    # registry queries (union of CORRECTNESS_r01-r04.json, zero failures).
    # Round 5 leads with the 45 queries that have never been in a driver
    # sample (the list enumerated in docs/ROUND4.md §Handoff, recomputed
    # against the actual r01-r04 artifacts), so CORRECTNESS_r05.json
    # completes driver verification of the full registry: 152/152 cumulative.
    # The remaining 5 slots re-check the least-recently-driver-checked rows
    # (3 last seen in r01, 2 in r02). The registry itself is unchanged — all
    # 152 queries stay registered and strict-checked locally at three scale
    # factors (CORRECTNESS_local_r05*.json).
    front = (
        [
            # ANN / embedding family (r02-r03 banked the core; these are the deep variants)
            "kmeans_cell_sample", "dedup_semantic", "ann_ivfpq_residual_topk",
            "ann_multiprobe_topk", "embedding_dbscan",
            # relational / events analytics
            "fuzzy_join_one_to_one", "pricing_rollup_subtotals", "revenue_by_nation",
            "events_json_extract", "events_funnel", "events_retention",
            "data_quality_report", "events_window_attrib", "bloom_semijoin",
            "setjoin_jaccard_docs", "setjoin_containment_docs", "basket_part_pairs",
            # curation / corpus analytics
            "sample_temperature", "sample_stratified", "chunk_documents",
            "bm25_search", "corpus_profile", "text_redact_pii",
            "code_clones_type2", "code_clones_type3", "curation_cut_spans",
            "corpus_hll_distinct", "curation_funnel", "corpus_percentiles",
            "corpus_cms_topk", "sample_weighted", "corpus_length_outliers",
            # phonetic + LM-based curation gates
            "phonetic_pairs", "text_perplexity", "quality_classifier_nb", "dsir_select",
            # trade-off curves
            "fs_threshold_curve", "blocking_window_curve",
            # graph-clustering entity-formation family
            "cluster_star", "cluster_merge_center", "cluster_pivot",
            "cluster_quality", "cluster_algo_compare", "cluster_threshold_sweep",
            "dedup_canonical_pivot",
        ]
        # least-recently-driver-checked refreshers (r01/r02 vintage)
        + ["daily_event_stats", "events_sessionize", "top_customers_by_revenue",
           "edjoin_docs", "fuzzy_join_customers"]
    )
    order = front + [q for q in queries if q not in set(front)]
    queries = {q: queries[q] for q in order}
    oracles = {q: oracles[q] for q in order if q in oracles}
    return queries, oracles


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
