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
        er_eval,
        linkage,
        multimodal,
        relational,
        streaming,
        text,
    )

    queries: dict = {}
    oracles: dict = {}
    for mod in (
        catalog, linkage, dedup, text, ann, relational, multimodal, streaming, er_eval, curation,
    ):
        overlap = queries.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    unknown = oracles.keys() - queries.keys()
    if unknown:
        raise ValueError(f"oracle without query: {unknown}")
    return queries, oracles


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
