"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship record-linkage pipeline on the sf0.001
customer table; ``queries()`` / ``oracle_sql()`` expose every implemented
operator (SURVEY.md §2 catalog + linkage pipeline stages + training-data
dedup/similarity/text suites) with DuckDB oracle twins, including a
recursive-CTE true-OSA oracle (levenshtein_spark/oracles.py) because
DuckDB's ``damerau_levenshtein`` is the unrestricted variant while the
reference is restricted OSA.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full blocking→scoring→clustering linkage over sf0.001.

    Links customer records by name edit distance within nation blocks and
    returns one row per entity cluster with its size — the end-to-end shape
    the north_rule asks for (blocking, salted pairs, Arrow-batched scoring,
    star-contraction transitive closure).
    """
    from levenshtein_spark.driver_queries.linkage import flagship_clusters

    return flagship_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from levenshtein_spark.driver_queries import collect

    return collect()[0]


def oracle_sql() -> dict[str, str]:
    from levenshtein_spark.driver_queries import collect

    return collect()[1]
