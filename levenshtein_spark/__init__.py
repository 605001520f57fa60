"""levenshtein_spark — PySpark-native entity-resolution / record-linkage engine.

A from-scratch re-expression of the query capabilities of
rljacobson/Levenshtein (a MySQL string-distance UDF library) as a distributed
Spark pipeline: vectorized banded OSA scoring kernel (Arrow batch UDFs),
blocking with salted repartitioning, pair scoring with sha256 short-circuit,
and transitive-closure clustering — plus the dedup / similarity-search /
text-analysis operators a large-scale training-data pipeline needs.
"""

from levenshtein_spark.kernel import (
    batch_edit_distance,
    batch_similarity,
)


def register_sql_functions(spark, legacy: bool = True):
    """Expose the reference UDF catalog (and legacy names) to ``spark.sql``
    — see functions/register.py. Lazy import so the package stays importable
    without a SparkSession."""
    from levenshtein_spark.functions.register import register_all

    return register_all(spark, legacy=legacy)


__all__ = ["batch_edit_distance", "batch_similarity", "register_sql_functions"]
__version__ = "0.2.0"
