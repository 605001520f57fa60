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

__all__ = ["batch_edit_distance", "batch_similarity"]
__version__ = "0.1.0"
