"""Spark-callable function surface mirroring the reference UDF catalog
(ReadMe.md:29-38) plus hashing / text / vector helpers for the
training-data-pipeline operators."""

from levenshtein_spark.functions.distance import (
    bounded_edit_dist,
    bounded_edit_dist_builtin,
    bounded_edit_dist_t,
    edit_dist,
    edit_dist_builtin,
    edit_dist_t,
    jaro_winkler,
    similarity_t,
)

__all__ = [
    "edit_dist",
    "edit_dist_t",
    "bounded_edit_dist",
    "bounded_edit_dist_t",
    "similarity_t",
    "jaro_winkler",
    "edit_dist_builtin",
    "bounded_edit_dist_builtin",
]
