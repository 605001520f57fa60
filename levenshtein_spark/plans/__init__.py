from levenshtein_spark.plans.curation import (
    CurationConfig,
    run_curation,
    run_incremental_curation,
)
from levenshtein_spark.plans.linkage import (
    LinkageConfig,
    run_incremental_linkage,
    run_linkage,
)

__all__ = [
    "CurationConfig",
    "LinkageConfig",
    "run_curation",
    "run_incremental_curation",
    "run_incremental_linkage",
    "run_linkage",
]
