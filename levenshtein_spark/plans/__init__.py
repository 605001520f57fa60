from levenshtein_spark.plans.curation import CurationConfig, run_curation
from levenshtein_spark.plans.linkage import LinkageConfig, run_linkage

__all__ = ["CurationConfig", "LinkageConfig", "run_curation", "run_linkage"]
