from levenshtein_spark.plans.linkage import LinkageConfig, run_linkage

__all__ = ["LinkageConfig", "run_linkage"]
