from levenshtein_spark.sources.code_files import code_files_df, generate_cluster_rows

__all__ = ["code_files_df", "generate_cluster_rows"]
