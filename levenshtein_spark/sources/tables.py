"""Table IO — Iceberg-first design with a Parquet fallback.

The pipeline writes every stage to a named table so it can resume
mid-pipeline. When an Iceberg catalog is configured (``spark.sql.catalog.*``
and the iceberg-spark-runtime jar on the classpath), tables go through
``writeTo(...).createOrReplace()``; otherwise the same layout lands as plain
Parquet directories under a warehouse path. This sandbox has no Iceberg jar
(verified: zero iceberg jars in pyspark/jars), so tests exercise the Parquet
path; the interface is identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class Warehouse:
    """Stage-table reader/writer: Iceberg when available, Parquet otherwise."""

    def __init__(self, spark: SparkSession, root: str, catalog: str | None = None):
        self.spark = spark
        self.root = root
        self.catalog = catalog if (catalog and iceberg_available(spark)) else None

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def write(self, df: DataFrame, name: str) -> None:
        if self.catalog:
            df.writeTo(f"{self.catalog}.{name}").createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))
