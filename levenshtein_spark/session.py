"""SparkSession factory with the engine's standard configuration.

Tuned for Arrow-batched Python UDF scoring and AQE-managed shuffles. On a
real cluster the same settings apply; only master/memory come from
spark-submit. Iceberg note (SURVEY.md §7): no iceberg-spark-runtime jar ships
in this sandbox, so table IO (levenshtein_spark.sources.tables) falls back to
plain Parquet in an Iceberg-like layout; when the jar is present the same
code path writes real Iceberg tables.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "levenshtein_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    # 50k rows/batch doubles kernel scoring throughput vs 10k (424k vs 190k
    # pairs/s on the 406k-pair sf0.1 mix, best-of-3 fresh JVMs; 200k adds
    # nothing) — per-batch Python/Arrow overhead amortizes while peak worker
    # memory stays ~25 MB for two 256-byte string columns. The kernel chunks
    # internally by cell budget, so batch size never multiplies DP memory.
    arrow_batch_size: int = 50_000,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # Executor Python workers must be able to import this package: in local
    # mode they inherit PYTHONPATH from the environment (not the driver's
    # sys.path); on a real cluster spark-submit --py-files does this instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            n = 32
        shuffle_partitions = max(2 * n, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow transport for pandas UDFs — the JVM<->Python boundary of the
        # scoring kernel; batch size bounds peak Python-worker memory.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_size))
        # AQE: runtime partition coalescing + skew-join splitting complement
        # (not replace) the explicit salting in operators/blocking.py.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Pin the session timezone so NTZ->LTZ casts, unix_timestamp(),
        # weekly truncation and watermark/session boundaries are host-TZ
        # independent (the DuckDB oracle twins compute in naive/UTC time).
        # user.timezone pins the JVM default for code paths that consult it
        # (e.g. legacy datetime parsing); applied at JVM launch in local mode.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()


_SCOPED_CACHES: list = []


def scoped_persist(df):
    """``df.persist()`` registered for bulk release.

    Driver queries persist helper stages (MinHash blocks, PQ codebooks,
    fingerprint tables) that feed multiple plan branches; in a long-lived
    session those caches would otherwise accumulate (ADVICE r02). Harness
    code (bench.py, tools/check_correctness.py, tests) calls
    ``release_caches()`` after materializing each query's result; library
    users running many queries in one session should do the same.
    """
    df = df.persist()
    _SCOPED_CACHES.append(df)
    return df


_PINNED_CACHES: list[DataFrame] = []


def pinned_persist(df: DataFrame) -> DataFrame:
    """Persist that ``release_caches()`` will NOT drop by default.

    For frames whose driver-collected byproducts must stay consistent with
    any FUTURE re-materialization of the same plan — the range-partitioned
    projections behind ``global_rank`` / ``pack_by_budget``, whose offset
    censuses were collected against one specific set of sampled partition
    cuts. Dropping such a cache is not merely slow: a re-materialization
    may sample different cuts while the plan still carries the old offsets,
    silently corrupting every global position. Release explicitly with
    ``release_caches(include_pinned=True)`` once no returned DataFrame from
    the query will be re-evaluated."""
    df = df.persist()
    _PINNED_CACHES.append(df)
    return df


def release_caches(include_pinned: bool = False) -> int:
    """Unpersist every scoped cache registered since the last release.
    Returns the number released. Safe to call at any time — caches are only
    dropped, never invalidated mid-plan, because callers release AFTER
    materializing the consuming query. Pinned caches (cut-pinning persists,
    see :func:`pinned_persist`) are kept unless ``include_pinned``.

    ``localCheckpoint`` storage (the clustering operators truncate lineage
    with it; see operators/clustering.py) is NOT registered here — a
    checkpointed frame cannot be unpersisted without breaking any plan
    that still references it, because its lineage is gone by design. Those
    blocks are reclaimed by Spark's ContextCleaner once the frames become
    unreachable, which in practice means after the consuming query's
    DataFrames go out of scope; the ``include_pinned`` release (the
    "query fully materialized, nothing will be re-evaluated" signal the
    harnesses send per query) nudges both collectors so reclamation is
    prompt rather than whenever the next full GC happens to run."""
    n = 0
    while _SCOPED_CACHES:
        _SCOPED_CACHES.pop().unpersist()
        n += 1
    if include_pinned:
        while _PINNED_CACHES:
            _PINNED_CACHES.pop().unpersist()
            n += 1
        import gc

        gc.collect()  # drop py4j refs of dead DataFrames -> JVM side can free
        spark = SparkSession.getActiveSession()
        if spark is not None:
            try:
                spark.sparkContext._jvm.System.gc()  # lets ContextCleaner reap checkpoint RDDs
            except Exception:
                pass  # a stopped/stopping context is fine — nothing to reclaim
    return n


def warm_python_workers(spark: SparkSession, partitions: int | None = None) -> None:
    """Pay the one-time Python-worker fork/import cost up front.

    The first Arrow-batched UDF stage on a cold session forks one Python
    worker per core, each importing pandas/pyarrow (~35 s aggregate on 32
    cores). Running a trivial pandas UDF across all cores once moves that
    cost out of every measured/user query; workers are reused afterwards
    (spark.python.worker.reuse defaults to true).
    """
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        return x

    n = partitions or spark.sparkContext.defaultParallelism
    # sum() (not count()) so Catalyst can't prune the UDF column away —
    # a pruned warm-up never forks a single worker
    from pyspark.sql import functions as _F

    spark.range(n, numPartitions=n).select(_warm(col("id")).alias("w")).agg(
        _F.sum("w")
    ).collect()
