from levenshtein_spark.streaming.ingest import (  # noqa: F401
    ingest_columns,
    run_ingest,
)
from levenshtein_spark.streaming.linkage import (  # noqa: F401
    stream_exact_dedup,
    stream_fuzzy_link,
    stream_incremental_link,
)
