"""Driver-checked Structured Streaming query.

``streaming_fuzzy_link`` runs the stream-static fuzzy-linkage operator
(streaming/linkage.py) as a real streaming query — parquet file source over
the documents table, ``trigger(availableNow=True)``, memory sink — and
returns the drained sink as a batch DataFrame. With availableNow over a
static file set, a stream-static inner equi-join is semantically identical
to the batch join, so the DuckDB twin is plain SQL: this gives the streaming
operator the same green CORRECTNESS row as every batch operator (VERDICT r01
"missing" item 4) instead of a pytest-only existence proof.

The distance is the non-transposition bounded kernel so the oracle is
DuckDB's ``levenshtein`` under the reference's bounded convention
(k_eff = min(k, max(len)), exceeded → k_eff+1; src/bounded_edit_dist.cpp).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from levenshtein_spark.driver_queries import tbl
from levenshtein_spark.functions.distance import bounded_edit_dist
from levenshtein_spark.streaming.linkage import stream_fuzzy_link

_N_REF = 40
_PLEN = 24
_K = 2
_SINK = "streaming_fuzzy_link_mem"


def q_streaming_fuzzy_link(spark: SparkSession, sf: str) -> DataFrame:
    """Stream documents against a static reference of known near-variants,
    blocked on lang, scored on {_PLEN}-char prefixes at cap {_K}.

    The reference rows are the first {_N_REF} docs with their first two
    prefix chars swapped — a deterministic distance-2 (Levenshtein) variant
    of each source doc, so the linkage must recover exactly those planted
    matches (document corpora have no natural shared prefixes at this cap).
    """
    batch_docs = tbl(spark, sf, "documents")
    mutated = F.concat(
        F.substring("text", 2, 1), F.substring("text", 1, 1), F.substring("text", 3, _PLEN - 2)
    )
    ref = batch_docs.where(F.col("doc_id") < _N_REF).select(
        "lang", mutated.alias("ptext")
    )

    stream = (
        spark.readStream.schema(batch_docs.schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf)
    )
    s = stream.select("doc_id", "lang", F.substring("text", 1, _PLEN).alias("ptext"))
    out = stream_fuzzy_link(
        s, ref, key_col="lang", text_col="ptext", k=_K, dist_fn=bounded_edit_dist
    )

    q = (
        out.writeStream.format("memory")
        .queryName(_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_fuzzy_link did not drain within 300s")
    return spark.table(_SINK).select(
        "doc_id", F.col("ref_ptext"), F.col("dist").cast("long").alias("dist")
    )


QUERIES = {"streaming_fuzzy_link": q_streaming_fuzzy_link}

ORACLES = {
    "streaming_fuzzy_link": f"""
WITH ref AS (
  SELECT lang,
         substr(text, 2, 1) || substr(text, 1, 1) || substr(text, 3, {_PLEN - 2}) AS ref_ptext
  FROM documents WHERE doc_id < {_N_REF}
),
s AS (SELECT doc_id, lang, substr(text, 1, {_PLEN}) AS ptext FROM documents)
SELECT s.doc_id, r.ref_ptext,
       CAST(least(levenshtein(s.ptext, r.ref_ptext),
                  least({_K}, greatest(length(s.ptext), length(r.ref_ptext))) + 1)
            AS BIGINT) AS dist
FROM s JOIN ref r ON s.lang = r.lang
WHERE least(levenshtein(s.ptext, r.ref_ptext),
            least({_K}, greatest(length(s.ptext), length(r.ref_ptext))) + 1) <= {_K}
  AND s.ptext <> r.ref_ptext
""",
}
