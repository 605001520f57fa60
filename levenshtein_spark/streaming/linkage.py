"""Structured Streaming operators: incremental dedup and linkage.

The reference library is batch-only (a MySQL UDF has no streaming story);
these operators extend the same kernel to continuously-arriving corpora —
the shape a training-data ingestion pipeline needs:

* ``stream_exact_dedup`` — watermarked exact dedup on the content sha256
  (state-bounded ``dropDuplicates``: the watermark lets Spark expire
  dedup state for event times older than the horizon, so state doesn't grow
  forever at web scale).
* ``stream_fuzzy_link`` — stream-static join: each arriving record is
  blocked against a *static* reference table on the same block keys and
  scored with the Arrow-batched bounded-OSA kernel. Stream-static equi-joins
  are stateless on the stream side, so this scales with arrival rate, not
  history.
* ``stream_incremental_link`` — custom stateful operator
  (``applyInPandasWithState``): links each arrival against every earlier
  record of its block (continuous within-stream fuzzy dedup), state bounded
  by a processing-time timeout + per-block FIFO cap.

Both return unstarted streaming DataFrames — callers attach the sink
(``writeStream``) and trigger; tests use ``trigger(availableNow=True)`` with
a file source.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from levenshtein_spark.functions.distance import bounded_edit_dist_t


def stream_exact_dedup(
    stream: DataFrame,
    content_col: str = "content",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each distinct content hash.

    State is bounded by the watermark horizon:
    ``dropDuplicatesWithinWatermark`` expires a key's state once the
    watermark passes its first-seen event time — a plain
    ``dropDuplicates(["sha"])`` would never expire state because the
    event-time column is not part of the dedup subset. The trade-off is the
    documented one for bounded-state streaming dedup: duplicates arriving
    later than ``watermark`` past the original may re-emit; exact global
    dedup remains a batch job over the checkpointed table.
    """
    return (
        stream.withColumn("sha", F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["sha"])
    )


def stream_fuzzy_link(
    stream: DataFrame,
    reference: DataFrame,
    key_col: str,
    text_col: str,
    k: int,
    include_exact: bool = False,
    dist_fn=bounded_edit_dist_t,
) -> DataFrame:
    """Link arriving records against a static reference table.

    Blocks on ``key_col`` equality (stream-static equi-join; the static side
    is broadcast when small), scores ``text_col`` pairs with the bounded OSA
    kernel, and emits matches with ``dist <= k``. By default dist=0 links to
    an *identical* reference text are excluded (a record trivially "links" to
    its own copy in the reference corpus — usually noise for linkage); pass
    ``include_exact=True`` to keep them. Output columns: stream columns +
    ``ref_<text_col>``, ``dist``.
    """
    ref = reference.select(
        F.col(key_col).alias("__ref_key"),
        F.col(text_col).alias(f"ref_{text_col}"),
    )
    joined = stream.join(ref, F.col(key_col) == F.col("__ref_key")).drop("__ref_key")
    scored = joined.withColumn("dist", dist_fn(text_col, f"ref_{text_col}", k))
    out = scored.where(F.col("dist") <= k)
    if not include_exact:
        out = out.where(F.col(text_col) != F.col(f"ref_{text_col}"))
    return out


def stream_incremental_link(
    stream: DataFrame,
    key_col: str,
    id_col: str,
    text_col: str,
    k: int,
    state_timeout_ms: int | None = 3_600_000,
    max_state_rows: int = 10_000,
) -> DataFrame:
    """Custom stateful operator: link each arriving record against every
    EARLIER record of its block — continuous within-stream fuzzy dedup,
    which neither ``dropDuplicates`` (exact only) nor a stream-static join
    (fixed reference) can express.

    Built on ``applyInPandasWithState``: state per block key is the list of
    (id, text) seen so far; each micro-batch scores its arrivals against the
    state with the batch OSA kernel, emits ``(key, id, match_id, dist)``
    edges with ``dist <= k``, and appends itself to the state. State is
    bounded two ways: a processing-time timeout (``state_timeout_ms``) drops
    idle blocks, and ``max_state_rows`` caps a block's history FIFO —
    both knobs are the documented trade-off for unbounded streams (the exact
    closure remains the batch pipeline's job; this operator is the low-
    latency frontier). Arrivals inside one micro-batch are ordered by id so
    the output is deterministic for a given batching.

    ``state_timeout_ms=None`` disables the timer (FIFO cap only). Required
    for finite ``availableNow`` runs: with ProcessingTimeTimeout, Spark
    keeps scheduling no-data micro-batches while any state holds a pending
    timer, so an availableNow query never reaches termination (observed on
    4.1: endless 0-row batches after the data batch). Continuous production
    streams keep the default timeout; bounded replays/backfills pass None.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from levenshtein_spark.kernel import batch_edit_distance

    out_schema = (
        f"{key_col} string, {id_col} long, match_id long, dist long"
    )
    state_schema = "ids array<long>, texts array<string>"

    def link_group(key, pdfs, state: GroupState):
        import pandas as pd

        (block_key,) = key
        if state.hasTimedOut:
            state.remove()
            return
        ids, texts = state.get if state.exists else ([], [])
        ids, texts = list(ids), list(texts)
        # concat + sort ONCE per micro-batch: the iterator yields one pdf
        # per Arrow chunk, and sorting per chunk would make edge directions
        # depend on chunk boundaries instead of ids
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(id_col)
        new_ids = [int(x) for x in batch[id_col]]
        # keep None as None — the kernel's reference NULL semantics apply
        new_texts = [None if pd.isna(t) else str(t) for t in batch[text_col]]
        rows = []
        # one batched kernel call: new arrivals x state (cross product)
        if ids and new_ids:
            a = [t for t in new_texts for _ in ids]
            b = texts * len(new_ids)
            d = batch_edit_distance(a, b, k=k)
            pos = 0
            for rid in new_ids:
                for mid in ids:
                    if d[pos] <= k:
                        rows.append((block_key, rid, int(mid), int(d[pos])))
                    pos += 1
        # one batched call: new vs earlier-in-batch (triangular)
        if len(new_ids) > 1:
            ia = [i for i in range(1, len(new_ids)) for _ in range(i)]
            ib = [j for i in range(1, len(new_ids)) for j in range(i)]
            d = batch_edit_distance(
                [new_texts[i] for i in ia], [new_texts[j] for j in ib], k=k
            )
            for p, (i, j) in enumerate(zip(ia, ib)):
                if d[p] <= k:
                    rows.append((block_key, new_ids[i], new_ids[j], int(d[p])))
        ids.extend(new_ids)
        texts.extend(new_texts)
        if len(ids) > max_state_rows:
            ids = ids[-max_state_rows:]
            texts = texts[-max_state_rows:]
        state.update((ids, texts))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        if rows:
            yield pd.DataFrame(rows, columns=[key_col, id_col, "match_id", "dist"])

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if state_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        link_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
