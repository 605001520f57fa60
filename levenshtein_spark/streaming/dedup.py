"""Streaming dedup-on-ingest: first-seen tracking per blocking key.

The ingestion-side counterpart of the batch dedup family: every arriving
record carries one or more blocking keys (content sha for exact dedup,
MinHash band keys for near-dup, SimHash segments for Hamming families —
any of ``functions/hashing.py``'s key generators works, because the
operator sees only ``(key, id)`` rows). A record is flagged the moment any
of its keys was already claimed by an earlier record, WITHOUT waiting for
a batch closure pass — the standard "dedup at the door" stage of a
training-data ingest pipeline.

Built on ``applyInPandasWithState`` keyed by the blocking key. State per
key is ONE long (the canonical id — the minimum id seen), so unlike the
fuzzy-history operator in ``streaming/linkage.py`` the state size is
O(distinct keys) with O(1) bytes per key, the cheapest possible stateful
dedup. Emission: each record whose id is not the key's canonical id yields
``(key, id, first_id)``; doc-level resolution (min first_id over the
record's keys) is one ordinary aggregation downstream of the sink.

Canonical-id semantics: within a micro-batch, arrivals are processed in id
order, so the canonical record for a key is the minimum id of the batch
(deterministic — this is what gives the single-micro-batch regime a closed
batch form and therefore a DuckDB twin; see
``driver_queries/streaming.py:q_streaming_dedup``). Across micro-batches
the canonical id is the minimum seen so far: a later batch carrying a
smaller id takes over as canonical and the PREVIOUS canonical is
retro-flagged against it (exactly-once per flagged id is preserved — each
id is emitted at most once, when it loses its key). Cross-batch behavior
is pinned in ``tests/test_streaming_dedup.py``.

State boundedness: ``state_timeout_ms`` drops idle keys (a key unseen for
the window re-admits its next occurrence — the documented recall/memory
trade of every TTL'd dedup); ``None`` — the DEFAULT — disables the timer,
which is required for finite ``availableNow`` replays
(ProcessingTimeTimeout keeps scheduling empty batches forever on 4.1 —
see streaming/linkage.py:114-119). Long-lived continuous deployments
should opt into a TTL explicitly; defaulting to one would make the
documented replay pattern hang out of the box.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_first_seen(
    keyed: DataFrame,
    key_col: str = "block_key",
    id_col: str = "id",
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """``(key_col, id_col)`` stream → ``(key_col, id_col, first_id)`` rows
    for every record that lost its key to an earlier (lower-id) record.
    Semantics and state contract in the module docstring."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, {id_col} long, first_id long"
    state_schema = "first long"

    def dedup_group(key, pdfs, state: GroupState):
        import pandas as pd

        (block_key,) = key
        if state.hasTimedOut:
            state.remove()
            return
        first = state.get[0] if state.exists else None
        ids = sorted(
            int(x) for pdf in pdfs for x in pdf[id_col] if not pd.isna(x)
        )
        rows = []
        for rid in ids:
            if first is None:
                first = rid
            elif rid > first:
                rows.append((block_key, rid, first))
            elif rid < first:
                # late-arriving smaller id takes over as canonical; the
                # displaced canonical is flagged against it (once)
                rows.append((block_key, first, rid))
                first = rid
        state.update((first,))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        if rows:
            yield pd.DataFrame(rows, columns=[key_col, id_col, "first_id"])

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if state_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return keyed.groupBy(key_col).applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
