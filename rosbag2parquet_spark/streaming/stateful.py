"""Custom stateful streaming operator via ``applyInPandasWithState``
(north-star X5: "applyInPandasWithState for custom stateful operators").

Example operator: per-user running profile (event count, value sum, last
event time) maintained as explicit state and emitted on every update — the
building block for online feature stores / per-entity monitors. State is
partitioned by the group key, so it shards across executors; the watermark
(set by the caller on the input) bounds state retention.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts_us long"
STATE_SCHEMA = "n long, total double, last_us long"


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts_us": [last_us],
        }
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """events (streaming, with `ts_us` long + `value` double) → one updated
    profile row per user per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------- streaming compaction

COMPACT_OUTPUT_SCHEMA = (
    "user_id long, last_ts_us long, last_type string, "
    "last_value double, last_event_id long"
)
COMPACT_STATE_SCHEMA = "ts_us long, event_id long, etype string, value double"


def _update_latest(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        ts_us, event_id, etype, value = state.get
    else:
        ts_us, event_id, etype, value = -1, -1, "", 0.0
    for pdf in batches:
        # argmax over (ts_us, event_id) — commutative and associative, so
        # ANY arrival order (within a batch, across batches, across
        # partitions-of-the-past) converges to the same final state
        p = pdf.sort_values(["ts_us", "event_id"]).iloc[-1]
        if (int(p.ts_us), int(p.event_id)) > (ts_us, event_id):
            ts_us, event_id = int(p.ts_us), int(p.event_id)
            etype, value = str(p.event_type), float(p.value)
    state.update((ts_us, event_id, etype, value))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "last_ts_us": [ts_us],
            "last_type": [etype],
            "last_value": [value],
            "last_event_id": [event_id],
        }
    )


def running_compaction(events: DataFrame) -> DataFrame:
    """Streaming log compaction: latest state per user, updated each
    micro-batch (the upsert view of the stream, maintained incrementally).
    State is one tuple per key — bounded by the key cardinality, not the
    stream length; unlike the funnel's ordered stages, the compaction
    reducer is an argmax, so it needs no event-order guarantee from the
    source. Input columns: user_id, ts_us, event_id, event_type, value."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_latest,
        outputStructType=COMPACT_OUTPUT_SCHEMA,
        stateStructType=COMPACT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
