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


# ------------------------------------------------------- streaming SCD2

SCD2_OUTPUT_SCHEMA = (
    "user_id long, state string, valid_from long, valid_to long, version int"
)
SCD2_STATE_SCHEMA = "cur_state string, cur_from long, version int"


def _update_scd2(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Incremental SCD2 maintenance: the OPEN interval is the state; a
    state change CLOSES it (emit the closed row) and opens the next.
    Consecutive duplicates collapse exactly like the batch operator. Each
    interval is emitted once when it OPENS (valid_to = -1) and once when
    it CLOSES — the reassembly (max valid_to per version) happens in the
    finishing query. Rows within an invocation are sorted by
    (ts_us, event_id); ACROSS micro-batches the operator assumes per-key
    in-order delivery (the CDC contract — a keyed Kafka partition), the
    same assumption every incremental SCD2 materializer makes."""
    (user_id,) = key
    cur_state, cur_from, version = (
        state.get if state.exists else (None, 0, 0)
    )
    pdf = pd.concat(list(batches), ignore_index=True)
    pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
    out: dict[str, list] = {
        "user_id": [], "state": [], "valid_from": [], "valid_to": [],
        "version": [],
    }

    def emit(st, frm, to, ver):
        out["user_id"].append(user_id)
        out["state"].append(st)
        out["valid_from"].append(frm)
        out["valid_to"].append(to)
        out["version"].append(ver)

    for t, _eid, etype in zip(pdf["ts_us"], pdf["event_id"], pdf["event_type"]):
        t = int(t)
        if cur_state is None:
            cur_state, cur_from, version = etype, t, 1
            emit(cur_state, cur_from, -1, version)
        elif etype != cur_state:
            emit(cur_state, cur_from, t, version)  # close
            cur_state, cur_from, version = etype, t, version + 1
            emit(cur_state, cur_from, -1, version)  # open next
    state.update((cur_state, cur_from, version))
    yield pd.DataFrame(out)


def running_scd2(events: DataFrame) -> DataFrame:
    """events (streaming, `ts_us` long + `event_id` long + `event_type`) →
    append-mode interval open/close emissions per user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_scd2,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
