"""Stateful streaming sessionization: ``applyInPandasWithState`` keyed by
user, 30-min inactivity gap, event-time timeout.

The batch counterpart is ``relational_queries.sessionization`` (lag +
running boundary sum). In a stream the lag window is unavailable — session
state (current session ordinal, last event time) must live in the state
store, keyed by user, and sessions must *close* via watermark-driven
timeouts so state stays bounded (mandatory at 100 TB: per-user state is
O(1), eviction is the watermark's job).

Semantics: an event starts a new session when it is the user's first or
arrives more than ``gap`` after the previous one; emitted rows carry the
session ordinal per user — identical to the batch query for in-order
per-user data (the test feeds sorted parquet; out-of-order events within
the watermark bound still sessionize by arrival order, the standard
streaming relaxation)."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

GAP_SECONDS = 1800.0

_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("session_no", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("session_no", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _sessionize(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # watermark passed gap after the last event: the session is closed,
        # its ordinal is durable in prior emissions — drop the state.
        state.remove()
        return
    if state.exists:
        session_no, last_ts = state.get
        last = None if last_ts is None else last_ts.timestamp()
    else:
        session_no, last = 0, None
    out = []
    for pdf in batches:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, eid in zip(pdf["ts"], pdf["event_id"]):
            cur = ts.timestamp()
            if last is None or cur - last > GAP_SECONDS:
                session_no += 1
            last = cur
            out.append((int(eid), int(key[0]), int(session_no)))
    state.update((session_no, pd.Timestamp(last, unit="s")))
    # close the session once event time moves gap past the last event;
    # clamp above the current watermark — a user whose newest event is
    # older than watermark-minus-gap (late but inside the allowance) would
    # otherwise compute a timeout below the watermark, which Spark rejects
    # with IllegalArgumentException and kills the streaming query
    timeout_ms = int(last * 1000) + int(GAP_SECONDS * 1000)
    state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
    yield pd.DataFrame(out, columns=["event_id", "user_id", "session_no"])


def sessionize_stream(
    events: DataFrame, watermark: str = "2 hours", ts_col: str = "ts"
) -> DataFrame:
    """(event_id, user_id, session_no) with per-user state in the state
    store; state for a user is evicted ``GAP`` after their last event
    (event-time timeout bound by the watermark)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
