"""Stateful streaming EWMA per user — the incremental twin of the batch
``ewma_events`` strict fold (queries/warehouse_queries.py), with O(1)
state per key: the recursion s_i = x_i/2 + s_{i-1}/2 folds one row at a
time, so the state is just (current ewma, count, last-seen position).

Ordering contract: the fold is order-dependent, so exact batch parity
holds when each user's events arrive in (ts, event_id) order across
triggers (a per-key-ordered source — e.g. a partitioned log). Within a
trigger, rows are sorted before folding; rows at or before the
last-folded position are *late* under the contract — they are counted in
``n_late`` and excluded from the fold rather than silently absorbed in
the wrong order (the same observable-drop policy as the watermarked
windows). alpha = 1/2 keeps each multiply an exact exponent shift, so
the streamed double equals the batch fold bit-for-bit, and the emitted
value is the same 2^35-scaled integer quantization.

At 100 TB: state is 4 scalars per user forever — no buffer growth; the
only shuffle is the state store's key partitioning.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ewma_bits", LongType()),
        StructField("n_events", LongType()),
        StructField("n_late", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("ewma", DoubleType()),
        StructField("n", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("n_late", LongType()),
    ]
)


def _fold(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        ewma, n, last_ts, last_eid, n_late = state.get
    else:
        ewma, n, last_ts, last_eid, n_late = 0.0, 0, -1, -1, 0
    for pdf in batches:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts_us, eid, v in zip(pdf["ts_us"], pdf["event_id"], pdf["value"]):
            pos = (int(ts_us), int(eid))
            if pos <= (last_ts, last_eid):
                n_late += 1
                continue
            # NULL value poisons the fold exactly like the batch side
            # (acc*0.5 + NULL*0.5 = NULL): represent as NaN in state
            x = float("nan") if v is None or pd.isna(v) else float(v)
            ewma = ewma * 0.5 + x * 0.5
            n += 1
            last_ts, last_eid = pos
    state.update((ewma, n, last_ts, last_eid, n_late))
    bits = None if math.isnan(ewma) else math.floor(ewma * 34359738368)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "ewma_bits": pd.array([bits], dtype="Int64"),
            "n_events": [n],
            "n_late": [n_late],
        }
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    """Per-user streaming EWMA (alpha = 1/2). Input columns:
    (user_id long, ts_us long, event_id long, value double); each trigger
    emits the key's current (ewma_bits, n_events, n_late)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _fold,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
