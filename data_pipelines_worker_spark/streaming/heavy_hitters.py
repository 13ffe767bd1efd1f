"""Stateful streaming heavy hitters: Misra–Gries summaries per group via
``applyInPandasWithState`` — at most k counters of state per event_type,
at any input rate, forever.

The Misra–Gries guarantee (Misra & Gries 1982; the "space-saving" family):
after processing N items with k counters, every key whose true count
exceeds N/k is present in the summary, and each stored count
undercounts the truth by at most the summary's decrement total (≤ N/k).
Both bounds hold under arbitrary trigger boundaries because the per-batch
update is exactly the sequential algorithm applied to the batch's rows
with the standing counters as the starting state.

This is the streaming face of the batch ``cms_heavy_hitters`` query
(queries/scale_queries.py): CMS answers "estimate any key" with ~112 KB
and no candidate list; MG answers "which keys are frequent" with k
counters and a containment guarantee. A production pipeline runs MG for
candidates and CMS (or an exact second pass) for counts.

At 100 TB: state is O(groups × k) — independent of rows; no shuffle of
the raw stream beyond the group-key partitioning the state store already
requires.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

K_COUNTERS = 8

_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("key", LongType()),
        StructField("mg_count", LongType()),
        StructField("n_processed", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("keys", StringType()),  # comma-joined counter keys
        StructField("counts", StringType()),  # comma-joined counter values
        StructField("n", LongType()),
    ]
)


def mg_update(counters: dict[int, int], key: int, k: int = K_COUNTERS) -> None:
    """One sequential Misra–Gries step, in place."""
    if key in counters:
        counters[key] += 1
    elif len(counters) < k:
        counters[key] = 1
    else:
        for c in list(counters):
            counters[c] -= 1
            if counters[c] == 0:
                del counters[c]


def _mg(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        keys_s, counts_s, n = state.get
        counters = (
            dict(
                zip(
                    (int(x) for x in keys_s.split(",")),
                    (int(x) for x in counts_s.split(",")),
                )
            )
            if keys_s
            else {}
        )
    else:
        counters, n = {}, 0
    for pdf in batches:
        pdf = pdf.sort_values("event_id")  # deterministic within-batch order
        for uid in pdf["user_id"]:
            mg_update(counters, int(uid))
            n += 1
    state.update(
        (
            ",".join(str(x) for x in counters),
            ",".join(str(counters[x]) for x in counters),
            n,
        )
    )
    if counters:
        out = pd.DataFrame(
            {
                "event_type": [key[0]] * len(counters),
                "key": list(counters.keys()),
                "mg_count": list(counters.values()),
                "n_processed": [n] * len(counters),
            }
        )
    else:
        # a decrement cascade can empty the summary exactly at a trigger
        # boundary — emit a NULL-key sentinel so n_processed (and the fact
        # that the summary is empty) stays observable downstream instead
        # of consumers silently reusing the previous trigger's counters
        out = pd.DataFrame(
            {
                "event_type": [key[0]],
                "key": pd.array([None], dtype="Int64"),
                "mg_count": pd.array([None], dtype="Int64"),
                "n_processed": [n],
            }
        )
    yield out


def mg_heavy_hitters_stream(events: DataFrame) -> DataFrame:
    """Per event_type Misra–Gries summary stream: each trigger emits the
    current candidate set (key, lower-bound count, items processed).
    Input columns: (event_id, event_type, user_id)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _mg,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
