"""Human-in-the-loop moderation as a decision stream.

Reference: ``fetch_moderation_tg`` long-polls Telegram GetUpdates, filters
callbacks by (processing_id, block_slug, input_index), and applies
**last-decision-wins** (block_fetch_moderation_telegram.go:99-245, the
last-wins rule :218-219; decline ⇒ stop :237-240; regenerate ⇒ goto target
block+index :241-245; retry-if-unknown 50×10s config.yaml:184-186).

Spark-first replacement: moderation events are a table/stream; the polling
loop becomes

- batch: max-by(event_time) per key — one shuffle, no loop;
- streaming: ``applyInPandasWithState`` keyed by the moderation key, state
  holding the latest (ts, action), emitting the current winner per batch.

The decision table feeds the driver-side control flow (stop / regenerate)
exactly where the reference's polling result did.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_COLS = ("processing_id", "block_slug", "input_index")

#: actions and their short forms (block_fetch_moderation_telegram.go:49-73)
ACTIONS = {"approve", "decline", "regenerate", "unknown"}
SHORT_FORMS = {"a": "approve", "d": "decline", "r": "regenerate"}


def normalize_action(col):
    """Expand short-form callbacks ('a'/'d'/'r') and map anything
    unrecognized to 'unknown' (retry-budget semantics happen upstream)."""
    c = F.lower(col)
    expr = c
    for short, full in SHORT_FORMS.items():
        expr = F.when(c == short, full).otherwise(expr)
    return F.when(expr.isin(*ACTIONS), expr).otherwise(F.lit("unknown"))


def last_decision_batch(events: DataFrame) -> DataFrame:
    """Last-decision-wins per moderation key (batch shape).

    ``max_by`` over (event_time, event_id) — a single partial-aggregating
    shuffle on the key; no window sort. Deterministic tie-break via
    event_id.
    """
    ordered = F.struct(F.col("event_time"), F.col("event_id"))
    return (
        events.withColumn("action", normalize_action(F.col("action")))
        .groupBy(*KEY_COLS)
        .agg(
            F.max_by("action", ordered).alias("action"),
            F.max("event_time").alias("decided_at"),
            F.count("*").alias("n_events"),
        )
    )


_STATE_SCHEMA = "ts timestamp, event_id long, action string"
_OUTPUT_SCHEMA = (
    "processing_id string, block_slug string, input_index long, "
    "action string, decided_at timestamp"
)


def _update_last_decision(key, pdf_iter: Iterator[pd.DataFrame], state):
    """applyInPandasWithState update fn: keep the max (ts, event_id) event."""
    if state.exists:
        ts, eid, action = state.get
    else:
        ts, eid, action = None, -1, None
    for pdf in pdf_iter:
        for _, row in pdf.sort_values(["event_time", "event_id"]).iterrows():
            if ts is None or (row.event_time, row.event_id) > (ts, eid):
                ts, eid, action = row.event_time, row.event_id, row.action
    state.update((ts, eid, action))
    yield pd.DataFrame(
        {
            "processing_id": [key[0]],
            "block_slug": [key[1]],
            "input_index": [key[2]],
            "action": [action],
            "decided_at": [ts],
        }
    )


def last_decision_stream(events_stream: DataFrame):
    """Streaming last-decision-wins: stateful, emits the current winner per
    key on every batch (output mode 'update').

    State is O(1) per moderation key — at 100 TB of events the state store
    holds only live (processing, block, index) keys.
    """
    normalized = events_stream.withColumn("action", normalize_action(F.col("action")))
    return normalized.groupBy(*[F.col(c) for c in KEY_COLS]).applyInPandasWithState(
        _update_last_decision,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def decisions_to_control(decisions: DataFrame) -> DataFrame:
    """Map decisions to the runner's control actions
    (approve ⇒ continue, decline ⇒ stop, regenerate ⇒ goto block+index,
    unknown ⇒ retry)."""
    return decisions.withColumn(
        "control",
        F.when(F.col("action") == "approve", "continue")
        .when(F.col("action") == "decline", "stop")
        .when(F.col("action") == "regenerate", "goto")
        .otherwise("retry"),
    )
