"""Event-time windowed aggregation over the events stream.

The reference has no event-time semantics (SURVEY §2.3 gap) — this is the
Structured Streaming counterpart of ``relational_queries.windowed_agg``:
watermarked tumbling windows so late events are bounded and state is
evictable (mandatory at 100 TB streaming)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """count + value sum per (tumbling window, event_type).

    Works for both batch and streaming DataFrames (watermark is a no-op in
    batch); in streaming, append mode emits a window once the watermark
    passes its end.
    """
    from ..queries.relational_queries import cents as _cents

    cents = _cents(F.col("value"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), (F.sum(cents) / 100.0).alias("total_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windowed_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Native session windows per user: a session is a maximal event run
    with inter-event gaps < ``gap`` (``F.session_window`` — the engine
    merges/extends window state itself, unlike the hand-rolled
    ``applyInPandasWithState`` sessionizer in ``streaming/sessions.py``
    that numbers individual events).

    The two sessionizers answer different questions: this one emits one
    aggregate row per *closed* session (append mode, watermark-evicted
    state — the 100 TB shape for session KPIs); the stateful one labels
    every event with its session ordinal for downstream joins. Break semantics:
    ``session_window`` windows are half-open — a gap of exactly the
    threshold starts a new session (>= break), while the lag-based batch
    query breaks strictly greater; the parity test proves the dataset
    has no exact-boundary gap before cross-checking session counts.

    Works in batch too (watermark no-op) — the parity tests run the same
    expression both ways.
    """
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("value_cents"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("session_start"),
            F.unix_micros(F.col("w.end")).alias("session_end"),
            "user_id",
            "n_events",
            F.col("value_cents").cast("long").alias("value_cents"),
        )
    )
