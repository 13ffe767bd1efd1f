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
