"""Watermarked stream-stream interval join (view→click attribution).

The reference has no join operator at all (SURVEY §2.3) — its only merge
is the positional MergeMaps zip. This is the Structured Streaming join the
gap map assigns to Spark built-ins: two event streams joined per user
within a bounded event-time interval, with watermarks on *both* sides so
the join state is evictable (unbounded state is the 100 TB streaming
killer — the interval condition is what lets Spark prove an old row can
never match again and drop it).

Batch/stream dual-use: watermarks are a no-op in batch, so the same plan
is the batch interval join the DuckDB oracle replicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    interval: str = "30 minutes",
    watermark: str = "2 hours",
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Inner join: each right event within ``(left.ts, left.ts + interval]``
    for the same key. Output carries both ids and the exact microsecond lag.

    State bound: with both sides watermarked and the join condition
    range-bounded on event time, Spark evicts left rows once the right
    watermark passes ``left.ts + interval`` (and right rows symmetrically)
    — state size is O(rate × interval), independent of stream length.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    lts, rts = F.col(f"l.{ts_col}"), F.col(f"r.{ts_col}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts > lts)
        & (rts <= lts + F.expr(f"INTERVAL {interval}"))
    )
    return l.join(r, cond).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        (F.unix_micros(rts) - F.unix_micros(lts)).alias("lag_us"),
    )
