"""Shared CDC latest-wins kernel: ONE home for the snapshot projection
(epoch-micros timestamp, exact-cents value) and the rank-1-per-key
reduction, used by both the batch ``latest_snapshot`` query and the
streaming ``snapshot_sink`` — the floor-quantization family has already
been one repo-wide bug class (see __spark_entry__ history), so the
formula must not fork between the batch and streaming twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SNAP_COLS = ("user_id", "last_ts_us", "last_event_type", "last_value_cents")


def project_events(events: DataFrame) -> DataFrame:
    """(user_id, last_ts_us, last_event_type, last_value_cents, event_id)
    from a raw event frame — epoch micros and exact cents."""
    return events.select(
        "user_id",
        F.unix_micros("ts").alias("last_ts_us"),
        F.col("event_type").alias("last_event_type"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("last_value_cents"),
        "event_id",
    )


def latest_per_key(df: DataFrame) -> DataFrame:
    """Rank-1 per user by (ts, event_id) over a projected frame. Plans as
    WindowGroupLimit: one candidate row per (partition, key) crosses the
    exchange."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("last_ts_us").desc(), F.col("event_id").desc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
