"""Streaming face of the 3σ event-rate anomaly detector
(queries/profiling_queries.py::events_anomaly).

Shape: the *stateful* half is only the hourly (event_type, window) count —
a plain watermarked windowed aggregation whose state is one int64 per open
window per type, evicted at the watermark. Count is commutative/
associative/retry-idempotent under append mode, so the materialized count
table is bit-identical to the batch bucketing regardless of trigger
boundaries. The 3σ flags need *global* per-type moments (every bucket, a
cross-bucket statistic), so they are a downstream batch step over the
materialized counts — the lambda-architecture split: stream the additive
state, batch the cross-window analytics. ``flag_anomalies`` is that step,
shared verbatim by the batch query and the post-stream check, keeping the
integer-moment algebra (no sqrt, no floats) in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Per (event_type, epoch-hour bucket) event counts as a watermarked
    windowed aggregation. Tumbling 1-hour windows align to epoch hours, so
    ``bucket_hour = epoch_us(window.start) / 3600e6`` matches the batch
    query's integer bucketing exactly. Works on batch frames too (the
    watermark is a no-op there) — the parity test runs both sides."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(F.count("*").cast("long").alias("c"))
        .select(
            group_col,
            F.floor(
                F.unix_micros(F.col("w.start")).cast("double") / F.lit(3600000000.0)
            )
            .cast("long")
            .alias("bucket_hour"),
            "c",
        )
    )


def flag_anomalies(counts: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Buckets whose count exceeds mean + 3σ of their group, tested on
    integer moments only: ``(c·B − S) > 0 ∧ (c·B − S)² > 9·(B·Σc² − S²)``
    — bit-exact on any engine, shared by the batch query and the
    post-stream check."""
    m = counts.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    d = F.col("c") * F.col("n_buckets") - F.col("s")
    return (
        counts.join(F.broadcast(m), group_col)
        .filter(
            (d > 0)
            & (d * d > 9 * (F.col("n_buckets") * F.col("s2") - F.col("s") * F.col("s")))
        )
        .select(group_col, "bucket_hour", "c")
    )
