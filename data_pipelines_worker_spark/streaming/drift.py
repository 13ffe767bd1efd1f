"""Streaming face of distribution-drift monitoring (the windowed,
bounded-state sibling of ``queries/profiling_queries.py::ks_drift_check``).

Shape — the same lambda split as :mod:`.anomaly`: the *stateful* half is
only a watermarked windowed histogram, per
``(window, event_type, bin, side)`` — counts are commutative/associative/
retry-idempotent, so the materialized histogram table is bit-identical to
batch bucketing under any trigger boundaries, and state is
``O(types × n_bins)`` per open window (the exact-KS value grid, by
contrast, is unbounded — production drift monitors bin against a FIXED
reference range for precisely this reason). The KS statistic over the
binned ECDFs is a cross-bin analytic, so it runs as the downstream batch
step :func:`ks_from_binned`, shared verbatim with the post-stream check.

Binned KS is a *lower bound* of the exact statistic: coarsening the value
grid can only shrink ``max |ECDF_A − ECDF_B|`` (every bin edge is a grid
point of the exact ECDF; values inside a bin contribute no crossing). The
bound gap vanishes as bins shrink; monitoring practice fixes the binning
with the reference snapshot and compares like against like. The integer
cross-multiplied form (``max |cum_a·n_b − cum_b·n_a|``) is the one the
exact batch query uses — bit-exact on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_population_counts(
    events: DataFrame,
    lo: float = 0.0,
    hi: float = 1000.0,
    n_bins: int = 64,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    side_col: str = "user_id",
) -> DataFrame:
    """Per (epoch-hour bucket, event_type, bin): counts of the A (even
    ``side_col``) and B (odd) populations. The bin edges are FIXED by
    ``[lo, hi)`` and ``n_bins`` — declared with the reference snapshot,
    never data-dependent — so streamed histograms from different
    deployments merge additively. Out-of-range values clamp to the edge
    bins (a drifting tail lands in bin 0 / n_bins−1 and still moves the
    statistic); NULL values carry no ECDF position and are dropped.

    Works on batch frames too (the watermark is a no-op) — the parity
    test runs both sides."""
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("long")
    is_a = F.when(F.col(side_col) % 2 == 0, 1).otherwise(0)
    return (
        events.where(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("w"),
            group_col,
            bin_.alias("bin"),
        )
        .agg(
            F.sum(is_a).cast("long").alias("a"),
            F.sum(1 - is_a).cast("long").alias("b"),
        )
        .select(
            group_col,
            F.floor(
                F.unix_micros(F.col("w.start")).cast("double")
                / F.lit(3600000000.0)
            )
            .cast("long")
            .alias("bucket_hour"),
            "bin",
            "a",
            "b",
        )
    )


def ks_from_binned(
    counts: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Binned two-sample KS per (bucket_hour, group): the integer
    cross-multiplied statistic over bin-cumulative counts — the same
    algebra as the exact batch query, on the bounded grid. Emits
    ``(group, bucket_hour, n_a, n_b, ks_num, ks)``; windows where either
    population is empty report NULL ks (no distribution to compare)."""
    from pyspark.sql import Window

    wt = Window.partitionBy(group_col, "bucket_hour")
    wv = wt.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = counts.select(
        group_col,
        "bucket_hour",
        F.sum("a").over(wv).cast("long").alias("cum_a"),
        F.sum("b").over(wv).cast("long").alias("cum_b"),
        F.sum("a").over(wt).cast("long").alias("n_a"),
        F.sum("b").over(wt).cast("long").alias("n_b"),
    )
    diff = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    return (
        c.groupBy(group_col, "bucket_hour", "n_a", "n_b")
        .agg(F.max(diff).cast("long").alias("ks_num"))
        .select(
            group_col,
            "bucket_hour",
            "n_a",
            "n_b",
            "ks_num",
            F.when(
                F.col("n_a") * F.col("n_b") > 0,
                F.round(
                    F.col("ks_num")
                    / (F.col("n_a") * F.col("n_b")).cast("double"),
                    6,
                ),
            ).alias("ks"),
        )
    )
