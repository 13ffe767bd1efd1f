"""Streaming one-pass Poisson bootstrap: per-(window, event_type)
confidence intervals for the mean, maintained as ONE stateful windowed
aggregation — the streaming face of the batch ``bootstrap_ci`` query.

Why this works online: the Poisson-resampling trick makes every
replicate a pair of SUMS (Σw·x, Σw) with deterministic per-(row,
replicate) weights — sums are commutative/associative/additive, so the
16 replicates fold in the same aggregation pass as the point estimate.
Streaming state is 2·R + 2 = 34 longs per open (window, group) — fixed
at any input rate, evictable at the watermark — and the result is
bit-identical to the batch computation under any trigger boundaries
(the parity test runs stream vs batch on the same rows).

The CI step (order statistics of the replicate means) happens in the
stateless projection AFTER the fold: replicate means as an array,
empty resamples filtered out, rank-picked lo/hi — the same integer
arithmetic as the batch query's window form (values coincide: sorted
ties are value-equal whichever tie-break ordered them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.intmath import exact_floordiv
from ..queries.profiling_queries import _BOOT_R, poisson_weight_col


def _weight(r: int) -> Column:
    # the ONE weight channel shared with the batch query — no local copy
    return poisson_weight_col(F.col("event_id") * _BOOT_R + F.lit(r) + 1)


def windowed_bootstrap_ci(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Per (tumbling window, group): point mean + bootstrap CI from 16
    Poisson replicates, folded in one stateful aggregation.

    Returns (window_start, group, n, point_mean_c, n_boot, boot_lo_c,
    boot_hi_c) — the same integer contract as the batch ``bootstrap_ci``
    query. Works on batch frames too (the watermark is a no-op), which
    is how the parity test pins stream ≡ batch."""
    ev = events.where(F.col("value").isNotNull()).withColumn(
        "__vc", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    )
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.sum("__vc").cast("long").alias("sc"),
    ]
    for r in range(_BOOT_R):
        w = _weight(r)
        aggs.append(F.sum(w * F.col("__vc")).cast("long").alias(f"swc{r}"))
        aggs.append(F.sum(w).cast("long").alias(f"sw{r}"))
    agg = (
        ev.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(*aggs)
    )
    means = F.array(
        *[
            F.when(
                F.col(f"sw{r}") > 0,
                exact_floordiv(F.col(f"swc{r}"), F.col(f"sw{r}")),
            )
            for r in range(_BOOT_R)
        ]
    )
    # groups whose 16 resamples are ALL empty (possible for singleton
    # groups: every replicate drew weight 0) are dropped BEFORE the
    # order-statistic projection — matching the batch query, where such
    # groups vanish at the sw > 0 filter; without the filter the
    # element_at(arr, 0) below is an ANSI error and the streaming query
    # wedges in a replay crash loop
    withm = agg.withColumn(
        "arr", F.sort_array(F.filter(means, lambda x: x.isNotNull()))
    ).where(F.size("arr") > 0)
    n_boot = F.size("arr").cast("long")
    k_lo = F.greatest(
        F.lit(1).cast("long"),
        exact_floordiv(n_boot * 2, F.lit(_BOOT_R).cast("long")),
    )
    return withm.select(
        F.col("w.start").cast("long").alias("window_start"),
        group_col,
        "n",
        exact_floordiv(F.col("sc"), F.col("n")).alias("point_mean_c"),
        n_boot.alias("n_boot"),
        F.element_at(F.col("arr"), k_lo.cast("int")).alias("boot_lo_c"),
        F.element_at(F.col("arr"), (n_boot + 1 - k_lo).cast("int")).alias(
            "boot_hi_c"
        ),
    )
