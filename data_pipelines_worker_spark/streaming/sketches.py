"""Streaming distinct-count sketch: the HyperLogLog registers of
queries/sketch_queries.py as a watermarked windowed aggregation.

Why this shape: counting distinct users per (window, event_type) exactly
in a stream needs state proportional to the distinct count — unbounded on
a high-cardinality key. The HLL register set is a 64-slot max() per
group: Spark folds every register into ONE stateful aggregation (64
conditional-max columns), so streaming state is 64 ints per open window
per group, evictable at the watermark, identical at any input rate.

Works for batch DataFrames too (watermark is a no-op) — the parity test
runs both sides; register semantics (max is idempotent, commutative,
associative) is exactly what makes the sketch correct under arbitrary
trigger boundaries and replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.sketch_queries import HLL_M, HLL_NUM, HLL_ZBITS, _hll_mix_col, _rho_col


def windowed_hll(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    group_col: str = "event_type",
) -> DataFrame:
    """Per (tumbling window, group): the 64 HLL register maxima folded
    into one aggregation pass, plus the raw integer estimate.

    Returns (window_start, group, n_regs, reg_sum, z_scaled, hll_est) —
    the same integer contract as the batch ``hll_registers`` query."""
    hv = _hll_mix_col(F.col(key_col))
    reg = F.pmod(hv, F.lit(HLL_M))
    rho = _rho_col(F.floor(hv / HLL_M))
    prepared = events.withColumn("__reg", reg).withColumn("__rho", rho)
    # one stateful agg: register i's max as a conditional max column
    maxes = [
        F.max(F.when(F.col("__reg") == i, F.col("__rho"))).alias(f"r{i}")
        for i in range(HLL_M)
    ]
    agg = (
        prepared.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(*maxes)
    )
    # projection-level harmonic sum: empty register (NULL max) ⇒ 2^ZBITS
    # (ZBITS = WBITS+1 so the ρ = WBITS+1 term stays a non-negative shift)
    z_terms = [
        F.coalesce(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_ZBITS} - r{i} AS INT))"),
            F.lit(1 << HLL_ZBITS).cast("long"),
        )
        for i in range(HLL_M)
    ]
    z = z_terms[0]
    for t in z_terms[1:]:
        z = z + t
    n_regs = sum(
        (F.when(F.col(f"r{i}").isNotNull(), 1).otherwise(0) for i in range(HLL_M)),
        F.lit(0),
    )
    reg_sum = sum(
        (F.coalesce(F.col(f"r{i}"), F.lit(0)) for i in range(HLL_M)), F.lit(0)
    )
    return agg.select(
        F.col("w.start").cast("long").alias("window_start"),
        group_col,
        n_regs.cast("long").alias("n_regs"),
        reg_sum.cast("long").alias("reg_sum"),
        z.cast("long").alias("z_scaled"),
    ).withColumn("hll_est", F.expr(f"CAST({HLL_NUM} div z_scaled AS BIGINT)"))


def windowed_cms(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    eps: float = 0.001,
    conf: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Per-tumbling-window Count-Min sketch of ``key_col`` as ONE
    watermarked stateful aggregation — streaming state is the sketch per
    open window (width = ceil(2/eps) = 2000, depth = ceil(log2(1/(1−conf)))
    = 7 at the defaults ⇒ ~112 KB of int64 counters), evicted at the
    watermark, constant at any input rate.

    CMS merge is element-wise counter addition (commutative,
    associative), so the streamed sketch is byte-identical to the batch
    sketch of the same window regardless of trigger boundaries — the
    parity test compares raw sketch bytes. Returns (window_start,
    cms_bytes, n_events); heavy-hitter estimation happens downstream by
    deserializing the (control-plane-sized) sketch, exactly like the
    batch ``cms_heavy_hitters`` query."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.expr(
                f"count_min_sketch(CAST({key_col} AS STRING), {eps}d, {conf}d, {seed})"
            ).alias("cms_bytes"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "cms_bytes",
            "n_events",
        )
    )
