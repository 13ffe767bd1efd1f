"""Divergence-localization probes (VERDICT r3 #1).

``window_functions`` (r02+r03) and ``q8_market_share`` (r03) failed the
driver's hash gate while reproducing bit-exact green on every local data
generation — the divergence lives in the *driver's* parquet generation or
DuckDB session, not in committed semantics. These three probes sit at the
top of ``__spark_entry__._DRIVER_PRIORITY`` so that CORRECTNESS_r04
*names* the driver-side cause even if a headline row stays red:

- ``probe_events_ts``   red  ⟺  events.ts carries sub-microsecond residue
  (nano-generation parquet) or the micro-epoch values themselves disagree
  (timezone attachment / nanosAsLong conversion error).
- ``probe_orders_dates`` red ⟺  orders.o_orderdate is instant-annotated
  and DuckDB extracts year() in a non-UTC session timezone, or its epoch
  micros disagree outright.
- ``probe_money_cents`` red  ⟺  round() semantics differ between engines
  on this data (cents() quantization, q1/q8's money arithmetic base).

Each probe isolates exactly one divergence class; production queries use
the normalized forms (`unix_micros`/`epoch_us`, `make_timestamp(epoch_us(…))`)
so they stay green regardless; the probes deliberately include the *raw*
expressions whose divergence they are designed to detect.

DIAGNOSIS (round 6) — the r02–r05 red-row streak named its layer: the
divergence is in the **driver harness's client-side type conversion of
DuckDB results, not in data, arithmetic, or Spark**. Evidence: the five
red rows of CORRECTNESS_r05 (`probe_money_cents`, `window_functions`,
`q8_market_share`, `group_linreg`, `q12_ship_delay_priority`) are
*exactly* the five queries of the 146-query registry whose oracle SQL
returns a DuckDB HUGEINT (int128) column — `sum()` over an
integer-typed expression is HUGEINT in DuckDB — and no green query
returns one. HUGEINT is the one common output type whose Python
conversion differs by fetch API: `fetchall()` → int (`6`),
`fetchdf()` → float64 (`6.0`), `.arrow()` → Decimal('6'); a
stringified value-hash then mismatches Spark's BIGINT (`6`) even
though the numeric values are identical — which is precisely the
observed signature (rows_match ∧ schema_match ∧ ¬hash_match, on 3-row
results, local fetchall-based replica green for four straight rounds,
per-row date probes green, IEEE-exact `floor(x*100+0.5)` probe red).
Fix: every integer aggregate in oracle SQL carries an outer
``CAST(sum(…) AS BIGINT)`` (and exact >int64 moments travel as
VARCHAR on both sides); ``tests/test_oracle_type_parity.py`` now
lint-gates the whole registry so no oracle can ever return HUGEINT or
DECIMAL again. ``probe_money_bits`` / ``probe_orders_priority`` below
complete the layer proof: per-row, aggregation-free, HUGEINT-free —
green certifies the data + arithmetic layers independently of the
aggregate path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from . import register


@register(
    "probe_events_ts",
    """
    SELECT event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           CAST(epoch_ns(ts) % 1000 AS BIGINT) AS sub_us_residue
    FROM events
    """,
)
def probe_events_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark reads events.ts at microsecond precision (nano-generation
    parquet is truncated in load_table, session.py:113); it therefore
    asserts sub_us_residue = 0. DuckDB reports the actual nanosecond
    residue. A hash mismatch here proves the driver's events.ts carries
    sub-µs information that Spark cannot see — the exact mechanism that
    would flip raw-`ts` window ordering (window_functions r02/r03 red)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.lit(0).cast("long").alias("sub_us_residue"),
    )


@register(
    "probe_orders_dates",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS o_year_raw,
           epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS ts_us
    FROM orders
    """,
)
def probe_orders_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw (unnormalized) year extraction plus epoch micros. If the
    driver's o_orderdate parquet is instant-annotated (isAdjustedToUTC=1),
    DuckDB evaluates year() in its session timezone while Spark is pinned
    UTC — o_year_raw flips on boundary rows while ts_us stays equal
    (the q8_market_share r03 red-row theory). If instead the epoch values
    themselves differ, the divergence is in the reader, not the zone."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year_raw"),
        F.unix_micros(F.col("o_orderdate")).alias("ts_us"),
    )


@register(
    "probe_money_cents",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_price_c,
           CAST(sum(CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_disc_c,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_vol_c
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def probe_money_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cents() quantization that every money query builds on, summed
    per returnflag — including q8's two-factor vol_c product. r04 proved
    the round(x*100) form divergent (Spark HALF_UP on the shortest decimal
    repr vs DuckDB rounding the binary value; the timestamp probes were
    green). The probe now carries the production ``floor(x*100 + 0.5)``
    form, whose multiply/add/floor steps are each IEEE correctly-rounded
    and therefore bit-identical across engines. Red here would mean even
    IEEE-exact quantization diverges — i.e. the engines read *different
    doubles* from the same parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    price_c = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    disc_c = F.floor((F.lit(1) - F.col("l_discount")) * 100 + 0.5).cast("long")
    return li.groupBy("l_returnflag").agg(
        F.sum(price_c).alias("sum_price_c"),
        F.sum(disc_c).alias("sum_disc_c"),
        F.sum(price_c * disc_c).alias("sum_vol_c"),
    )


@register(
    "probe_lineitem_dates",
    """
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) AS ship_us,
           CAST(epoch_ns(l.l_shipdate) % 1000 AS BIGINT) AS sub_us_residue,
           epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS order_us,
           CASE WHEN epoch_us(CAST(l.l_shipdate AS TIMESTAMP))
                     <= epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) + 2592000000000
                THEN 1 ELSE 0 END AS fast_flag
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    """,
)
def probe_lineitem_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q12 divergence class, isolated (VERDICT r4 "missing" #1): the
    r04 probes covered events.ts and orders.o_orderdate but not
    lineitem.l_shipdate, and q12's red row hinges on the 30-day
    FAST/SLOW boundary. Emits per (l_orderkey, l_linenumber): epoch
    micros of both dates, the nanosecond residue Spark cannot see
    (asserted 0 on the Spark side, actual ``epoch_ns % 1000`` on the
    DuckDB side), and the integer-micros boundary flag q12 now uses. A
    red row names exactly which ingredient the driver's generation
    diverges on; green certifies the q12 rewrite's arithmetic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ship_us = F.unix_micros(F.col("l_shipdate"))
    order_us = F.unix_micros(F.col("o_orderdate"))
    return li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        ship_us.alias("ship_us"),
        F.lit(0).cast("long").alias("sub_us_residue"),
        order_us.alias("order_us"),
        F.when(ship_us <= order_us + F.lit(2_592_000_000_000), 1)
        .otherwise(0)
        .cast("long")
        .alias("fast_flag"),
    )


@register(
    "probe_money_bits",
    """
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(floor(l_extendedprice * 34359738368) AS BIGINT) AS price_bits,
           CAST(floor(l_discount * 34359738368) AS BIGINT) AS disc_bits
    FROM lineitem
    """,
)
def probe_money_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row binary fingerprint of the money doubles (VERDICT r5
    "missing" #1a). ``floor(x * 2**35)`` is a pure exponent shift —
    exact in IEEE-754 for every double of this magnitude, immune to FMA
    contraction (no addition anywhere) and to shortest-decimal-repr
    round-tripping — so the emitted BIGINT is a deterministic function
    of the 64 bits the engine read from parquet. Aggregation-free and
    HUGEINT-free: a red row here proves the engines see *different
    doubles* (driver data/reader layer); green certifies the data layer
    byte-for-byte, leaving only client-side result conversion as a
    possible divergence (the layer the r06 diagnosis names)."""
    li = load_table(spark, sf_dir, "lineitem")
    scale = F.lit(34359738368)  # 2**35: power-of-two scaling is exact
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.floor(F.col("l_extendedprice") * scale).cast("long").alias("price_bits"),
        F.floor(F.col("l_discount") * scale).cast("long").alias("disc_bits"),
    )


@register(
    "probe_events_value_bits",
    """
    SELECT event_id,
           CAST(floor(value * 34359738368) AS BIGINT) AS value_bits
    FROM events
    """,
)
def probe_events_value_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.value under the same exact power-of-two fingerprint as
    :func:`probe_money_bits` — the double that feeds
    ``window_functions`` run_cents and ``group_linreg`` y. Per-row, no
    aggregate, no HUGEINT."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.floor(F.col("value") * F.lit(34359738368)).cast("long").alias("value_bits"),
    )


@register(
    "probe_orders_priority",
    """
    SELECT o_orderkey,
           o_orderpriority,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END
             AS high_flag
    FROM orders
    """,
)
def probe_orders_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one q12 ingredient never driver-probed (VERDICT r5 "missing"
    #1b): per-row order priority and the exact IN-list flag q12's CASE
    sums build on. With ``probe_lineitem_dates`` green (dates + 30-day
    boundary) and this green (priority + flag), every q12 input is
    certified per-row — so q12's own color isolates to the aggregate
    output layer, which the r06 HUGEINT fix addresses."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .cast("int")
        .alias("high_flag"),
    )
