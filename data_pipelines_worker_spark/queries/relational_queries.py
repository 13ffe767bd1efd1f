"""Relational operators (SURVEY §2.3 gap map) — joins, aggregations,
windows, set ops, pivot, rollup, as-of — expressed declaratively so
Catalyst owns the physical strategy.

Scale notes baked into each query:
- dimension joins (region/nation/supplier) are explicitly ``F.broadcast``;
- aggregates round through :func:`r2`/:func:`r4` only at the *output*
  boundary (to make double sums hash-comparable against DuckDB) — the
  aggregation itself is exact partial-agg + shuffle;
- ordering never relies on floating-point ties: every top-k has an
  integer-keyed deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import load_table
from . import register


def r2(col):  # output-boundary rounding for double aggregates
    return F.round(col, 2)


def r4(col):
    return F.round(col, 4)


def cents(col):
    """2-decimal column → exact integer hundredths.

    Money sums as doubles are association-order-dependent (Spark's partial
    aggregation vs DuckDB's sequential sum differ in the last ulp, which
    flips round()ed output). Summing exact int64 cents is order-independent
    and engine-independent; divide back to currency at the output boundary.

    Quantized as ``floor(x*100 + 0.5)`` rather than ``round(x*100)``:
    Spark's round() routes a double through its *shortest decimal repr*
    (java BigDecimal.valueOf, HALF_UP) while DuckDB rounds the actual
    binary value, so inputs whose shortest repr lands exactly on a half
    diverge by 1 (proved by probe_money_cents r04: red under round(),
    while the timestamp probes were green). multiply/add/floor are each
    IEEE correctly-rounded, so this expression is bit-identical across
    engines by construction. Matching oracle form:
    ``CAST(floor(x * 100 + 0.5) AS BIGINT)``.
    """
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0        AS sum_qty,
           sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0   AS sum_base_price,
           sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0 AS sum_disc_price,
           sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)
               * CAST(floor((1 + l_tax) * 100 + 0.5) AS BIGINT)) / 1000000.0 AS sum_charge,
           CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / count(*) / 100.0
                                                                       AS avg_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / count(*) / 100.0
                                                                       AS avg_price,
           CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) / count(*) / 100.0
                                                                       AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter (pushed to parquet) → partial agg →
    final agg. One shuffle on a 6-value grouping key; trivially skew-free.
    All money math in exact integer cents (see :func:`cents`)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_c = cents(F.col("l_quantity"))
    price_c = cents(F.col("l_extendedprice"))
    disc_c = cents(F.lit(1) - F.col("l_discount"))
    tax_c = cents(F.lit(1) + F.col("l_tax"))
    n = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c) / 100.0).alias("sum_qty"),
            (F.sum(price_c) / 100.0).alias("sum_base_price"),
            (F.sum(price_c * disc_c) / 10000.0).alias("sum_disc_price"),
            (F.sum(price_c * disc_c * tax_c) / 1000000.0).alias("sum_charge"),
            (F.sum(qty_c).cast("double") / n / 100.0).alias("avg_qty"),
            (F.sum(price_c).cast("double") / n / 100.0).alias("avg_price"),
            (F.sum(cents(F.col("l_discount"))).cast("double") / n / 100.0).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) / 10000.0 AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate query — every
    predicate is pushable (`PushedFilters` carries shipdate/discount/
    quantity bounds to the parquet reader, row groups skip on min/max), the
    scan reads only 4 columns, and the global sum partial-aggregates to a
    single row per partition before one tiny shuffle. At 100 TB this query
    is I/O-bound by design; money math in exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents(F.col("l_extendedprice")) * cents(F.col("l_discount"))) / 10000.0).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
               * CAST(floor((1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0 AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer is the small side of the first join →
    broadcast; lineitem⋈orders shuffles on orderkey once."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice")) * cents(F.lit(1) - F.col("l_discount")))
                / 10000.0
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name,
           sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
               * CAST(floor((1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0 AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: fact-fact join on orderkey (one shuffle), all four
    dimension joins broadcast (nation/region/supplier/customer are tiny
    relative to any SF)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice")) * cents(F.lit(1) - F.col("l_discount")))
                / 10000.0
            ).alias("revenue")
        )
    )


@register(
    "top_k_per_group",
    """
    SELECT c_mktsegment, c_custkey, n_orders, rn FROM (
      SELECT c_mktsegment, c_custkey, n_orders,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY n_orders DESC, c_custkey) AS BIGINT) AS rn
      FROM (
        SELECT c.c_mktsegment, c.c_custkey, count(*) AS n_orders
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, c.c_custkey
      )
    ) WHERE rn <= 3
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via window; integer count + custkey tie-break keeps
    the boundary deterministic (no float ordering)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("n_orders"), F.asc("c_custkey"))
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
    )


@register(
    "sessionization",
    """
    SELECT event_id, user_id, CAST(session_no AS BIGINT) AS session_no FROM (
      SELECT event_id, user_id,
             sum(CASE WHEN gap IS NULL OR gap > 1800.0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
      FROM (
        SELECT event_id, user_id, ts,
               epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
        FROM events
      )
    )
    """,
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize events with a 30-min inactivity gap: lag + running sum of
    boundary flags. Single shuffle on user_id; both windows share the same
    partitioning so Spark plans one exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    boundary = F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0)
    return (
        ev.withColumn("session_no", F.sum(boundary).over(w).cast("long"))
        .select("event_id", "user_id", "session_no")
    )


@register(
    "windowed_agg",
    """
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
           event_type, count(*) AS n,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window — the batch shape of the
    Structured Streaming aggregation in streaming/windows.py. Window start
    emitted as epoch seconds so the oracle comparison is integer-exact."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "agg_distinct",
    """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / count(*) / 100.0
             AS avg_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (F.sum(cents(F.col("o_totalprice"))).cast("double") / F.count("*") / 100.0).alias(
            "avg_price"
        ),
    )


@register(
    "set_ops",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — planned by Spark as a left-anti aggregate join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    finished = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.exceptAll(finished).distinct()


@register(
    "pivot_event_counts",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS n_click,
           count(*) FILTER (event_type = 'view')     AS n_view,
           count(*) FILTER (event_type = 'purchase') AS n_purchase,
           count(*) FILTER (event_type = 'signup')   AS n_signup,
           count(*) FILTER (event_type = 'error')    AS n_error
    FROM events GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra pass to discover values —
    at 100 TB the implicit-distinct pivot is a full extra job). Exercises
    the `RelationalGroupedDataset.pivot` API surface; its `pivotfirst`
    plan costs a second exchange — see `pivot_event_type` for the
    conditional-aggregation form that pivots values in one."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    df = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    for k in kinds:
        df = df.withColumn(f"n_{k}", F.coalesce(F.col(k), F.lit(0)).cast("long")).drop(k)
    return df


@register(
    "rollup_lineitem",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS qty,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        (F.sum(cents(F.col("l_quantity"))) / 100.0).alias("qty"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@register(
    "asof_join",
    """
    SELECT e.event_id, CAST(floor(epoch(s.ts)) AS BIGINT) AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — SURVEY §2.3): implemented as
    union + last-value window, the shuffle-once scalable pattern (one
    exchange on user_id, no O(n²) range join, no per-group pandas)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("error", "signup")
    )
    # signups sort before errors at identical ts (tag 0 < 1) so an equal-ts
    # signup is visible to the error row, matching ASOF's >= bound.
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "signup", 0).otherwise(1).alias("tag"),
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts_raw"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn(
            "signup_ts", F.last("signup_ts_raw", ignorenulls=True).over(w).cast("long")
        )
        .where(F.col("tag") == 1)
        .select("event_id", "signup_ts")
    )


@register(
    "semi_anti_join",
    """
    WITH buyers AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT n.n_name AS nation,
           count(*) FILTER (WHERE b.o_custkey IS NOT NULL) AS with_f_orders,
           count(*) FILTER (WHERE b.o_custkey IS NULL)     AS without_f_orders
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    LEFT JOIN buyers b ON b.o_custkey = c.c_custkey
    GROUP BY n.n_name
    """,
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join coverage: customers with vs without finished orders,
    per nation. Spark-side it is a genuine ``left_semi`` + ``left_anti``
    (both plan as existence hash joins — the orders side is aggregated to
    distinct keys by the join itself, no DISTINCT materialization), then a
    broadcast nation join and one skew-free aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders_f = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select(F.col("o_custkey").alias("c_custkey"))
    semi = cust.join(orders_f, "c_custkey", "left_semi").withColumn(
        "has", F.lit(1)
    )
    anti = cust.join(orders_f, "c_custkey", "left_anti").withColumn(
        "has", F.lit(0)
    )
    both = semi.unionByName(anti).join(
        F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey")
    )
    return both.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum("has").alias("with_f_orders"),
        F.sum(1 - F.col("has")).alias("without_f_orders"),
    )


@register(
    "outer_join_agg",
    """
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)), 0) AS DOUBLE)
             / 100.0 AS total_spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def q_outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + aggregate preserving zero-order customers (the
    outer-join class was otherwise uncovered). count(col) skips the nulls
    the outer join introduces, so customers without orders report 0/0.0 —
    same null semantics as the SQL oracle. Shuffle on c_custkey only."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", cents(F.col("o_totalprice")).alias("price_c")
    )
    joined = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left"
    )
    return joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("n_orders"),
        (F.coalesce(F.sum("price_c"), F.lit(0)).cast("double") / 100.0).alias(
            "total_spend"
        ),
    )


@register(
    "q14_promo_revenue",
    """
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                        THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                             * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                        * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE),
             6) AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — conditional aggregation over a fact-dim join.
    Date bounds push to the lineitem scan; part broadcasts; the CASE is a
    codegen'd projection feeding one map-side-combined aggregate. Money in
    exact integer cents so the ratio is engine-independent."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_c = cents(F.col("l_extendedprice")) * cents(1 - F.col("l_discount"))
    joined = li.join(
        F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")
    ).select(
        disc_c.alias("rev_c"),
        F.when(F.col("p_type").startswith("PROMO"), disc_c)
        .otherwise(F.lit(0))
        .alias("promo_c"),
    )
    agg = joined.agg(F.sum("promo_c").alias("p"), F.sum("rev_c").alias("t"))
    return agg.select(
        F.round(100.0 * F.col("p").cast("double") / F.col("t").cast("double"), 6).alias(
            "promo_revenue_pct"
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT o.o_orderkey,
           CAST(sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_qty,
           max(o.o_totalprice) AS o_totalprice
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 20000
    )
    GROUP BY o.o_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — HAVING-filtered keys semi-joined back to the
    fact. The heavy aggregation (sum qty per order) runs once; the
    qualifying key set drives a left_semi before the final join+agg, so
    non-qualifying orders never reach the wide join. One shuffle key
    (orderkey) throughout — co-partitioned end to end."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", cents(F.col("l_quantity")).alias("qty_c")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty_c").alias("tq"))
        .where(F.col("tq") > 20000)
        .select("l_orderkey")
    )
    li_big = li.join(big, "l_orderkey", "left_semi")
    joined = orders.join(
        li_big, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return joined.groupBy("o_orderkey").agg(
        (F.sum("qty_c").cast("double") / 100.0).alias("total_qty"),
        F.max("o_totalprice").alias("o_totalprice"),
    )


@register(
    "date_functions",
    """
    SELECT CAST(date_trunc('month', make_timestamp(epoch_us(o_orderdate))) AS DATE)
             AS order_month,
           CAST(EXTRACT(year FROM make_timestamp(epoch_us(o_orderdate))) AS BIGINT)
             AS order_year,
           CAST(EXTRACT(quarter FROM make_timestamp(epoch_us(o_orderdate))) AS BIGINT)
             AS order_quarter,
           count(*) AS n_orders,
           CAST(max(datediff('day', DATE '1992-01-01',
                             CAST(make_timestamp(epoch_us(o_orderdate)) AS DATE)))
                AS BIGINT) AS max_days_since_epoch
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function library coverage (absent from the reference,
    SURVEY §2.3 — times there are raw float seconds): truncation,
    component extraction, date arithmetic, all JVM built-ins grouped in one
    shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.max(F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")))
        .cast("long")
        .alias("max_days_since_epoch"),
    )


@register(
    "window_functions",
    """
    SELECT event_id,
           coalesce(lag(event_id) OVER w, -1) AS prev_id,
           coalesce(lead(event_id) OVER w, -1) AS next_id,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           CAST(row_number() OVER w AS BIGINT) AS cd_num,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS cd_den,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
             OVER (PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS run_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
    """,
)
def q_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth over one partitioning: lag/lead, ntile,
    cume_dist-as-integer-pair, and a running sum share the same
    (user_id, ts) window, so Catalyst plans a single exchange + sort for
    all six — the multi-window consolidation that matters when analysts
    stack window columns at 100 TB. Ordering key is the *integer epoch
    microsecond* (Spark ``unix_micros(ts)``, oracle
    ``epoch_us(CAST(ts AS TIMESTAMP))``) tie-broken by ``event_id`` — not
    the raw timestamp. Spark's parquet reader surfaces nano-generation
    ``ts`` truncated to microseconds while DuckDB reads TIMESTAMP_NS at
    full precision, so ordering by the raw column lets two events that
    differ only below 1 µs be a tie in Spark but strictly ordered in
    DuckDB, silently flipping lag/lead/ntile/row_number (VERDICT r3 #1).
    Normalizing the key to micros *by construction* makes both engines
    sort identically on every data generation; ``probe_events_ts``
    localizes any residual sub-µs divergence.

    Driver-canonicalization discipline (VERDICT r2 #1): every column is a
    non-NULL BIGINT. lag/lead coalesce to a -1 sentinel (event_id is
    non-negative, so the sentinel is unambiguous), and cume_dist is
    emitted as the exact integer pair (cd_num = peers-<=-current count =
    row_number under a tie-free ordering, cd_den = partition count)
    instead of a rounded double — the driver's pandas sort+hash cannot
    then diverge on NULL-int dtype promotion or last-digit rounding."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")), F.col("event_id"))
    wr = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    wp = W.partitionBy("user_id")
    return ev.select(
        "event_id",
        F.coalesce(F.lag("event_id").over(w), F.lit(-1)).alias("prev_id"),
        F.coalesce(F.lead("event_id").over(w), F.lit(-1)).alias("next_id"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.row_number().over(w).cast("long").alias("cd_num"),
        F.count(F.lit(1)).over(wp).cast("long").alias("cd_den"),
        F.sum(cents(F.col("value"))).over(wr).alias("run_cents"),
    )


@register(
    "interval_join_attribution",
    """
    SELECT v.user_id,
           v.event_id AS left_id,
           c.event_id AS right_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
    FROM events v
    JOIN events c
      ON c.user_id = v.user_id
     AND c.ts > v.ts
     AND c.ts <= v.ts + INTERVAL 30 MINUTE
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→click attribution: every click within 30 minutes after a view
    by the same user — the batch face of the watermarked stream-stream
    interval join (:func:`..streaming.joins.interval_join`; stream≡batch
    parity in test_streaming.py). Event-time lag emitted as exact integer
    microseconds. In batch Catalyst plans the equi-key + range residual as
    a hash join on user_id; in streaming the same range bound is what
    makes join state evictable (O(rate × interval))."""
    from ..streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view")
    clicks = ev.where(F.col("event_type") == "click")
    return interval_join(views, clicks, interval="30 minutes")


@register(
    "cohort_retention",
    """
    WITH firstseen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
    )
    SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.act_week) // 7 AS BIGINT)
             AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM active a JOIN firstseen f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week, counted active
    per subsequent week offset — the canonical growth-analytics triangle.
    Two aggregations over one scan (first-seen per user, distinct active
    weeks) joined on the user key; offsets are exact integer day
    differences ÷ 7 (both weeks are Monday-truncated, so the difference is
    always a multiple of 7). At 100 TB both aggregations partial-combine
    map-side and the join key is the 8-byte user id."""
    ev = load_table(spark, sf_dir, "events")
    firstseen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        active.join(firstseen, "user_id")
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "funnel_analysis",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS tv FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.tv
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.tc
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked_after_view,
           (SELECT count(*) FROM p) AS n_purchased_after_click
    """,
)
def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view → later click → later purchase per user, each
    stage anchored on the previous stage's first occurrence (min-ts
    anchoring makes the ordered-sequence match a pair of aggregations +
    equi-joins instead of a per-user sort — the shape that survives scale;
    a window-sort funnel would shuffle the full event stream per stage).
    Single-row integer output."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("tv")
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


# --- time-series resampling (round 4) --------------------------------------

_RESAMPLE_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, value,
         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_idx,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
),
bounds AS (
  SELECT user_id, min(hour_idx) AS h0, max(hour_idx) AS h1 FROM e GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1)) AS hour_idx FROM bounds
),
hourly AS (
  SELECT user_id, hour_idx,
         count(*) AS n_events,
         max({'ts_us': ts_us, 'event_id': event_id, 'value': value}) AS last_row
  FROM e GROUP BY user_id, hour_idx
)
SELECT g.user_id, g.hour_idx,
       CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events,
       last_value(h.last_row.value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour_idx
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_ffill
FROM grid g LEFT JOIN hourly h USING (user_id, hour_idx)
"""


@register("timeseries_resample", _RESAMPLE_ORACLE)
def q_timeseries_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with forward fill — the upsample/gap-fill
    move every time-series pipeline needs (metric dashboards, feature
    grids for sequence models): per user, one row per hour between the
    user's first and last event, carrying the hour's event count and the
    last observed value at or before that hour.

    Determinism: the grid key is the integer micro-epoch hour
    (``unix_micros // 3.6e9`` — the window_functions lesson: never order
    or join on raw engine-local timestamps); the per-hour "last" value
    is the max of the (ts_us, event_id, value) struct (exact
    lexicographic tie-break), and forward-fill copies raw doubles
    without arithmetic, so the emitted floats are bit-identical on any
    engine.

    Scale shape: one (user, hour) partial-combined aggregate, a
    per-user sequence explode (grid rows ≈ users × span-hours, generated
    not stored), one co-keyed left join, one per-user ordered window for
    the fill — state is a single running value per user."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        "value",
        F.floor(F.unix_micros(F.col("ts")) / 3_600_000_000).cast("long").alias("hour_idx"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    bounds = e.groupBy("user_id").agg(
        F.min("hour_idx").alias("h0"), F.max("hour_idx").alias("h1")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hour_idx")
    )
    hourly = e.groupBy("user_id", "hour_idx").agg(
        F.count("*").alias("n_events"),
        F.max(F.struct("ts_us", "event_id", "value")).alias("last_row"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("hour_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour_idx"], "left")
        .select(
            "user_id",
            "hour_idx",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            F.last(F.col("last_row.value"), ignorenulls=True)
            .over(w)
            .alias("value_ffill"),
        )
    )


# --- grouped linear regression from exact integer moments (round 4) --------

_LINREG_ORACLE = """
WITH m AS (
  SELECT event_type,
         count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM (
    SELECT e.event_type,
           epoch_us(CAST(e.ts AS TIMESTAMP)) // 3600000000 - g.min_h AS x,
           CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS y
    FROM events e,
         (SELECT min(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) AS min_h
          FROM events) g
  )
  GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
       CAST(sxx AS VARCHAR) AS sxx, CAST(syy AS VARCHAR) AS syy,
       CAST(sxy AS VARCHAR) AS sxy,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / nullif(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0) AS slope,
       (CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / nullif(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0) * sx) / n
         AS intercept,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / nullif(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy), 0)
         AS corr
FROM m
"""


@register("group_linreg", _LINREG_ORACLE)
def q_group_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares regression (value-cents against hours
    since the corpus start) computed from *exact integer moments*: n, Σx,
    Σy are int64 sums and Σx², Σy², Σxy are decimal(37,0) sums of
    decimal(18,0) products (exact at any corpus size — a silent int64
    wrap on Σy² would diverge from DuckDB's HUGEINT sum; Spark decimal
    keeps the product precision p1+p2 ≤ 37 lossless). Slope/intercept/
    Pearson-r derive from the exact moments with one fixed double
    expression tree — every float op (convert, multiply, divide, sqrt)
    is IEEE correctly-rounded on identical inputs, so even the derived
    doubles hash-match across engines; degenerate groups (zero x- or
    y-variance) emit NULL on both sides via the nullif/when guard
    instead of an engine-dependent Inf/NaN. The built-in
    ``regr_slope``/``corr`` aggregates stream float partial sums and are
    NOT portable — the moment form is how distributed exact statistics
    are done.

    x is re-based against the global min hour (broadcast 1-row aggregate)
    so the x moments stay span-bounded, not epoch-sized. One
    partial-combined aggregate over the scan."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.floor(F.unix_micros(F.col("ts")) / 3_600_000_000).cast("long")
    gmin = ev.agg(F.min(hour).alias("min_h"))
    base = ev.crossJoin(F.broadcast(gmin)).select(
        "event_type",
        (hour - F.col("min_h")).alias("x"),
        cents(F.col("value")).alias("y"),
    )
    xd, yd = F.col("x").cast("decimal(18,0)"), F.col("y").cast("decimal(18,0)")
    m = base.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sxd * F.col("sy")
    den = nd * F.col("sxx").cast("double") - sxd * F.col("sx")
    slope = F.when(den != 0, num / den)
    cden = F.sqrt(den) * F.sqrt(nd * F.col("syy").cast("double") - syd * F.col("sy"))
    return m.select(
        "event_type",
        "n", "sx", "sy",
        # Exact big-integer moments travel as canonical decimal strings:
        # int64 can wrap at corpus scale and every non-string wide-integer
        # type (Spark decimal, DuckDB HUGEINT) converts differently across
        # fetchall/fetchdf/arrow — VARCHAR is the one representation every
        # client API round-trips verbatim.
        F.col("sxx").cast("string").alias("sxx"),
        F.col("syy").cast("string").alias("syy"),
        F.col("sxy").cast("string").alias("sxy"),
        slope.alias("slope"),
        ((syd - slope * F.col("sx")) / F.col("n")).alias("intercept"),
        F.when(cden != 0, num / cden).alias("corr"),
    )


@register(
    "rolling_features",
    """
    WITH e AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
      FROM events
    )
    SELECT user_id, event_id,
           CAST(count(*) OVER w5 AS BIGINT) AS n_last5,
           CAST(sum(v_c) OVER w5 AS BIGINT) AS sum_last5_c,
           CAST(max(v_c) OVER w5 AS BIGINT) AS max_last5_c,
           CAST(ts_us - lag(ts_us) OVER wu AS BIGINT) AS gap_us,
           CAST(row_number() OVER wu AS BIGINT) AS seq
    FROM e
    WINDOW wu AS (PARTITION BY user_id ORDER BY ts_us, event_id),
           w5 AS (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling event features (the feature-engineering shape a
    behavioral model trains on): trailing-5-row count/sum/max of the
    event value, inter-event gap, and sequence number — one window
    partition per user, totally ordered by (epoch micros, event_id) per
    the timestamp-normalization rules, money in integer cents.

    Scale shape: ONE hash exchange on user_id feeds every frame (Spark
    plans all five functions over the shared sort); trailing-row frames
    keep O(frame) state per partition, never the whole user history."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    e = ev.select(
        "user_id",
        "event_id",
        ts_us.alias("ts_us"),
        cents(F.col("value")).alias("v_c"),
    )
    wu = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    w5 = wu.rowsBetween(-4, W.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.count("*").over(w5).cast("long").alias("n_last5"),
        F.sum("v_c").over(w5).cast("long").alias("sum_last5_c"),
        F.max("v_c").over(w5).cast("long").alias("max_last5_c"),
        (F.col("ts_us") - F.lag("ts_us").over(wu)).cast("long").alias("gap_us"),
        F.row_number().over(wu).cast("long").alias("seq"),
    )


# --- CUBE / grouping-sets profile (round 6) ----------------------------------

_CUBE_ORACLE = """
SELECT c.c_mktsegment, o.o_orderpriority,
       CAST(GROUPING(c.c_mktsegment, o.o_orderpriority) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY CUBE (c.c_mktsegment, o.o_orderpriority)
"""


@register("cube_segment_metrics", _CUBE_ORACLE)
def q_cube_segment_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (market segment, order priority): every rollup
    level — per cell, per segment, per priority, grand total — in one
    pass, disambiguated by ``grouping_id`` (bit order verified equal to
    DuckDB's ``GROUPING(a, b)`` — leftmost column is the high bit in
    both engines).

    Scale shape: Catalyst plans CUBE as one Expand (4 grouping-set
    replicas of each input row) feeding a single partial+final hash
    aggregate — one shuffle keyed on (segment, priority, gid) whose
    cardinality is the cube lattice (|segments|+1)x(|priorities|+1),
    tiny regardless of fact size; the customer dim broadcasts into the
    fact join. Money sums travel as exact int64 cents (cents()), so the
    4x row replication never touches double association order.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment", "o_orderpriority", cents(F.col("o_totalprice")).alias("tc")
    )
    return (
        joined.cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum("tc").alias("total_cents"),
        )
        .select(
            "c_mktsegment",
            "o_orderpriority",
            F.col("gid").cast("long"),
            F.col("n_orders").cast("long"),
            F.col("total_cents").cast("long"),
        )
    )


# --- pivot / wide-table reshape (round 6) ------------------------------------

#: The five event types are a closed enum in the generator; pinning them
#: keeps the pivot single-pass (no extra distinct-values job) and the
#: output schema stable — the production posture for any bounded enum.
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_ORACLE = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click'    THEN v_c END) AS BIGINT) AS click_c,
       CAST(sum(CASE WHEN event_type = 'error'    THEN v_c END) AS BIGINT) AS error_c,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN v_c END) AS BIGINT) AS purchase_c,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN v_c END) AS BIGINT) AS signup_c,
       CAST(sum(CASE WHEN event_type = 'view'     THEN v_c END) AS BIGINT) AS view_c
FROM (SELECT user_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
      FROM events)
GROUP BY user_id
"""


@register("pivot_event_type", _PIVOT_ORACLE)
def q_pivot_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide reshape: per-user event-value totals pivoted to one
    column per event type (the feature-matrix export shape). Values are
    explicitly pinned so Spark skips the distinct-values pre-job and the
    schema is static; a user with no events of a type gets NULL, exactly
    like the oracle's CASE-without-ELSE.

    Scale shape: ONE hash aggregate over user_id with five conditional
    sum states — a single exchange, partial-combined map-side. This is
    deliberately NOT `RelationalGroupedDataset.pivot`, which Catalyst
    compiles to TWO aggregates ((user_id, event_type) pre-sum, then a
    `pivotfirst` re-shuffle on user_id) — double the exchanges for the
    same wide rows; with the enum pinned, conditional aggregation is the
    strictly better plan at scale. Money rides as exact integer cents.
    `pivot_event_counts` keeps the `.pivot()` API form for the count
    variant — the pair documents the API-vs-plan trade."""
    ev = load_table(spark, sf_dir, "events")
    v_c = cents(F.col("value"))
    return (
        ev.select("user_id", "event_type", v_c.alias("v_c"))
        .groupBy("user_id")
        .agg(
            *[
                F.sum(F.when(F.col("event_type") == t, F.col("v_c")))
                .cast("long")
                .alias(f"{t}_c")
                for t in _EVENT_TYPES
            ]
        )
    )


# --- range-frame (interval) window (round 6) ----------------------------------

_RANGE_WINDOW_ORACLE = """
WITH e AS (
  SELECT user_id, event_id,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
)
SELECT user_id, event_id,
       CAST(count(*) OVER wh AS BIGINT) AS n_1h,
       CAST(sum(v_c) OVER wh AS BIGINT) AS sum_1h_c
FROM e
WINDOW wh AS (PARTITION BY user_id ORDER BY ts_us
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@register("range_interval_window", _RANGE_WINDOW_ORACLE)
def q_range_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-one-hour RANGE frame per user: how many events and how
    much value in the hour ending at each event — the time-decayed
    feature `rolling_features`' ROWS frames can't express (a RANGE frame
    bounds by *value distance* on the order key, so sparse and bursty
    users get the same one-hour semantics). Order key is integer epoch
    micros; RANGE mode includes ts peers on both engines by the SQL
    standard, so ties need no tie-break column.

    Scale shape: one hash exchange on user_id, one sort, O(frame) running
    state — Spark's window operator advances two pointers over the sorted
    run; nothing rescans. 100 TB: identical plan per user shard; skewed
    users are bounded by their own event rate × 1 h."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        cents(F.col("value")).alias("v_c"),
    )
    wh = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count("*").over(wh).cast("long").alias("n_1h"),
        F.sum("v_c").over(wh).cast("long").alias("sum_1h_c"),
    )
