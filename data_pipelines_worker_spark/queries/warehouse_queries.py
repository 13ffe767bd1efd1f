"""Warehouse-maintenance queries: the table-upkeep patterns a lakehouse
pipeline runs beside analytics — CDC latest-snapshot compaction, SCD-2
dimension merge, an explicitly salted skew join, and an open-order
backlog timeline (interval counting as +1/−1 events under a running
sum).

Portability discipline as everywhere: timestamps compare as integer
epoch-micros, money as exact cents, sampling/salting via the Knuth
multiplicative hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.intmath import md5_fold60
from ..session import load_table
from . import register

# --- CDC latest-snapshot compaction -----------------------------------------

_SNAPSHOT_ORACLE = """
SELECT user_id, last_ts_us, last_event_type, last_value_cents
FROM (
  SELECT user_id,
         CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
         event_type AS last_event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS last_value_cents,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("latest_snapshot", _SNAPSHOT_ORACLE)
def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: the latest event per user (event-id tie-break) —
    the upsert-materialization step that turns an append-only change log
    into a current-state snapshot table.

    Scale shape: rank-1 per key is a partitioned window with
    WindowGroupLimit — each task keeps one row per key per partition
    before the key-hashed exchange, so the shuffle carries one candidate
    row per (partition, key), not the log. This is exactly how a
    compaction job over a 100-TB change log should plan (the alternative
    max-join reads the log twice).
    """
    from ..operators.cdc import latest_per_key, project_events

    ev = load_table(spark, sf_dir, "events")
    # projection + rank-1 shared verbatim with the streaming twin
    # (streaming/snapshot.py) via operators/cdc.py
    return latest_per_key(project_events(ev)).drop("event_id")


# --- SCD-2 dimension merge ---------------------------------------------------

_SCD2_ORACLE = """
WITH upd AS (
  SELECT c_custkey, (c_nationkey + 1) % 25 AS new_nationkey
  FROM customer WHERE c_custkey % 10 = 3
)
SELECT c.c_custkey,
       CAST(1 AS BIGINT) AS version,
       CAST(c.c_nationkey AS BIGINT) AS nationkey,
       CAST(CASE WHEN u.c_custkey IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS is_current
FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
UNION ALL
SELECT c_custkey,
       CAST(2 AS BIGINT) AS version,
       CAST(new_nationkey AS BIGINT) AS nationkey,
       CAST(1 AS BIGINT) AS is_current
FROM upd
"""


@register("scd2_customer_merge", _SCD2_ORACLE)
def q_scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 dimension merge: apply a deterministic update batch (every
    custkey ≡ 3 mod 10 moves to the next nation) to the customer
    dimension, emitting the slowly-changing history — the old version
    closed (is_current = 0) and the new version appended. The synthetic
    update batch stands in for a CDC feed; the merge semantics (close +
    append, never overwrite) are the real contract.

    Scale shape: the update batch joins the dimension on its key (left
    join for closing, union of the appended versions) — one key-hashed
    exchange over the dimension; at CDC scale the small batch side
    broadcasts. No window, no global ordering: SCD-2 versioning is
    per-key and embarrassingly parallel.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    upd = c.filter(F.col("c_custkey") % 10 == 3).select(
        "c_custkey", ((F.col("c_nationkey") + 1) % 25).alias("new_nationkey")
    )
    closed = (
        c.join(upd.select("c_custkey", F.lit(1).alias("_u")), "c_custkey", "left")
        .select(
            "c_custkey",
            F.lit(1).cast("long").alias("version"),
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.when(F.col("_u").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_current"),
        )
    )
    appended = upd.select(
        "c_custkey",
        F.lit(2).cast("long").alias("version"),
        F.col("new_nationkey").cast("long").alias("nationkey"),
        F.lit(1).cast("long").alias("is_current"),
    )
    return closed.unionAll(appended)


# --- explicitly salted skew join ---------------------------------------------

_N_SALT = 8

_SALT_JOIN_ORACLE = """
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched,
       CAST(sum(CASE WHEN c.c_custkey IS NOT NULL
                     THEN floor(e.value * 100 + 0.5) ELSE 0 END) AS BIGINT)
         AS matched_value_cents
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY e.event_type
"""


@register("skew_salted_join", _SALT_JOIN_ORACLE)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manual salt-replication pattern for skewed shuffle joins,
    verified against the plain join's answer: the build side (customer)
    is replicated ×8 with a salt column, the probe side (events) draws
    its salt from the Knuth hash of the event id, and the join keys on
    (user_id, salt) — a hot user's rows now spread over 8 reducers
    instead of one. The aggregate must be identical to the unsalted
    plain-join oracle, which is the whole point: salting changes the
    partitioning, never the answer.

    Scale shape: replication multiplies the (small) build side, not the
    log; the probe side's salt is a scan-local expression. At 100 TB
    this is the fallback when AQE's skew split cannot help (e.g. the
    skew is in a hash-aggregate key, or the join is a stream-static one
    where AQE does not re-plan).
    """
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    salted_dim = cust.select(
        "c_custkey", F.explode(F.sequence(F.lit(0), F.lit(_N_SALT - 1))).alias("salt")
    )
    probe = ev.select(
        "event_type",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("value_cents"),
        F.pmod(
            F.pmod(F.pmod(F.col("event_id"), F.lit(1 << 31)) * F.lit(2654435761), F.lit(1 << 32)),
            F.lit(_N_SALT),
        ).alias("salt"),
    )
    joined = probe.join(
        salted_dim,
        (probe.user_id == salted_dim.c_custkey) & (probe.salt == salted_dim.salt),
        "left",
    )
    return joined.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(F.col("c_custkey").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_matched"),
        F.sum(
            F.when(F.col("c_custkey").isNotNull(), F.col("value_cents")).otherwise(0)
        )
        .cast("long")
        .alias("matched_value_cents"),
    )


# --- open-order backlog timeline --------------------------------------------

_BACKLOG_ORACLE = """
WITH done AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(floor(max(epoch_us(l_shipdate)) / 2592000000000.0) AS BIGINT)
           AS close_m
  FROM lineitem GROUP BY l_orderkey
),
opened AS (
  SELECT CAST(floor(epoch_us(o.o_orderdate) / 2592000000000.0) AS BIGINT) AS m,
         CAST(1 AS BIGINT) AS delta
  FROM orders o JOIN done USING (o_orderkey)
  UNION ALL
  SELECT close_m + 1 AS m, CAST(-1 AS BIGINT) AS delta FROM done
),
monthly AS (SELECT m, CAST(sum(delta) AS BIGINT) AS d FROM opened GROUP BY m)
SELECT m AS month_idx, d AS net_change,
       CAST(sum(d) OVER (ORDER BY m) AS BIGINT) AS open_orders
FROM monthly
"""


@register("order_backlog_timeline", _BACKLOG_ORACLE)
def q_order_backlog_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time: each order contributes +1 at its
    placement month and −1 the month after its last lineitem ships; the
    running sum of monthly net change is the number of concurrently open
    orders — the standard O(n) interval-counting rewrite of a quadratic
    point-in-interval join. Months are integer epoch-micro buckets
    (30-day), so the timeline is engine-exact.

    Scale shape: completion is one order-keyed max aggregate over
    lineitem (map-side combined); the +1/−1 stream aggregates to one row
    per month BEFORE the running-sum window, which therefore sorts only
    the month frame (dozens of rows) in a single partition — the global
    window is over the aggregate, never the data.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    month = lambda col: F.floor(  # noqa: E731
        F.unix_micros(col) / F.lit(2592000000000)
    ).cast("long")
    done = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.floor(F.max(F.unix_micros("l_shipdate")) / F.lit(2592000000000))
        .cast("long")
        .alias("close_m")
    )
    opened = (
        orders.join(done, "o_orderkey")
        .select(month(F.col("o_orderdate")).alias("m"), F.lit(1).cast("long").alias("delta"))
        .unionAll(
            done.select(
                (F.col("close_m") + 1).alias("m"), F.lit(-1).cast("long").alias("delta")
            )
        )
    )
    monthly = opened.groupBy("m").agg(F.sum("delta").cast("long").alias("d"))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        F.col("m").alias("month_idx"),
        F.col("d").alias("net_change"),
        F.sum("d").over(w).cast("long").alias("open_orders"),
    )


@register(
    "zone_map_pruning",
    """
    WITH zm AS (
      SELECT CAST(year(make_timestamp(epoch_us(l_shipdate))) * 100
                  + month(make_timestamp(epoch_us(l_shipdate))) AS BIGINT)
               AS zone,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS min_price_c,
             CAST(max(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS max_price_c,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty
      FROM lineitem
      GROUP BY 1
    )
    SELECT zone, n_rows, min_price_c, max_price_c, min_qty, max_qty,
           CASE WHEN max_price_c < 1000000 OR min_price_c >= 5000000
                THEN 0 ELSE 1 END AS would_scan
    FROM zm
    """,
)
def q_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map skipping stats (``operators/zonemap.py``): ship-month
    zones over lineitem carrying count + min/max envelopes for price
    cents and quantity, then the per-zone scan/skip verdict for the
    range predicate ``$10,000 <= price < $50,000`` — the manifest-level
    pruning table an Iceberg/Delta planner consults before opening a
    single file. One partial-combined aggregate over the scan; the
    pruning decision is a literal predicate on the manifest-sized
    result. The reader-side twin (`index_targeting`) asserts Spark
    physically skips row groups; this query produces the stats that
    make such skipping possible for table formats the engine writes."""
    from ..operators.zonemap import range_scan_flags, zone_maps

    li = load_table(spark, sf_dir, "lineitem")
    zone = (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("long")
    maps = zone_maps(
        li,
        zone,
        {
            "price_c": F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"),
            "qty": F.col("l_quantity"),
        },
    )
    return range_scan_flags(maps, "price_c", 1_000_000, 5_000_000)


# --- EWMA smoothing (round 6) ------------------------------------------------

_EWMA_ORACLE = """
SELECT user_id,
       CAST(floor(list_reduce(
              list_prepend(0.0, list(value ORDER BY epoch_us(ts), event_id)),
              (acc, x) -> acc * 0.5 + x * 0.5) * 34359738368) AS BIGINT)
         AS ewma_bits,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
"""


@register("ewma_events", _EWMA_ORACLE)
def q_ewma_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average (alpha = 1/2) of
    event values in (ts, event_id) order — the classic smoothing
    recursion s_i = alpha*x_i + (1-alpha)*s_{i-1}, evaluated as a strict
    left fold so both engines perform the identical IEEE operation
    sequence. alpha = 0.5 keeps every multiply an exact exponent shift
    (only the adds round), and the result travels as 2^35-scaled
    integer bits, the same FMA/representation-immune quantization as
    the probe family (probe_queries.probe_money_bits).

    Scale shape: one key-hashed shuffle carrying (ts_us, event_id,
    value) triples; per-user state is that user's event list — the same
    bound every ordered-fold feature (group_linreg, rolling_features)
    already carries. The streaming twin would fold incrementally with
    O(1) state per key; batch recomputes because the fold is
    associative only in its prefix form.
    """
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("ts_us"),
                F.col("event_id").alias("event_id"),
                F.col("value").alias("value"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("e")).alias("s"))
    )
    fold = F.aggregate(
        F.col("s"),
        F.lit(0.0),
        lambda acc, x: acc * F.lit(0.5) + x["value"] * F.lit(0.5),
    )
    return seq.select(
        "user_id",
        F.floor(fold * F.lit(34359738368)).cast("long").alias("ewma_bits"),
        F.size("s").cast("long").alias("n_events"),
    )


# --- native session-window stats (round 6) -----------------------------------

_SESSION_WINDOW_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS
                        BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sno
  FROM g
)
SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS session_start,
       CAST(epoch_us(max(ts)) + 1800000000 AS BIGINT) AS session_end,
       user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM s GROUP BY user_id, sno
"""


@register("session_window_stats", _SESSION_WINDOW_ORACLE)
def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session aggregates via the NATIVE ``F.session_window``
    operator (30-min inactivity gap): one row per session with its
    micros-exact [start, last_event + gap) envelope, event count, and
    exact-cents value sum. The oracle rebuilds sessions with the
    half-open break semantics session_window actually implements (a gap
    of exactly the threshold starts a NEW session — ``>=``, unlike the
    lag-based ``sessionization`` query's strict ``>``), so the operator's
    boundary behavior itself is hash-pinned, not just its happy path.

    Scale shape: session_window plans as a single user-keyed exchange +
    sort + merging session aggregate — state is one open session per
    key; the streaming twin (streaming/windows.py, the identical
    expression) evicts it by watermark. This is the engine-native
    alternative to the applyInPandasWithState sessionizer for
    per-session KPIs.
    """
    from ..streaming.windows import session_windowed_stats

    ev = load_table(spark, sf_dir, "events").select("ts", "user_id", "value")
    return session_windowed_stats(ev)


# --- corpus snapshot diff (round 6) ------------------------------------------

_CORPUS_DIFF_ORACLE = """
WITH v1 AS (
  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 11 <> 3
), v2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 2 THEN text || ' rev2' ELSE text END) AS fp
  FROM documents WHERE doc_id % 13 <> 5
)
SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN v1.fp <> v2.fp THEN 'changed'
            ELSE 'unchanged' END AS status,
       v1.fp AS fp_old, v2.fp AS fp_new
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
"""


@register("corpus_snapshot_diff", _CORPUS_DIFF_ORACLE)
def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content diff between two corpus snapshots: every doc labeled
    added / removed / changed / unchanged by comparing content
    fingerprints across versions (the audit step a training-corpus
    release pipeline runs before re-triggering downstream dedup /
    decontamination on only the delta — `incremental_dedup` is the
    consumer of the 'added'+'changed' slice). Versions are derived
    deterministically from the shared table (v2 drops the %13 slice,
    adds the %11 slice, rewrites the %7 slice) so the oracle sees the
    identical pair.

    Scale shape: fingerprints are scan-bound projections; the diff is
    ONE doc_id-keyed full outer join — with both snapshots bucketed by
    doc_id (the layout `bucketed_join_agg` demonstrates) the exchange
    disappears entirely and the diff is a zero-shuffle zip of
    co-located partitions. Shuffle payload is (doc_id, 32-char fp),
    never document bodies.
    """
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 11 != 3).select(
        "doc_id", F.md5("text").alias("fp")
    )
    v2 = docs.filter(F.col("doc_id") % 13 != 5).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 2, F.concat(F.col("text"), F.lit(" rev2"))
            ).otherwise(F.col("text"))
        ).alias("fp"),
    )
    j = v1.alias("a").join(v2.alias("b"), on="doc_id", how="full_outer")
    return j.select(
        "doc_id",
        F.when(F.col("a.fp").isNull(), "added")
        .when(F.col("b.fp").isNull(), "removed")
        .when(F.col("a.fp") != F.col("b.fp"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        F.col("a.fp").alias("fp_old"),
        F.col("b.fp").alias("fp_new"),
    )


# --- activity streaks: gaps & islands (round 6) --------------------------------

_STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000.0)
              AS BIGINT) AS day
  FROM events
),
isl AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM days
),
streaks AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS len
  FROM isl GROUP BY user_id, grp
)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(sum(len) AS BIGINT) AS n_active_days
FROM streaks GROUP BY user_id
"""


@register("activity_streaks", _STREAKS_ORACLE)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands per user: longest run of consecutive active days,
    number of distinct runs, and total active days — the classic
    streak/retention feature, computed with the canonical
    ``day − row_number()`` island key (consecutive days share the
    difference; any gap shifts it). Days are integer epoch-day indexes —
    timezone-free, bit-identical on both engines.

    Scale shape: dedup to (user, day) first (map-side combine — the
    event stream never reaches the window), then ONE user_id exchange
    serves the row_number sort and both stacked aggregates (islands,
    then per-user rollup) — Catalyst keeps the partitioning, so three
    logical steps ride one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.col("ts")) / 86_400_000_000.0).cast("long")
    days = ev.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id", "day", (F.col("day") - F.row_number().over(w)).alias("grp")
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count("*").cast("long").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count("*").cast("long").alias("n_streaks"),
        F.sum("len").cast("long").alias("n_active_days"),
    )


# --- rolling distinct actives: DAU / trailing-7-day WAU (round 6) ---------------

_ROLLING_ACTIVE_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000.0)
              AS BIGINT) AS day
  FROM events
),
fanout AS (
  SELECT user_id, day + i AS target_day, day = day + i AS is_today
  FROM days, LATERAL unnest(generate_series(0, 6)) AS t(i)
),
grid AS (SELECT DISTINCT day FROM days)
SELECT f.target_day AS day,
       CAST(count(DISTINCT CASE WHEN f.is_today THEN f.user_id END)
            AS BIGINT) AS dau,
       CAST(count(DISTINCT f.user_id) AS BIGINT) AS wau_7d
FROM fanout f JOIN grid g ON g.day = f.target_day
GROUP BY f.target_day
"""


@register("rolling_active_users", _ROLLING_ACTIVE_ORACLE)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and trailing-7-day distinct active users (DAU / WAU) — the
    headline engagement metrics. Exact rolling COUNT DISTINCT cannot ride
    a window frame (distinct state doesn't merge by subtraction), so both
    engines use the standard fan-out: each (user, active-day) pair
    contributes to the 7 target days it covers, and the per-day aggregate
    counts distinct contributors. Days observed with no grid row (pure
    future fan-out) are clipped to real days.

    Scale shape: dedup to (user, day) map-side first — the 7× fan-out
    multiplies the *deduped* activity table, not the raw event stream;
    the distinct-count aggregate partial-combines per day. At 100 TB the
    fan-out factor is the window length, a constant — contrast a naive
    self-join over the day range, which rescans activity per day. The
    approximate alternative (mergeable HLL registers per day, union over
    the window) is `hll_registers`; this is the exact path."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.col("ts")) / 86_400_000_000.0).cast("long")
    days = ev.select("user_id", day.alias("day")).distinct()
    fanout = days.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias(
            "target_day"
        ),
        "day",
    ).select(
        "user_id",
        "target_day",
        (F.col("day") == F.col("target_day")).alias("is_today"),
    )
    grid = days.select("day").distinct()
    return (
        fanout.join(
            F.broadcast(grid),
            fanout["target_day"] == grid["day"],
        )
        .groupBy("target_day")
        .agg(
            F.count_distinct(
                F.when(F.col("is_today"), F.col("user_id"))
            ).cast("long").alias("dau"),
            F.count_distinct("user_id").cast("long").alias("wau_7d"),
        )
        .select(F.col("target_day").alias("day"), "dau", "wau_7d")
    )


# --- Z-order layout effectiveness (round 6, late) ----------------------------

#: 10-bit keys: hour-of-epoch and user id, both folded into [0, 1024).
_ZBITS = 10
#: Box predicate: one day of hours x one 16-user band (half-open).
#: The user band starts at 0 so every SF (sf0.001 has users 0-14) selects
#: rows and the two layouts' scan costs are both exercised.
_ZX0, _ZX1, _ZY0, _ZY1 = 288, 312, 0, 16
#: File granularity: natural files hold 128 consecutive event_ids; z-order
#: files are z-prefix blocks of 2^9 cells (32 hours x 16 users).
_NAT_SHIFT, _Z_SHIFT = 7, 9


def _zorder_oracle() -> str:
    from ..operators.zonemap import zorder_key_sql

    zexpr = zorder_key_sql("x", "y", _ZBITS)
    sel = f"x >= {_ZX0} AND x < {_ZX1} AND y >= {_ZY0} AND y < {_ZY1}"
    skip = (
        f"max_x < {_ZX0} OR min_x >= {_ZX1} OR max_y < {_ZY0} OR min_y >= {_ZY1}"
    )
    return f"""
    WITH base AS (
      SELECT event_id,
             ((CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0)
                    AS BIGINT) % 1024) + 1024) % 1024 AS x,
             ((user_id % 1024) + 1024) % 1024 AS y
      FROM events
    ),
    bz AS (SELECT event_id, x, y, {zexpr} AS z FROM base),
    files AS (
      SELECT layout, file_id,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y,
             CAST(sum(CASE WHEN {sel} THEN 1 ELSE 0 END) AS BIGINT) AS n_sel
      FROM (
        SELECT 'natural' AS layout, (event_id >> {_NAT_SHIFT}) AS file_id, x, y
        FROM bz
        UNION ALL
        SELECT 'zorder', (z >> {_Z_SHIFT}), x, y FROM bz
      )
      GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(scan) AS BIGINT) AS files_scanned,
           CAST(sum(scan * n_rows) AS BIGINT) AS rows_scanned,
           CAST(sum(n_sel) AS BIGINT) AS rows_selected,
           CAST(sum(n_rows) AS BIGINT) AS rows_total
    FROM (
      SELECT layout, n_rows, n_sel,
             CASE WHEN COALESCE({skip}, FALSE) THEN 0 ELSE 1 END AS scan
      FROM files
    )
    GROUP BY layout
    """


@register("zorder_layout", _zorder_oracle())
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs natural file layout, measured as a skipping manifest —
    the decision table behind ``OPTIMIZE ZORDER BY`` (Delta/Iceberg).

    Events get two 10-bit cluster keys (hour-of-epoch and user id, both
    folded to [0, 1024)); the Morton interleave
    (``operators/zonemap.py:zorder_key``) is computed per row, and the
    table is "laid out" twice: natural files of 128 consecutive
    event_ids (insertion order — time-correlated, user-oblivious) and
    z-prefix files (``z >> 9``: 32-hour x 16-user blocks). For a
    day x 16-user box predicate the query emits, per layout, the file
    count and how many files/rows a min/max-envelope reader must scan —
    natural layout prunes on time only, z-order prunes both axes
    multiplicatively.

    Scale shape: ONE scan — each row fans out to its (layout, file_id)
    pair inside the scan stage — then one partial-combined aggregate
    keyed (layout, file_id) whose shuffle carries one row per file
    (manifest-sized), and a second aggregate over the file table. No
    window, no join, no sort. A real rewrite would
    ``repartitionByRange(zorder_key)`` and write; this query is the
    planner evidence for paying that sort, and the z-prefix file id is
    exactly what range partitioning on z produces. NULL-enveloped files
    are conservatively scanned (range_scan_flags discipline)."""
    from ..operators.zonemap import zorder_key

    ev = load_table(spark, sf_dir, "events")
    hour = F.floor(F.unix_micros(F.col("ts")) / 3_600_000_000.0).cast("long")
    base = ev.select(
        "event_id",
        F.pmod(hour, F.lit(1024)).alias("x"),
        F.pmod(F.col("user_id"), F.lit(1024)).cast("long").alias("y"),
    ).withColumn("z", zorder_key(F.col("x"), F.col("y"), _ZBITS))
    fan = base.select(
        "x",
        "y",
        F.explode(
            F.array(
                F.struct(
                    F.lit("natural").alias("layout"),
                    F.shiftright(F.col("event_id"), _NAT_SHIFT).alias("file_id"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(F.col("z"), _Z_SHIFT).alias("file_id"),
                ),
            )
        ).alias("f"),
    ).select("f.layout", "f.file_id", "x", "y")
    sel = (
        (F.col("x") >= _ZX0)
        & (F.col("x") < _ZX1)
        & (F.col("y") >= _ZY0)
        & (F.col("y") < _ZY1)
    )
    files = fan.groupBy("layout", "file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.sum(F.when(sel, 1).otherwise(0)).cast("long").alias("n_sel"),
    )
    skippable = (
        (F.col("max_x") < _ZX0)
        | (F.col("min_x") >= _ZX1)
        | (F.col("max_y") < _ZY0)
        | (F.col("min_y") >= _ZY1)
    )
    scan = F.when(F.coalesce(skippable, F.lit(False)), 0).otherwise(1)
    return (
        files.select("layout", "n_rows", "n_sel", scan.alias("scan"))
        .groupBy("layout")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("scan").cast("long").alias("files_scanned"),
            F.sum(F.col("scan") * F.col("n_rows")).cast("long").alias(
                "rows_scanned"
            ),
            F.sum("n_sel").cast("long").alias("rows_selected"),
            F.sum("n_rows").cast("long").alias("rows_total"),
        )
    )


# --- zone-level Bloom skipping (round 6, late) --------------------------------

#: 504-bit zone Bloom filter as 8 x 63-bit integer lanes (bit 63 never
#: used, so the lane longs stay non-negative on every engine), 2 probe
#: positions per key. Ship-DAY zones hold ~24 keys at sf0.01 (~10% fill,
#: sharp skipping) and ~230 at sf0.1 (saturating) — the probe table
#: deliberately spans both regimes so the m~10n sizing rule is measured.
_BLOOM_BITS = 504
_BLOOM_LANE = 63
_BLOOM_LANES = _BLOOM_BITS // _BLOOM_LANE
_BLOOM_K = 2
#: Point-lookup workload: keys present at every SF (partkeys are dense
#: 0..N) plus one absent everywhere (555555, above every SF's key range,
#: so BOTH structures prune it fully — dense key spaces leave no
#: in-range absent value to plant; the Bloom-vs-minmax win shows on the
#: PRESENT keys, where minmax envelopes are useless for point lookups).
_BLOOM_PROBES = (0, 1, 7, 42, 99, 150, 123, 555555)


def _bloom_mix_py(key: int) -> int:
    from .sketch_queries import HLL_A, HLL_A2, HLL_A3, HLL_B

    from ..operators.text_analysis import MOD

    s1 = (key * HLL_A + HLL_B) % MOD
    s2 = ((s1 ^ (s1 >> 15)) * HLL_A2) % MOD
    return ((s2 ^ (s2 >> 13)) * HLL_A3) % MOD


def _bloom_positions(key: int) -> list[tuple[int, int]]:
    """(lane, bit) per probe hash — compile-time constants for literal
    probe keys, the same arithmetic the build side runs per row."""
    out = []
    for i in range(_BLOOM_K):
        pos = _bloom_mix_py(key * _BLOOM_K + i) % _BLOOM_BITS
        out.append((pos // _BLOOM_LANE, pos % _BLOOM_LANE))
    return out


def _bloom_zone_oracle() -> str:
    from .sketch_queries import _hll_mix_sql

    lanes = []
    for lane in range(_BLOOM_LANES):
        probes = []
        for i in range(_BLOOM_K):
            h = _hll_mix_sql(f"(l_partkey * {_BLOOM_K} + {i})")
            pos = f"({h} % {_BLOOM_BITS})"
            probes.append(
                f"CASE WHEN {pos} // {_BLOOM_LANE} = {lane}"
                f" THEN (CAST(1 AS BIGINT) << ({pos} % {_BLOOM_LANE}))"
                f" ELSE 0 END"
            )
        lanes.append(
            f"bit_or({' | '.join(probes)}) AS lane{lane}"
        )
    has_cols = ", ".join(
        f"max(CASE WHEN l_partkey = {k} THEN 1 ELSE 0 END) AS has_{k}"
        for k in _BLOOM_PROBES
    )
    probe_rows = []
    for k in _BLOOM_PROBES:
        (l1, b1), (l2, b2) = _bloom_positions(k)
        probe_rows.append(
            f"SELECT CAST({k} AS BIGINT) AS probe_key,"
            f" ((lane{l1} >> {b1}) & 1) = 1 AND ((lane{l2} >> {b2}) & 1) = 1"
            f" AS bloom_hit,"
            f" min_pk <= {k} AND max_pk >= {k} AS minmax_hit,"
            f" has_{k} = 1 AS truth"
            f" FROM zones"
        )
    probes_sql = "\n      UNION ALL\n      ".join(probe_rows)
    return f"""
    WITH zones AS (
      SELECT CAST(floor(CAST(epoch_us(l_shipdate) AS DOUBLE)
                          / 86400000000.0) AS BIGINT) AS zone,
             min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
             {', '.join(lanes)},
             {has_cols}
      FROM lineitem GROUP BY 1
    ),
    flags AS (
      {probes_sql}
    )
    SELECT probe_key,
           CAST(count(*) AS BIGINT) AS n_zones,
           CAST(sum(CASE WHEN minmax_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS zones_minmax,
           CAST(sum(CASE WHEN minmax_hit AND bloom_hit THEN 1 ELSE 0 END)
                AS BIGINT) AS zones_bloom,
           CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT)
             AS zones_truth,
           bool_and((NOT truth) OR (minmax_hit AND bloom_hit))
             AS never_miss
    FROM flags
    GROUP BY probe_key
    """


@register("bloom_zone_skipping", _bloom_zone_oracle())
def q_bloom_zone_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-level Bloom skipping stats: the point-lookup complement of
    the min/max zone map (`zone_map_pruning`) and the per-file face of
    parquet/Iceberg Bloom filters. Each ship-day zone aggregates a
    504-bit Bloom filter over l_partkey (8 x 63-bit integer lanes folded
    with ``bit_or`` — register-exact, so the oracle pins filter
    CONTENTS, not behavior), plus the min/max envelope and the exact
    per-probe truth. For an 8-key point-lookup workload (7 present, one
    in-range-but-absent) the result compares zones a reader must scan
    under minmax-only vs minmax+Bloom against the true zone count, with
    the no-false-negative contract emitted as an oracle-pinned boolean.
    Probe positions are compile-time constants (the same avalanche
    arithmetic the build side runs per row). The measured table also
    shows the sizing rule: at sf0.01 (~24 keys/zone, 10% fill) the Bloom
    scan is ~25x tighter than minmax; at sf0.1 (~230 keys/zone) the same
    504 bits saturate and the margin narrows to ~2.6x — bits must scale
    with keys-per-zone (m ~ 10n), which in production is a per-file
    parquet knob, not a plan change.

    Scale shape: ONE partial-combined aggregate over the scan builds all
    zone filters (the shuffle carries 4 longs + envelopes per zone —
    manifest-sized); probing is a per-zone projection fanned out x8 and
    a second manifest-sized aggregate. No joins, no windows; at 100 TB
    this is the manifest-build job a table format runs per file."""
    from .sketch_queries import _hll_mix_col

    li = load_table(spark, sf_dir, "lineitem")
    zone = F.floor(
        F.unix_micros(F.col("l_shipdate")) / 86_400_000_000.0
    ).cast("long")
    pre = li.select(
        zone.alias("zone"),
        "l_partkey",
        *[
            F.pmod(
                _hll_mix_col(F.col("l_partkey") * _BLOOM_K + i),
                F.lit(_BLOOM_BITS),
            ).alias(f"pos{i}")
            for i in range(_BLOOM_K)
        ],
    )
    lane_aggs = []
    for lane in range(_BLOOM_LANES):
        # shiftleft by a column needs the SQL form (the PySpark wrapper
        # only takes a literal shift amount)
        terms = " | ".join(
            f"CASE WHEN pos{i} IS NOT NULL AND pos{i} div {_BLOOM_LANE} = {lane}"
            f" THEN shiftleft(CAST(1 AS BIGINT),"
            f" CAST(pos{i} % {_BLOOM_LANE} AS INT))"
            f" ELSE CAST(0 AS BIGINT) END"
            for i in range(_BLOOM_K)
        )
        lane_aggs.append(F.bit_or(F.expr(terms)).alias(f"lane{lane}"))
    has_aggs = [
        F.max(F.when(F.col("l_partkey") == k, 1).otherwise(0)).alias(
            f"has_{k}"
        )
        for k in _BLOOM_PROBES
    ]
    zones = pre.groupBy("zone").agg(
        F.min("l_partkey").alias("min_pk"),
        F.max("l_partkey").alias("max_pk"),
        *lane_aggs,
        *has_aggs,
    )
    probe_structs = []
    for k in _BLOOM_PROBES:
        (l1, b1), (l2, b2) = _bloom_positions(k)
        bloom_hit = (
            F.shiftright(F.col(f"lane{l1}"), b1).bitwiseAND(F.lit(1)) == 1
        ) & (F.shiftright(F.col(f"lane{l2}"), b2).bitwiseAND(F.lit(1)) == 1)
        probe_structs.append(
            F.struct(
                F.lit(k).cast("long").alias("probe_key"),
                bloom_hit.alias("bloom_hit"),
                (
                    (F.col("min_pk") <= k) & (F.col("max_pk") >= k)
                ).alias("minmax_hit"),
                (F.col(f"has_{k}") == 1).alias("truth"),
            )
        )
    flags = zones.select(
        F.explode(F.array(*probe_structs)).alias("p")
    ).select("p.probe_key", "p.bloom_hit", "p.minmax_hit", "p.truth")
    return flags.groupBy("probe_key").agg(
        F.count("*").cast("long").alias("n_zones"),
        F.sum(F.when(F.col("minmax_hit"), 1).otherwise(0))
        .cast("long")
        .alias("zones_minmax"),
        F.sum(F.when(F.col("minmax_hit") & F.col("bloom_hit"), 1).otherwise(0))
        .cast("long")
        .alias("zones_bloom"),
        F.sum(F.when(F.col("truth"), 1).otherwise(0))
        .cast("long")
        .alias("zones_truth"),
        F.min(
            F.when(
                ~F.col("truth") | (F.col("minmax_hit") & F.col("bloom_hit")),
                True,
            ).otherwise(False)
        ).alias("never_miss"),
    )


# --- rendezvous (HRW) sharding manifest (round 7) -----------------------------

_HRW_NODES = 16  # base cluster size; the query also scores node-16 joining

_HRW_NODE_LIST = ", ".join(f"'node-{i:02d}'" for i in range(_HRW_NODES + 1))

_HRW_ORACLE = f"""
WITH nodes AS (SELECT unnest([{_HRW_NODE_LIST}]) AS node),
scored AS (
  SELECT d.doc_id, n.node,
         CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                                       n.node), 1, 15)) AS BIGINT) AS h
  FROM documents d, nodes n
),
owners AS (
  SELECT doc_id,
         arg_max(node, h) FILTER (WHERE node <> 'node-{_HRW_NODES:02d}')
           AS owner_before,
         arg_max(node, h) AS owner_after
  FROM scored GROUP BY doc_id
)
SELECT owner_before, owner_after,
       CAST(count(*) AS BIGINT) AS n_docs
FROM owners GROUP BY owner_before, owner_after
"""


@register("rendezvous_sharding", _HRW_ORACLE)
def q_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding manifest — the
    data-placement layer a 100 TB corpus store needs: each doc's owner is
    the node maximizing a portable 60-bit hash of (doc, node), so
    placement is computed independently per doc (no coordination, no ring
    state) and adding a node moves exactly the docs the new node wins —
    never a doc between two surviving nodes. The query scores the same
    corpus against the 16-node cluster and the 17-node cluster in ONE
    aggregation pass and emits the (owner_before, owner_after) movement
    matrix; the HRW minimal-disruption theorem means every off-diagonal
    row must have owner_after = the joining node, and the expected moved
    fraction is 1/17 — both facts hash-certified by the oracle, not
    asserted.

    Plan shape: a bounded 17-way fan-out (literal node array, exploded —
    never a shuffle), one partial-combined max_by aggregation per doc
    (the filtered max_by computes both cluster views in the same pass),
    and a manifest-sized movement matrix (<= 17x2 rows). Nothing is
    sorted, windowed, or joined; per-doc work is O(nodes). At 1000
    executors this is one map stage + one 17-rows-per-group-free
    aggregation."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    nodes = F.array(
        *[F.lit(f"node-{i:02d}") for i in range(_HRW_NODES + 1)]
    )
    new_node = f"node-{_HRW_NODES:02d}"
    scored = docs.select(
        "doc_id", F.explode(nodes).alias("node")
    ).withColumn(
        "h",
        md5_fold60(
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"), F.col("node")
            )
        ),
    )
    owners = scored.groupBy("doc_id").agg(
        F.expr(
            f"max_by(node, h) FILTER (WHERE node <> '{new_node}')"
        ).alias("owner_before"),
        F.expr("max_by(node, h)").alias("owner_after"),
    )
    return owners.groupBy("owner_before", "owner_after").agg(
        F.count("*").cast("long").alias("n_docs")
    )
