"""Operational profiling queries: the catalog/monitoring layer of a
large-scale pipeline — column-statistics collection (what ANALYZE TABLE
feeds the cost-based optimizer), time-series anomaly flagging over the
event stream, and deterministic per-group reservoir sampling for eyeball
QA sets.

Portability discipline: the 3σ anomaly test is algebraically cleared of
sqrt (compare squared integer moments), doubles only appear as exact
integer-derived cents, and the sample draw uses the Knuth multiplicative
hash — every output is bit-exact on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.intmath import exact_floordiv
from ..session import load_table
from . import register

# --- single-pass column profiling ------------------------------------------

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

_PROFILE_ORACLE = """
WITH u AS (
  SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS v FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority FROM orders
  UNION ALL
  SELECT 'o_totalprice_cents',
         CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
  FROM orders
)
SELECT col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(v) AS BIGINT) AS n_non_null,
       CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
       min(v) AS min_v,
       max(v) AS max_v
FROM u
GROUP BY col_name
"""


@register("table_profile", _PROFILE_ORACLE)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-TABLE-style column statistics for the orders table in one
    unpivoted pass: row/non-null/exact-distinct counts and min/max per
    column (values stringified so the profile has one uniform schema;
    money via exact cents). This is the stats table a CBO and a data-
    quality monitor both read.

    Scale shape: the stack/unpivot multiplies rows by the column count
    *inside* the scan stage, then one groupBy(col_name) with map-side
    combine — each of the 32 input partitions contributes at most
    |cols| partial rows per distinct value, and the exchange is keyed on
    (col_name, value) only for the distinct count. No per-column job, no
    expand node: profiling N columns costs one pass regardless of N.
    """
    orders = load_table(spark, sf_dir, "orders")
    pairs = []
    for c in _PROFILE_COLS:
        pairs += [F.lit(c), F.col(c).cast("string")]
    pairs += [
        F.lit("o_totalprice_cents"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").cast("string"),
    ]
    n = len(_PROFILE_COLS) + 1
    u = orders.select(
        F.explode(
            F.array(
                *[
                    F.struct(pairs[2 * i].alias("col_name"), pairs[2 * i + 1].alias("v"))
                    for i in range(n)
                ]
            )
        ).alias("s")
    ).select("s.col_name", "s.v")
    return u.groupBy("col_name").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("v").cast("long").alias("n_non_null"),
        F.countDistinct("v").cast("long").alias("n_distinct"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


# --- integer-exact 3-sigma anomaly flags ------------------------------------

_ANOMALY_ORACLE = """
WITH b AS (
  SELECT event_type,
         CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0) AS BIGINT)
           AS bucket_hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events
  GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM b GROUP BY event_type
)
SELECT b.event_type, bucket_hour, c
FROM b JOIN m USING (event_type)
WHERE (c * n_buckets - s) > 0
  AND (c * n_buckets - s) * (c * n_buckets - s)
      > 9 * (n_buckets * s2 - s * s)
"""


@register("events_anomaly", _ANOMALY_ORACLE)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-rate anomaly detection per event type: flag buckets whose
    count exceeds mean + 3σ across that type's hours. The test is run on
    integer moments only — ``c > μ + 3σ`` is squared into
    ``(c·B − S) > 0 ∧ (c·B − S)² > 9·(B·Σc² − S²)`` so no sqrt, no
    floating point, bit-exact anywhere. Int64 safety requires BOTH
    ``(c·B − S)² < 2⁶³`` (|c·B − S| < ~3·10⁹) and ``9·B·Σc² < 2⁶³``
    (Σc² < ~10¹⁸/B — e.g. B = 1000 buckets supports hourly counts up to
    ~3·10⁷ RMS); past that, pre-scale counts (e.g. to thousands) before
    the moment pass — Spark would wrap silently where DuckDB raises, so
    the bound is part of the operator's contract, not just a perf note.

    Scale shape: the bucket aggregation map-side combines to one row per
    (type, hour); the per-type moment table is event-type-sized and
    broadcasts back. Bucketing is integer arithmetic on epoch micros —
    no session-timezone dependence.
    """
    from ..streaming.anomaly import flag_anomalies

    events = load_table(spark, sf_dir, "events")
    b = (
        events.select(
            "event_type",
            F.floor(
                F.unix_micros("ts").cast("double") / F.lit(3600000000.0)
            )
            .cast("long")
            .alias("bucket_hour"),
        )
        .groupBy("event_type", "bucket_hour")
        .agg(F.count("*").cast("long").alias("c"))
    )
    # the flag step is shared verbatim with the streaming face
    # (streaming/anomaly.py) — one home for the integer-moment algebra
    return flag_anomalies(b)


# --- deterministic per-group reservoir sample -------------------------------

_RESERVOIR_ORACLE = """
SELECT source, doc_id, CAST(rn AS BIGINT) AS sample_rank
FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents
)
WHERE rn <= 10
"""


@register("reservoir_sample_k", _RESERVOIR_ORACLE)
def q_reservoir_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k (k=10) uniform-without-replacement sample per source by
    Knuth-hash rank — the deterministic equivalent of per-group reservoir
    sampling (same marginal distribution under a random hash, but
    reproducible run-to-run, which is what a QA/eyeball set needs).

    Scale shape: rank-k selection per group is a partitioned window —
    Spark's WindowGroupLimit pushes the k=10 limit into the sort, so each
    partition keeps a 10-row heap per group rather than sorting the
    group; the exchange carries (source) partitions once.
    """
    docs = load_table(spark, sf_dir, "documents")
    # 31-bit mask BEFORE the Knuth multiply: the product then tops out
    # at (2^31-1)*2654435761 < 2^63, so neither engine overflows int64
    # (unmasked, DuckDB raises out-of-range for keys > ~3.47e9)
    h = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(1 << 31)) * F.lit(2654435761),
        F.lit(1 << 32),
    )
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= 10)
        .select("source", "doc_id", F.col("sample_rank").cast("long"))
    )


# --- data-quality expectation suite -----------------------------------------

_DQ_ORACLE = """
SELECT 'orders_pk_unique' AS check_name,
       CAST(count(*) AS BIGINT) AS n_checked,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'orders_custkey_ref',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
UNION ALL
SELECT 'lineitem_qty_range',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
            AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'documents_text_nonempty',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END)
            AS BIGINT)
FROM documents
UNION ALL
SELECT 'lineitem_orderkey_ref',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
"""


@register("dq_checks", _DQ_ORACLE)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality expectation suite: primary-key
    uniqueness, two referential-integrity checks, a value-range check,
    and a non-empty-text check — one row per expectation with checked and
    violation counts (the report a pipeline gates ingestion on).

    Scale shape: each expectation is a single aggregate — uniqueness is
    count minus distinct-count (two-phase), referential integrity is a
    broadcast-or-shuffle left join counted on the null side, range checks
    are pushable scan expressions. The five legs union into one plan so
    the scheduler interleaves them; none materializes violations, only
    counts (at 100 TB you sample violating rows separately, bounded).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")

    def row(name, n_checked, n_violations):
        return F.struct(
            F.lit(name).alias("check_name"),
            n_checked.cast("long").alias("n_checked"),
            n_violations.cast("long").alias("n_violations"),
        )

    pk = orders.agg(
        row(
            "orders_pk_unique",
            F.count("*"),
            F.count("*") - F.countDistinct("o_orderkey"),
        ).alias("r")
    )
    ref_o = (
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == customer.c_custkey,
            "left",
        )
        .agg(
            row(
                "orders_custkey_ref",
                F.count("*"),
                F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)),
            ).alias("r")
        )
    )
    rng = lineitem.agg(
        row(
            "lineitem_qty_range",
            F.count("*"),
            F.sum(
                F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
                .otherwise(0)
            ),
        ).alias("r")
    )
    txt = docs.agg(
        row(
            "documents_text_nonempty",
            F.count("*"),
            F.sum(
                F.when(
                    F.col("text").isNull() | (F.length("text") == 0), 1
                ).otherwise(0)
            ),
        ).alias("r")
    )
    ref_l = (
        lineitem.select("l_orderkey")
        .join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == orders.o_orderkey,
            "left",
        )
        .agg(
            row(
                "lineitem_orderkey_ref",
                F.count("*"),
                F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)),
            ).alias("r")
        )
    )
    return (
        pk.unionAll(ref_o)
        .unionAll(rng)
        .unionAll(txt)
        .unionAll(ref_l)
        .select("r.check_name", "r.n_checked", "r.n_violations")
    )


# --- two-sample KS drift check (round 6) ---------------------------------------

_KS_ORACLE = """
WITH e AS (
  SELECT event_type, value,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE value IS NOT NULL
),
g AS (
  SELECT event_type, value,
         CAST(sum(is_a) AS BIGINT) AS a,
         CAST(sum(1 - is_a) AS BIGINT) AS b
  FROM e GROUP BY event_type, value
),
c AS (
  SELECT event_type,
         CAST(sum(a) OVER wv AS BIGINT) AS cum_a,
         CAST(sum(b) OVER wv AS BIGINT) AS cum_b,
         CAST(sum(a) OVER wt AS BIGINT) AS n_a,
         CAST(sum(b) OVER wt AS BIGINT) AS n_b
  FROM g
  WINDOW wv AS (PARTITION BY event_type ORDER BY value
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wt AS (PARTITION BY event_type)
)
SELECT event_type, n_a, n_b,
       CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS ks_num,
       CASE WHEN n_a * n_b > 0
            THEN round(max(abs(cum_a * n_b - cum_b * n_a))
                       / CAST(n_a * n_b AS DOUBLE), 6)
       END AS ks
FROM c GROUP BY event_type, n_a, n_b
"""


@register("ks_drift_check", _KS_ORACLE)
def q_ks_drift_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift check per event type: the KS
    statistic ``max_v |ECDF_A(v) − ECDF_B(v)|`` between the even- and
    odd-user populations — the standard "did this segment's value
    distribution shift" gate a data-quality pipeline runs between
    cohorts, releases, or time slices (swap the parity split for the
    cohort of interest). The statistic is computed in *integer* form —
    ``max |cum_a·n_b − cum_b·n_a|`` over the merged value grid, divided
    once at the end — so both engines agree bit-exactly; exactness holds
    while n_a·n_b < 2⁶³ (≈3·10⁹ rows per side); beyond that, run it on
    the deterministic-hash sample (`stratified_sample`) first.

    Scale shape: one (type, value) aggregate collapses the stream to
    the distinct-value grid, then ONE event_type exchange serves the
    value-ordered cumulative window, the per-type totals window, AND
    the final max aggregate — two exchanges total, state O(distinct
    values). Nothing sorts the raw stream; ECDFs are never
    materialized per event."""
    ev = load_table(spark, sf_dir, "events")
    is_a = F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)
    g = (
        # NULL values carry no ECDF position — excluded on both engines
        # (also dodges the Spark-NULLS-FIRST vs DuckDB-NULLS-LAST window
        # order divergence an unfiltered cumsum would hit)
        ev.where(F.col("value").isNotNull())
        .select("event_type", "value", is_a.alias("is_a"))
        .groupBy("event_type", "value")
        .agg(
            F.sum("is_a").cast("long").alias("a"),
            F.sum(1 - F.col("is_a")).cast("long").alias("b"),
        )
    )
    wt = Window.partitionBy("event_type")
    wv = wt.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "event_type",
        F.sum("a").over(wv).cast("long").alias("cum_a"),
        F.sum("b").over(wv).cast("long").alias("cum_b"),
        F.sum("a").over(wt).cast("long").alias("n_a"),
        F.sum("b").over(wt).cast("long").alias("n_b"),
    )
    diff = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    return (
        c.groupBy("event_type", "n_a", "n_b")
        .agg(F.max(diff).cast("long").alias("ks_num"))
        .select(
            "event_type",
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


# --- one-pass Poisson bootstrap (round 6, late) -------------------------------

#: Replicates per group. The fan-out multiplies scan rows by R inside the
#: scan stage; the shuffle carries |event_types| x R partial rows.
_BOOT_R = 16

#: Poisson(1) inverse-CDF thresholds scaled to the avalanche-hash range
#: [0, 2^31-1): P(X<=k) for k = 0..4; weights above the last are 5.
#: Computed once here and embedded as literals in BOTH engines' plans.
_POIS_CUM = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
)


def poisson_weight_sql(seed: str) -> str:
    """DuckDB twin of :func:`poisson_weight_col` — generated from the
    same thresholds so the two can never fork."""
    from .sketch_queries import _hll_mix_sql
    from ..operators.text_analysis import MOD

    t = [int(c * MOD) for c in _POIS_CUM]
    h = _hll_mix_sql(seed)
    return (
        f"CASE WHEN {h} < {t[0]} THEN 0 WHEN {h} < {t[1]} THEN 1 "
        f"WHEN {h} < {t[2]} THEN 2 WHEN {h} < {t[3]} THEN 3 "
        f"WHEN {h} < {t[4]} THEN 4 ELSE 5 END"
    )


def poisson_weight_col(seed):
    """Deterministic Poisson(1) resampling weight of an integer seed
    column — the ONE weight channel shared by the batch ``bootstrap_ci``
    query and the streaming fold (``streaming/bootstrap.py``), so the
    stream ≡ batch bit-guarantee cannot fork."""
    from .sketch_queries import _hll_mix_col
    from ..operators.text_analysis import MOD

    t = [int(c * MOD) for c in _POIS_CUM]
    h = _hll_mix_col(seed)
    return (
        F.when(h < t[0], 0)
        .when(h < t[1], 1)
        .when(h < t[2], 2)
        .when(h < t[3], 3)
        .when(h < t[4], 4)
        .otherwise(5)
        .cast("long")
    )


def _bootstrap_oracle() -> str:
    w = poisson_weight_sql(f"(event_id * {_BOOT_R} + r + 1)")
    return f"""
    WITH src AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL
    ),
    fan AS (
      SELECT event_id, event_type, vc, r, {w} AS w
      FROM src CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_R - 1})) AS r)
    ),
    reps AS (
      SELECT event_type, r,
             CAST(sum(w * vc) AS BIGINT) AS swc,
             CAST(sum(w) AS BIGINT) AS sw,
             CAST(sum(vc) AS BIGINT) AS sc,
             CAST(count(*) AS BIGINT) AS n
      FROM fan GROUP BY event_type, r
    ),
    means AS (
      SELECT event_type, r, sc, n,
             (swc - ((swc % sw) + sw) % sw) // sw AS mean_c
      FROM reps WHERE sw > 0
    ),
    ranked AS (
      SELECT event_type, mean_c, sc, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY mean_c, r) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_boot
      FROM means
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max((sc - ((sc % n) + n) % n) // n) AS BIGINT)
             AS point_mean_c,
           CAST(max(n_boot) AS BIGINT) AS n_boot,
           CAST(max(CASE WHEN rn = greatest(1, (n_boot * 2) // {_BOOT_R})
                         THEN mean_c END) AS BIGINT) AS boot_lo_c,
           CAST(max(CASE WHEN rn = n_boot + 1
                              - greatest(1, (n_boot * 2) // {_BOOT_R})
                         THEN mean_c END) AS BIGINT) AS boot_hi_c
    FROM ranked
    GROUP BY event_type
    """


@register("bootstrap_ci", _bootstrap_oracle())
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Poisson bootstrap: a ~87% confidence interval for the
    per-event-type mean value, from 16 resampling replicates computed in
    a SINGLE scan of the data.

    The classic bootstrap draws n rows with replacement per replicate —
    at 100 TB that is 16 extra passes. The streaming form (Oza & Russell
    2001; Kleiner et al. "poor man's bootstrap") observes that each
    row's multiplicity in one replicate is Poisson(1), independent per
    (row, replicate) — so each row can emit its 16 weights as it streams
    by. Weights come from the engine-portable avalanche hash of
    (event_id, replicate) inverted through the Poisson(1) CDF (integer
    thresholds above); replicate means are exact integer cents via the
    remainder-subtraction floor division (exact under every engine's
    division semantics because the adjusted dividend is an exact
    multiple). The CI is the (2nd, 15th) order statistic of the 16
    replicate means — rank-picked deterministically, tie-broken by
    replicate id; replicates that drew an empty resample (possible for
    tiny groups) are excluded, with ranks rescaled by the formula in
    the plan and the surviving count reported as ``n_boot``.

    Scale shape: explode x16 inside the scan stage, ONE partial-combined
    aggregate keyed (event_type, r) — the shuffle carries 16 rows per
    type — then a window over those 16-row groups. No second scan, no
    join, no driver loop.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    src = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
    )
    fan = src.select(
        "event_id",
        "event_type",
        "vc",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r"),
    )
    w = poisson_weight_col(F.col("event_id") * _BOOT_R + F.col("r") + 1)
    reps = fan.withColumn("w", w).groupBy("event_type", "r").agg(
        F.sum(F.col("w") * F.col("vc")).cast("long").alias("swc"),
        F.sum("w").cast("long").alias("sw"),
        F.sum("vc").cast("long").alias("sc"),
        F.count("*").cast("long").alias("n"),
    )

    means = reps.where(F.col("sw") > 0).select(
        "event_type",
        "r",
        "sc",
        "n",
        exact_floordiv(F.col("swc"), F.col("sw")).alias("mean_c"),
    )
    win = Window.partitionBy("event_type")
    ranked = means.select(
        "event_type",
        "mean_c",
        "sc",
        "n",
        F.row_number().over(win.orderBy("mean_c", "r")).alias("rn"),
        F.count("*").over(win).alias("n_boot"),
    )
    k_lo = F.greatest(
        F.lit(1).cast("long"),
        exact_floordiv(F.col("n_boot") * 2, F.lit(_BOOT_R)),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max(exact_floordiv(F.col("sc"), F.col("n"))).cast("long").alias(
            "point_mean_c"
        ),
        F.max("n_boot").cast("long").alias("n_boot"),
        F.max(F.when(F.col("rn") == k_lo, F.col("mean_c"))).cast("long").alias(
            "boot_lo_c"
        ),
        F.max(
            F.when(F.col("rn") == F.col("n_boot") + 1 - k_lo, F.col("mean_c"))
        ).cast("long").alias("boot_hi_c"),
    )


# --- shuffle-skew advisor (round 6, late) -------------------------------------

#: Salt recommendation targets the hottest key at <= 4x the mean
#: per-reducer load.
_SKEW_TARGET = 4

_SKEW_COLS = (
    ("events", "user_id"),
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
)


def _skew_oracle() -> str:
    parts = []
    for table, col in _SKEW_COLS:
        parts.append(f"""
    SELECT '{table}.{col}' AS rel,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS max_count,
           CAST(min(CASE WHEN cnt = (SELECT max(cnt)
                                     FROM (SELECT count(*) AS cnt
                                           FROM {table}
                                           WHERE {col} IS NOT NULL
                                           GROUP BY {col}))
                         THEN k END) AS BIGINT) AS hot_key,
           CAST((max(cnt) * 1000000) // sum(cnt) AS BIGINT)
             AS top1_share_ppm,
           CAST((max(cnt) * 100 * count(*)) // sum(cnt) AS BIGINT)
             AS skew_x100,
           CAST(greatest(1, (max(cnt) * count(*) + {_SKEW_TARGET} * sum(cnt) - 1)
                            // ({_SKEW_TARGET} * sum(cnt))) AS BIGINT)
             AS rec_salt
    FROM (SELECT {col} AS k, CAST(count(*) AS BIGINT) AS cnt
          FROM {table} WHERE {col} IS NOT NULL GROUP BY {col})""")
    return "\n    UNION ALL\n    ".join(parts)


@register("shuffle_skew_profile", _skew_oracle())
def q_shuffle_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight shuffle-skew advisor: for each candidate join/aggregate
    key, the exact key-frequency profile a planner needs BEFORE running a
    100-TB shuffle — row/key counts, the hottest key and its count, its
    traffic share (ppm), the max/mean skew ratio (x100), and a
    recommended salt factor that caps the hottest key at {t}x the mean
    per-reducer load. This is the measurement side of
    `skew_salted_join` (which demonstrates the fix) and of AQE's runtime
    skew split (which this table predicts ahead of time). The hottest
    key is picked overflow-free: max(count) first, then min(key) among
    rows at that count — deterministic highest-count-then-smallest-key
    on both engines at any count magnitude (a count·BIG − key composite
    would overflow int64 on precisely the pathological keys the advisor
    exists to flag).

    Scale shape: per profiled column, ONE two-phase aggregate (map-side
    combine on the key, then a second all-reduce over the per-key
    counts) — the same cost as the groupBy it is de-risking; the three
    profiles run as a union of independent aggregates. No window, no
    join, no driver collect.
    """
    out = None
    for table, col in _SKEW_COLS:
        t = load_table(spark, sf_dir, table)
        counts = (
            t.where(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("k"))
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        # overflow-free deterministic argmax: a second tiny pass over the
        # count table picks min(key) among rows at the max count — exact
        # at ANY count magnitude, unlike a cnt·BIG − key composite, which
        # overflows int64 once a key's count passes BIG-relative bounds
        # (the advisor must survive exactly the hot keys it diagnoses)
        counts = counts.localCheckpoint()
        mx = counts.agg(F.max("cnt").cast("long").alias("max_count"))
        hot = (
            counts.join(
                F.broadcast(mx), F.col("cnt") == F.col("max_count")
            ).agg(F.min("k").cast("long").alias("hot_key"))
        )
        prof = counts.agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.max("cnt").cast("long").alias("max_count"),
        ).crossJoin(F.broadcast(hot)).select(
            F.lit(f"{table}.{col}").alias("rel"),
            "n_rows",
            "n_keys",
            "max_count",
            "hot_key",
            exact_floordiv(F.col("max_count") * 1_000_000, F.col("n_rows")).alias(
                "top1_share_ppm"
            ),
            exact_floordiv(
                F.col("max_count") * 100 * F.col("n_keys"), F.col("n_rows")
            ).alias("skew_x100"),
            F.greatest(
                F.lit(1).cast("long"),
                exact_floordiv(
                    F.col("max_count") * F.col("n_keys")
                    + _SKEW_TARGET * F.col("n_rows")
                    - 1,
                    _SKEW_TARGET * F.col("n_rows"),
                ),
            ).alias("rec_salt"),
        )
        out = prof if out is None else out.unionByName(prof)
    return out


q_shuffle_skew_profile.__doc__ = q_shuffle_skew_profile.__doc__.format(
    t=_SKEW_TARGET
)


# --- join cardinality estimation probe (round 6, late) ------------------------

#: Heavy hitters kept exact in the refined estimator; everything whose
#: key is in NEITHER side's top set is modeled uniform. The partition is
#: by the UNION of both sides' top keys so exact and uniform masses
#: never overlap (an OR-side split double-counts when one side's top
#: keys sit in the other's remainder — measured 30% error on sf0.001).
_CARD_HH = 8

_CARD_JOINS = (
    ("events", "user_id", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
)


def _card_oracle() -> str:
    parts = []
    for ta_, ka, tb, kb in _CARD_JOINS:
        parts.append(f"""
    SELECT '{ta_}.{ka} x {tb}.{kb}' AS rel,
           n_a, n_b, ndv_a, ndv_b, exact_card,
           est_uniform,
           CAST(abs(est_uniform - exact_card) * 1000000
                // greatest(exact_card, 1) AS BIGINT) AS err_uniform_ppm,
           est_hh,
           CAST(abs(est_hh - exact_card) * 1000000
                // greatest(exact_card, 1) AS BIGINT) AS err_hh_ppm
    FROM (
      WITH ca AS (SELECT {ka} AS k, CAST(count(*) AS BIGINT) AS c,
                         row_number() OVER (ORDER BY count(*) DESC, {ka}) AS rk
                  FROM {ta_} WHERE {ka} IS NOT NULL GROUP BY {ka}),
      cb AS (SELECT {kb} AS k, CAST(count(*) AS BIGINT) AS c,
                    row_number() OVER (ORDER BY count(*) DESC, {kb}) AS rk
             FROM {tb} WHERE {kb} IS NOT NULL GROUP BY {kb}),
      hk AS (SELECT k FROM ca WHERE rk <= {_CARD_HH}
             UNION SELECT k FROM cb WHERE rk <= {_CARD_HH}),
      tot AS (
        SELECT (SELECT CAST(sum(c) AS BIGINT) FROM ca) AS n_a,
               (SELECT CAST(count(*) AS BIGINT) FROM ca) AS ndv_a,
               (SELECT CAST(sum(c) AS BIGINT) FROM cb) AS n_b,
               (SELECT CAST(count(*) AS BIGINT) FROM cb) AS ndv_b,
               (SELECT CAST(coalesce(sum(ca.c * cb.c), 0) AS BIGINT)
                FROM ca JOIN cb USING (k)) AS exact_card,
               (SELECT CAST(coalesce(sum(ca.c * cb.c), 0) AS BIGINT)
                FROM ca JOIN cb USING (k)
                WHERE k IN (SELECT k FROM hk)) AS hh_card,
               (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM ca
                WHERE k IN (SELECT k FROM hk)) AS hh_n_a,
               (SELECT CAST(count(*) AS BIGINT) FROM ca
                WHERE k IN (SELECT k FROM hk)) AS hh_ndv_a,
               (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM cb
                WHERE k IN (SELECT k FROM hk)) AS hh_n_b,
               (SELECT CAST(count(*) AS BIGINT) FROM cb
                WHERE k IN (SELECT k FROM hk)) AS hh_ndv_b
      )
      SELECT n_a, n_b, ndv_a, ndv_b, exact_card,
             CAST((n_a * n_b) // greatest(ndv_a, ndv_b) AS BIGINT)
               AS est_uniform,
             CAST(hh_card
                  + ((n_a - hh_n_a) * (n_b - hh_n_b))
                    // greatest(ndv_a - hh_ndv_a, ndv_b - hh_ndv_b, 1)
                  AS BIGINT) AS est_hh
      FROM tot
    )""")
    return "\n    UNION ALL\n    ".join(parts)


@register("join_cardinality_probe", _card_oracle())
def q_join_cardinality_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation the way a cost-based optimizer does it,
    measured against ground truth — the third leg of the planner-
    evidence family (`shuffle_skew_profile` measures skew,
    `zone_map_pruning`/`bloom_zone_skipping` measure skipping; this
    measures the |A ⋈ B| estimate that decides join ORDER). Per join
    pair: the uniformity estimate |A|·|B| / max(ndv_A, ndv_B) (what an
    engine uses with plain column stats) and the end-biased-histogram
    refinement — the union of both sides' top-{hh} keys kept exact,
    rows outside that key set modeled uniform over the remaining ndv
    (Ioannidis-style; partitioning by the key-set union keeps the exact
    and uniform masses disjoint) — each with its error vs the exact
    Σ c_A(k)·c_B(k) in ppm. The emitted table is the case for
    collecting histogram stats before planning a 100-TB join tree.

    Scale shape: per side ONE two-phase count aggregate (the same
    profile `shuffle_skew_profile` builds); the exact term joins the two
    COUNT TABLES (ndv-sized, not data-sized); per-side heavy hitters are
    ORDER BY ... LIMIT — TakeOrderedAndProject, never a global window
    over the count table — and the union key set is a broadcast
    semi-join predicate. No scan of either table is repeated and the
    fact tables themselves are never joined. (The exact ground-truth
    term is the audit half — a production CBO samples it; the estimates
    are the product.)
    """
    out = None
    for ta_, ka, tb, kb in _CARD_JOINS:
        a = load_table(spark, sf_dir, ta_)
        b = load_table(spark, sf_dir, tb)

        def side(t: DataFrame, key: str) -> DataFrame:
            return (
                t.where(F.col(key).isNotNull())
                .groupBy(F.col(key).alias("k"))
                .agg(F.count("*").cast("long").alias("c"))
            )

        # localCheckpoint (the q_shuffle_skew_profile discipline): each
        # count table feeds the top-k pick, the exact join (twice), and
        # both mass aggregates — without the cut the fact-table scan +
        # count aggregate re-ran once per consumer (r12 recompute audit:
        # 56 parquet scans in the before plan); the frames are ndv-sized
        ca, cb = side(a, ka).localCheckpoint(), side(b, kb).localCheckpoint()
        top_a = ca.orderBy(F.col("c").desc(), "k").limit(_CARD_HH)
        top_b = cb.orderBy(F.col("c").desc(), "k").limit(_CARD_HH)
        hh_keys = top_a.select("k").unionByName(top_b.select("k")).distinct()
        joined = ca.alias("ca").join(cb.alias("cb"), "k")
        exact = joined.agg(
            F.coalesce(F.sum(F.col("ca.c") * F.col("cb.c")), F.lit(0))
            .cast("long")
            .alias("exact_card")
        )
        hh = joined.join(F.broadcast(hh_keys), "k", "left_semi").agg(
            F.coalesce(F.sum(F.col("ca.c") * F.col("cb.c")), F.lit(0))
            .cast("long")
            .alias("hh_card")
        )

        def masses(counts: DataFrame, suffix: str) -> DataFrame:
            tot = counts.agg(
                F.sum("c").cast("long").alias(f"n_{suffix}"),
                F.count("*").cast("long").alias(f"ndv_{suffix}"),
            )
            hh_mass = counts.join(F.broadcast(hh_keys), "k", "left_semi").agg(
                F.coalesce(F.sum("c"), F.lit(0))
                .cast("long")
                .alias(f"hh_n_{suffix}"),
                F.count("*").cast("long").alias(f"hh_ndv_{suffix}"),
            )
            return tot.crossJoin(F.broadcast(hh_mass))

        tot = (
            masses(ca, "a")
            .crossJoin(F.broadcast(masses(cb, "b")))
            .crossJoin(F.broadcast(exact))
            .crossJoin(F.broadcast(hh))
        )
        est_uniform = exact_floordiv(
            F.col("n_a") * F.col("n_b"),
            F.greatest(F.col("ndv_a"), F.col("ndv_b")),
        )
        est_hh = F.col("hh_card") + exact_floordiv(
            (F.col("n_a") - F.col("hh_n_a"))
            * (F.col("n_b") - F.col("hh_n_b")),
            F.greatest(
                F.col("ndv_a") - F.col("hh_ndv_a"),
                F.col("ndv_b") - F.col("hh_ndv_b"),
                F.lit(1).cast("long"),
            ),
        )
        prof = tot.select(
            F.lit(f"{ta_}.{ka} x {tb}.{kb}").alias("rel"),
            "n_a",
            "n_b",
            "ndv_a",
            "ndv_b",
            "exact_card",
            est_uniform.alias("est_uniform"),
            exact_floordiv(
                F.abs(est_uniform - F.col("exact_card")) * 1_000_000,
                F.greatest(F.col("exact_card"), F.lit(1).cast("long")),
            ).alias("err_uniform_ppm"),
            est_hh.cast("long").alias("est_hh"),
            exact_floordiv(
                F.abs(est_hh - F.col("exact_card")) * 1_000_000,
                F.greatest(F.col("exact_card"), F.lit(1).cast("long")),
            ).alias("err_hh_ppm"),
        )
        out = prof if out is None else out.unionByName(prof)
    return out


q_join_cardinality_probe.__doc__ = q_join_cardinality_probe.__doc__.format(
    hh=_CARD_HH
)


# --- Theil–Sen robust trend (round 6, late) -----------------------------------

#: Deterministic per-user event cap before pair enumeration: pair work is
#: bounded at C(cap, 2) = 496 rows per user regardless of user activity
#: (the standard subsampled Theil–Sen; the estimator stays consistent).
_TS_CAP = 32


_THEILSEN_ORACLE = f"""
WITH src AS (
  SELECT user_id, event_id,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY ((event_id % 2147483648) * 2654435761) % 4294967296, event_id) AS rk
  FROM events WHERE value IS NOT NULL
),
s AS (SELECT * FROM src WHERE rk <= {_TS_CAP}),
pairs AS (
  SELECT a.user_id,
         (b.vc - a.vc) / CAST(b.ts_us - a.ts_us AS DOUBLE) AS slope,
         a.event_id AS e1, b.event_id AS e2
  FROM s a JOIN s b
    ON a.user_id = b.user_id AND a.event_id < b.event_id
   AND a.ts_us <> b.ts_us
),
ranked AS (
  SELECT user_id, slope,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY slope, e1, e2) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_pairs
  FROM pairs
)
SELECT user_id,
       CAST(max(n_pairs) AS BIGINT) AS n_pairs,
       CAST(max(CASE WHEN rn = (n_pairs + 1) // 2
                     THEN floor(slope * 34359738368) END) AS BIGINT)
         AS theilsen_slope_bits
FROM ranked
GROUP BY user_id
"""


@register("theilsen_slope", _THEILSEN_ORACLE)
def q_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per user: the median of pairwise slopes
    (Δvalue/Δt over all event pairs) — the 29%-breakdown-point
    alternative to `group_linreg`'s least squares, which a single
    corrupt point can drag arbitrarily. Each slope is ONE IEEE division
    of two exact integers (cents over epoch-micros: correctly rounded,
    bit-identical on both engines); the median is the rank-picked lower
    median under a fully deterministic order (slope, pair ids), and the
    result travels as 2^35-scaled bits (the probe-family quantization).

    Scale shape: a deterministic Knuth-hash cap keeps ≤ {cap} events
    per user BEFORE pair enumeration (WindowGroupLimit prunes the rank
    filter map-side), so the self-join emits ≤ C({cap},2) = 496 rows
    per user — pair work is corpus-linear in users, never quadratic in
    events. One user-keyed exchange serves the cap window, the pair
    join, and the median window. Same-timestamp pairs are excluded
    (slope undefined); users with < 2 distinct-time samples drop out on
    both engines."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # 31-bit mask first — wrap-free in int64 on BOTH engines (see
    # reservoir_sample_k); unmasked DuckDB errors past event_id ~3.47e9
    knuth = F.pmod(
        F.pmod(F.col("event_id"), F.lit(1 << 31)) * F.lit(2654435761),
        F.lit(1 << 32),
    )
    w = Window.partitionBy("user_id").orderBy(knuth, "event_id")
    s = (
        ev.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TS_CAP)
        .drop("rk")
    )
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (F.col("a.ts_us") != F.col("b.ts_us")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        (
            (F.col("b.vc") - F.col("a.vc"))
            / (F.col("b.ts_us") - F.col("a.ts_us")).cast("double")
        ).alias("slope"),
        F.col("a.event_id").alias("e1"),
        F.col("b.event_id").alias("e2"),
    )
    wu = Window.partitionBy("user_id")
    ranked = pairs.select(
        "user_id",
        "slope",
        F.row_number().over(wu.orderBy("slope", "e1", "e2")).alias("rn"),
        F.count("*").over(wu).alias("n_pairs"),
    )
    from ..functions.intmath import exact_floordiv

    k = exact_floordiv(F.col("n_pairs") + 1, F.lit(2))
    return ranked.groupBy("user_id").agg(
        F.max("n_pairs").cast("long").alias("n_pairs"),
        F.max(
            F.when(
                F.col("rn") == k,
                F.floor(F.col("slope") * F.lit(34359738368.0)),
            )
        )
        .cast("long")
        .alias("theilsen_slope_bits"),
    )


q_theilsen_slope.__doc__ = q_theilsen_slope.__doc__.format(cap=_TS_CAP)


# --- exact distributed percentile selection (round 7) -------------------------

_PCTS = (50, 90, 99)
_PCT_BUCKET = 1 << 16

_EXACT_PCT_ORACLE = f"""
WITH t AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
  FROM lineitem
),
n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM t),
p AS (SELECT * FROM (VALUES {", ".join(f"({p})" for p in _PCTS)}) AS p(pct)),
k AS (
  SELECT CAST(pct AS BIGINT) AS pct,
         (pct * (SELECT c FROM n) + 99) // 100 AS k
  FROM p
),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM t)
SELECT pct, CAST(k.k AS BIGINT) AS k, CAST(min(v) AS BIGINT) AS value
FROM k JOIN r ON r.rn >= k.k
GROUP BY pct, k.k
"""


@register("exact_percentiles", _EXACT_PCT_ORACLE)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order statistics (p50/p90/p99 of price cents) WITHOUT a
    global sort — the two-phase selection algorithm a 100-TB engine
    needs when the contract says exact, not GK/KLL-approximate (the
    `approx_quantile_binned` counterpart with error = 0):

    Phase 1: one partial-combined histogram over 65536-wide value
    buckets (manifest-sized: value range / 2^16 rows) locates, per
    target rank k, the bucket containing the k-th value and the exact
    number of values below it.

    Phase 2: one more pass touches ONLY rows in located buckets (a
    broadcast semi-join on the bucket id), builds the value-level
    histogram inside each (≤ 65536 distinct values — still
    manifest-sized), and rank-walks to the exact value.

    Both phases are aggregates + tiny windows over manifest-sized
    frames; rows are never globally sorted and nothing corpus-sized is
    collected or broadcast. The oracle is the brute-force rank
    definition (row_number over the sorted column), so the hash gate
    certifies exactness, ties included.
    """
    from ..session import local_df

    li = load_table(spark, sf_dir, "lineitem")
    v = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    t = li.select(v.alias("v"), exact_floordiv(v, _PCT_BUCKET).alias("b"))

    targets = local_df(spark, [(p,) for p in _PCTS], "pct long")
    # r12 note: deriving n from the bucket histogram (persist + sum)
    # was tried and reverted — the count(*) below is answered from
    # parquet metadata (the optimizer prunes the projection), so the
    # "extra corpus pass" it was meant to save is near-free at any
    # scale, while the histogram-derived variant serialized the query
    # behind a cache-build barrier (A/B: 1.75/1.66 s vs 1.48/1.51 s)
    n = t.agg(F.count("*").cast("long").alias("c"))
    ks = targets.crossJoin(F.broadcast(n)).select(
        "pct",
        exact_floordiv(F.col("pct") * F.col("c") + 99, 100).alias("k"),
    )
    hist = t.groupBy("b").agg(F.count("*").cast("long").alias("cnt"))
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    hist_cum = hist.select(
        "b", "cnt", F.sum("cnt").over(wcum).cast("long").alias("cum")
    )  # manifest-sized frame: one row per 2^16-wide occupied bucket
    located = (
        hist_cum.crossJoin(F.broadcast(ks))
        .where(F.col("cum") >= F.col("k"))
        .groupBy("pct", "k")
        .agg(F.min("b").cast("long").alias("b"))
        .join(hist_cum, "b")
        .select(
            "pct", "k", "b", (F.col("cum") - F.col("cnt")).alias("below")
        )
    )

    inb = t.join(
        F.broadcast(located.select("b").distinct()), "b", "left_semi"
    )
    vals = inb.groupBy("b", "v").agg(F.count("*").cast("long").alias("vc"))
    wv = Window.partitionBy("b").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    vals_cum = vals.select(
        "b", "v", F.sum("vc").over(wv).cast("long").alias("vcum")
    )
    return (
        vals_cum.join(F.broadcast(located), "b")
        .where(F.col("below") + F.col("vcum") >= F.col("k"))
        .groupBy("pct", "k")
        .agg(F.min("v").cast("long").alias("value"))
        .select("pct", "k", "value")
    )
