"""Planner-advice view: the planner-evidence family as ONE consumable
table (VERDICT r6 #5).

``zone_map_pruning``, ``zorder_layout``, ``bloom_zone_skipping``,
``shuffle_skew_profile`` and ``join_cardinality_probe`` each emit raw
evidence; a user tuning a 100-TB layout wants the decisions, not five
schemas. ``planner_advice`` composes all five registered kernels into
(advisor, subject, metric, value, recommendation) rows — the Spark side
calls the SAME registered query functions and the oracle wraps the SAME
registered oracle strings as subqueries, so the view can never fork from
the evidence it summarizes.

No new shuffle classes: every row is a manifest-sized aggregate (or a
straight projection) over a kernel that already bounds its own shuffles;
the union is width-1 concatenation of five tiny frames
(tests/test_plan_quality.py asserts no join/cartesian appears).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import REGISTRY, register
from . import profiling_queries, warehouse_queries  # noqa: F401  (fills REGISTRY)

_ZONE_SQL = REGISTRY["zone_map_pruning"][1]
_ZORDER_SQL = REGISTRY["zorder_layout"][1]
_BLOOM_SQL = REGISTRY["bloom_zone_skipping"][1]
_SKEW_SQL = REGISTRY["shuffle_skew_profile"][1]
_CARD_SQL = REGISTRY["join_cardinality_probe"][1]

_ADVICE_ORACLE = f"""
SELECT 'zone_map' AS advisor, 'lineitem.price_c' AS subject,
       'zones_skippable' AS metric, CAST(v AS BIGINT) AS value,
       CASE WHEN v > 0 THEN 'apply_zone_map_pruning'
            ELSE 'full_scan' END AS recommendation
FROM (SELECT sum(CASE WHEN would_scan = 0 THEN 1 ELSE 0 END) AS v
      FROM ({_ZONE_SQL}))
UNION ALL
SELECT 'zorder', 'events(hour,user)', 'files_saved_by_zorder',
       CAST(v AS BIGINT),
       CASE WHEN v > 0 THEN 'rewrite_zorder' ELSE 'keep_natural' END
FROM (SELECT sum(CASE WHEN layout = 'natural' THEN files_scanned
                      ELSE -files_scanned END) AS v
      FROM ({_ZORDER_SQL}))
UNION ALL
SELECT 'bloom', 'lineitem.l_partkey@day_zones', 'zone_reads_saved_by_bloom',
       CAST(v AS BIGINT),
       CASE WHEN ok AND v > 0 THEN 'add_zone_bloom_filters'
            ELSE 'minmax_sufficient' END
FROM (SELECT sum(zones_minmax) - sum(zones_bloom) AS v,
             min(never_miss) AS ok
      FROM ({_BLOOM_SQL}))
UNION ALL
SELECT 'skew', rel, 'rec_salt', CAST(rec_salt AS BIGINT),
       CASE WHEN rec_salt > 1 THEN 'salt_keys' ELSE 'no_salting_needed' END
FROM ({_SKEW_SQL})
UNION ALL
SELECT 'join_card', rel, 'est_error_reduction_ppm',
       CAST(err_uniform_ppm - err_hh_ppm AS BIGINT),
       CASE WHEN err_uniform_ppm - err_hh_ppm > 0
            THEN 'use_end_biased_histogram'
            ELSE 'uniform_stats_sufficient' END
FROM ({_CARD_SQL})
"""

_OUT = ("advisor", "subject", "metric", "value", "recommendation")


@register("planner_advice", _ADVICE_ORACLE)
def q_planner_advice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One (advisor, subject, metric, value, recommendation) row per
    planner decision, composed from the five registered evidence kernels
    (8 rows: 1 zone-map + 1 z-order + 1 bloom + 3 skew + 2 join-card)."""
    zone = REGISTRY["zone_map_pruning"][0](spark, sf_dir)
    zorder = REGISTRY["zorder_layout"][0](spark, sf_dir)
    bloom = REGISTRY["bloom_zone_skipping"][0](spark, sf_dir)
    skew = REGISTRY["shuffle_skew_profile"][0](spark, sf_dir)
    card = REGISTRY["join_cardinality_probe"][0](spark, sf_dir)

    zm = zone.agg(
        F.sum(F.when(F.col("would_scan") == 0, 1).otherwise(0))
        .cast("long")
        .alias("value")
    ).select(
        F.lit("zone_map").alias("advisor"),
        F.lit("lineitem.price_c").alias("subject"),
        F.lit("zones_skippable").alias("metric"),
        "value",
        F.when(F.col("value") > 0, F.lit("apply_zone_map_pruning"))
        .otherwise(F.lit("full_scan"))
        .alias("recommendation"),
    )
    zo = zorder.agg(
        F.sum(
            F.when(
                F.col("layout") == "natural", F.col("files_scanned")
            ).otherwise(-F.col("files_scanned"))
        )
        .cast("long")
        .alias("value")
    ).select(
        F.lit("zorder").alias("advisor"),
        F.lit("events(hour,user)").alias("subject"),
        F.lit("files_saved_by_zorder").alias("metric"),
        "value",
        F.when(F.col("value") > 0, F.lit("rewrite_zorder"))
        .otherwise(F.lit("keep_natural"))
        .alias("recommendation"),
    )
    bl = bloom.agg(
        (F.sum("zones_minmax") - F.sum("zones_bloom")).cast("long").alias("value"),
        F.min("never_miss").alias("ok"),
    ).select(
        F.lit("bloom").alias("advisor"),
        F.lit("lineitem.l_partkey@day_zones").alias("subject"),
        F.lit("zone_reads_saved_by_bloom").alias("metric"),
        "value",
        F.when(F.col("ok") & (F.col("value") > 0), F.lit("add_zone_bloom_filters"))
        .otherwise(F.lit("minmax_sufficient"))
        .alias("recommendation"),
    )
    sk = skew.select(
        F.lit("skew").alias("advisor"),
        F.col("rel").alias("subject"),
        F.lit("rec_salt").alias("metric"),
        F.col("rec_salt").cast("long").alias("value"),
        F.when(F.col("rec_salt") > 1, F.lit("salt_keys"))
        .otherwise(F.lit("no_salting_needed"))
        .alias("recommendation"),
    )
    cd = card.select(
        F.lit("join_card").alias("advisor"),
        F.col("rel").alias("subject"),
        F.lit("est_error_reduction_ppm").alias("metric"),
        (F.col("err_uniform_ppm") - F.col("err_hh_ppm"))
        .cast("long")
        .alias("value"),
        F.when(
            F.col("err_uniform_ppm") - F.col("err_hh_ppm") > 0,
            F.lit("use_end_biased_histogram"),
        )
        .otherwise(F.lit("uniform_stats_sufficient"))
        .alias("recommendation"),
    )
    out = zm.unionByName(zo).unionByName(bl).unionByName(sk).unionByName(cd)
    return out.select(*_OUT)
