"""Zone-map (min/max skipping) statistics — the manifest-pruning face of
a lakehouse table.

Parquet keeps min/max per row group and table formats (Iceberg/Delta)
lift them into manifests so a query planner can skip whole files without
opening them. The engine already *consumes* that machinery
(``index_targeting`` machine-asserts row-group pruning through the
reader); this module is the *producer* side: compute the zone → (count,
min, max) table for chosen columns under a chosen zoning expression, and
evaluate what fraction of zones (and rows) a range predicate would let
the scanner skip.

Plan shape at 100 TB: the stats pass is ONE partial-combined aggregate
over the scan (min/max/count fold map-side; the shuffle carries one row
per zone per column-set — manifest-sized, not data-sized), and pruning
evaluation is a literal predicate on that tiny table. The zoning
expression stands in for the physical file/row-group boundary, which
Spark does not expose declaratively; on a real lakehouse table the same
aggregate runs per file via its metadata columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zone_maps(
    df: DataFrame, zone: Column, stat_cols: dict[str, Column]
) -> DataFrame:
    """Per-zone skipping stats: ``(zone, n_rows, min_<name>, max_<name>…)``.

    ``stat_cols`` maps output-name → column expression; each contributes a
    ``min_<name>`` and ``max_<name>`` pair. One aggregate, map-side
    combined; output is manifest-sized (one row per zone)."""
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for name, col in stat_cols.items():
        aggs.append(F.min(col).alias(f"min_{name}"))
        aggs.append(F.max(col).alias(f"max_{name}"))
    return df.groupBy(zone.alias("zone")).agg(*aggs)


def range_scan_flags(maps: DataFrame, name: str, lo, hi) -> DataFrame:
    """Mark each zone with whether a scan for ``lo <= <name> < hi`` must
    read it: a zone is skippable iff its [min, max] envelope cannot
    overlap the half-open predicate interval — exactly the decision a
    parquet reader makes per row group from footer stats. NULL-only
    zones (min/max NULL) are conservatively scanned, matching readers
    that cannot prove absence."""
    mn, mx = F.col(f"min_{name}"), F.col(f"max_{name}")
    skippable = (mx < F.lit(lo)) | (mn >= F.lit(hi))
    return maps.withColumn(
        "would_scan",
        F.when(skippable, F.lit(0)).otherwise(F.lit(1)).cast("int"),
    )


def zorder_key(x: Column, y: Column, bits: int) -> Column:
    """Morton/Z-order interleave of two non-negative ``bits``-wide integer
    keys: bit i of ``x`` lands at position 2i, bit i of ``y`` at 2i+1.

    This is the clustering key behind multi-dimensional file layout
    (Delta/Iceberg ``OPTIMIZE ZORDER BY``): sorting by the interleaved key
    makes file min/max envelopes tight in BOTH dimensions at once, so a
    box predicate prunes multiplicatively instead of on one axis only.
    Pure shift/mask/add integer arithmetic — exact on any engine; the
    terms occupy disjoint bit positions, so ``+`` is exactly ``|``."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_key_sql(x: str, y: str, bits: int) -> str:
    """The DuckDB twin of :func:`zorder_key`, generated from the same loop
    so the two expressions can never drift."""
    terms = [f"((({x} >> {i}) & 1) << {2 * i})" for i in range(bits)]
    terms += [f"((({y} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    return "(" + " + ".join(terms) + ")"
