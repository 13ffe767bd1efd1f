"""Processing status/log persistence — the observable record of every run.

Reference: each pipeline execution defers ``SavePipelineLog``, writing
``log_%d`` + ``status_%d`` files per processing next to the stage outputs
(pipeline.go:207-214; registry pipeline_block_data_registry.go:222-288).
The read-only API endpoints later *scan storage* to answer
``GET /pipelines/:slug/processings`` (pipeline.go:643-802).

Here: one Parquet dataset per (pipeline, processing) under
``<root>/_meta/status/…`` with a row per block — append-only metadata
beside the stage lake, so the listing endpoints are a partition-pruned
scan, not a storage walk. At 100 TB the metadata stays tiny (rows =
processings × blocks) and supports the same queries the reference answers
by listing files.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

STATUS_SCHEMA = (
    "pipeline_slug string, processing_id string, block_slug string, "
    "position int, status string, stopped_at string, updated_at double"
)


def _status_path(root: str, pipeline_slug: str, processing_id: str | None = None) -> str:
    p = os.path.join(root, "_meta", "status", pipeline_slug)
    return os.path.join(p, processing_id) if processing_id else p


def write_status(
    spark: SparkSession,
    root: str,
    pipeline_slug: str,
    processing_id: str,
    statuses: dict[str, str],
    block_order: list[str],
    stopped_at: str | None = None,
) -> str:
    """Persist the per-block status snapshot of one processing
    (SavePipelineLog equivalent; overwrite = latest snapshot wins, like the
    reference rewriting status_%d on each save)."""
    now = time.time()
    rows = [
        (
            pipeline_slug,
            processing_id,
            slug,
            block_order.index(slug) if slug in block_order else -1,
            status,
            stopped_at,
            now,
        )
        for slug, status in statuses.items()
    ]
    from ..session import local_df

    path = _status_path(root, pipeline_slug, processing_id)
    # LocalRelation (Arrow) rather than a parallelized list: a Python-RDD
    # frame pays one Python-worker round-trip per partition under the
    # coalesce(1), ~5 s for 3 rows; the local frame writes in ~0.2 s.
    local_df(spark, rows, STATUS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def read_statuses(
    spark: SparkSession, root: str, pipeline_slug: str, processing_id: str | None = None
) -> DataFrame:
    """All block statuses for one pipeline (or one processing).

    The pipeline-level listing spans the per-processing subdirectories
    (``<pipeline>/<processing_id>/part-*.parquet``), so it needs a
    recursive lookup — the `GET /pipelines/:slug/processings` analog of the
    reference's storage walk (pipeline.go:643-700), served by a pruned
    parquet scan instead."""
    reader = spark.read
    if processing_id is None:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.parquet(_status_path(root, pipeline_slug, processing_id))


def list_processings(root: str, pipeline_slug: str) -> list[str]:
    """Processing ids with a persisted status (storage-scan parity,
    pipeline.go:643-700)."""
    p = _status_path(root, pipeline_slug)
    if not os.path.isdir(p):
        return []
    return sorted(d for d in os.listdir(p) if not d.startswith("_"))
