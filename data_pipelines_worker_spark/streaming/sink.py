"""Streaming → stage-store sink: land a stream's output in the same
per-stage Parquet substrate batch pipelines checkpoint/resume from
(sources/stage_store.py), so streaming ingestion and batch recompute share
one durability story — the reference persists every block output to its
storage layer regardless of how the work arrived
(pipeline_block_data_registry.go:291-334).

Exactly-once discipline: ``foreachBatch`` gives at-least-once delivery of
each micro-batch with a stable ``batch_id`` on replay; writing every batch
to its own ``batch=<id>`` subdirectory with ``overwrite`` makes the replay
idempotent — a re-delivered batch replaces its own directory instead of
appending duplicates. ``read_stage`` reads the stage root recursively, so
downstream consumers see one logical dataset.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..sources.stage_store import stage_path


def stage_store_sink(
    df: DataFrame,
    root: str,
    pipeline_slug: str,
    processing_id: str,
    block_slug: str,
    checkpoint_dir: str,
    query_name: str = "stage-sink",
):
    """Return a started streaming query writing ``df`` into the stage
    store. Each micro-batch lands idempotently under ``batch=<id>``."""
    base = stage_path(root, pipeline_slug, processing_id, block_slug)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(base, f"batch={batch_id}")
        )

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
