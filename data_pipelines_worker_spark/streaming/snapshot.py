"""Streaming CDC snapshot maintenance: the ``foreachBatch`` upsert that
keeps a current-state table in step with an append-only change stream —
the streaming twin of the batch ``latest_snapshot`` query
(queries/warehouse_queries.py).

Merge discipline per micro-batch: reduce the batch to its own latest row
per key (cheap — batch-sized), union with the standing snapshot, keep
rank-1 per key by (ts, event_id), and atomically swap the snapshot
directory (write to ``_next``, rename over ``current``). Replayed batches
are idempotent by construction: merging the same rows twice cannot change
a latest-wins result (the merge is a join-semilattice fold — commutative,
associative, idempotent), which is exactly why this pattern is safe under
foreachBatch's at-least-once delivery.

At 100 TB the swap step is the compaction job of a lakehouse MERGE (Delta
/ Iceberg make the swap transactional); the per-batch plan — batch-local
rank-1, key-hashed merge join against the snapshot, rank-1 again — is the
same.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SNAP_COLS = ("user_id", "last_ts_us", "last_event_type", "last_value_cents")


def _latest_per_key(df: DataFrame) -> DataFrame:
    """Rank-1 per user by (ts, event_id) on an already-projected frame
    (user_id, last_ts_us, last_event_type, last_value_cents, event_id)."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("last_ts_us").desc(), F.col("event_id").desc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _project(events: DataFrame) -> DataFrame:
    return events.select(
        "user_id",
        F.unix_micros("ts").alias("last_ts_us"),
        F.col("event_type").alias("last_event_type"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("last_value_cents"),
        "event_id",
    )


def snapshot_sink(
    events: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    query_name: str = "cdc-snapshot",
):
    """Start a streaming query maintaining the latest-per-user snapshot at
    ``snapshot_dir/current`` from an event stream with columns
    (event_id, ts, user_id, event_type, value)."""
    os.makedirs(snapshot_dir, exist_ok=True)
    current = os.path.join(snapshot_dir, "current")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        incoming = _latest_per_key(_project(batch_df))
        if os.path.exists(current):
            standing = spark.read.parquet(current)
            merged = _latest_per_key(standing.unionByName(incoming))
        else:
            merged = incoming
        nxt = os.path.join(snapshot_dir, f"_next_{batch_id}")
        merged.write.mode("overwrite").parquet(nxt)
        # swap: the snapshot is always a complete directory; a crash
        # between rm and rename is recovered by the batch replay (the
        # merge is idempotent)
        if os.path.exists(current):
            shutil.rmtree(current)
        os.rename(nxt, current)

    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(snapshot_dir, "current")).select(
        *SNAP_COLS
    )
