"""Streaming CDC snapshot maintenance: the ``foreachBatch`` upsert that
keeps a current-state table in step with an append-only change stream —
the streaming twin of the batch ``latest_snapshot`` query. Both sides
call the same projection/rank-1 kernel (operators/cdc.py) so the
quantization and tie-break can never fork.

Merge discipline per micro-batch: reduce the batch to its own latest row
per key (cheap — batch-sized), union with the standing snapshot, keep
rank-1 per key by (ts, event_id), and publish crash-safely: the merged
frame lands in a fresh ``v<batch_id>`` directory and a pointer file is
atomically replaced (``os.replace``) to name it — the standing snapshot
directory is never deleted before the new one is fully published, so a
crash at ANY point leaves the pointer naming a complete directory (the
earlier rm-then-rename draft had a window that lost all prior state on
replay). Stale version directories are pruned only after the pointer
moves; a crash during pruning leaves garbage, never corruption.

Replayed batches are idempotent by construction: merging the same rows
twice cannot change a latest-wins result (the merge is a join-semilattice
fold — commutative, associative, idempotent), which is why the pattern is
safe under foreachBatch's at-least-once delivery.

At 100 TB the publish step is the transactional commit of a lakehouse
MERGE (Delta/Iceberg make the pointer swap a table-format commit); the
per-batch plan — batch-local rank-1, key-hashed merge join against the
snapshot, rank-1 again — is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.cdc import SNAP_COLS, latest_per_key, project_events

_POINTER = "CURRENT"


def _read_pointer(snapshot_dir: str) -> str | None:
    p = os.path.join(snapshot_dir, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        name = fh.read().strip()
    path = os.path.join(snapshot_dir, name)
    return path if name and os.path.exists(path) else None


def _publish(snapshot_dir: str, version_name: str) -> None:
    tmp = os.path.join(snapshot_dir, _POINTER + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(version_name)
    os.replace(tmp, os.path.join(snapshot_dir, _POINTER))


def merge_batch(batch_df: DataFrame, batch_id: int, snapshot_dir: str) -> None:
    """Apply one micro-batch to the published snapshot (module-level so
    the at-least-once replay path is unit-testable).

    Replay guard: foreachBatch re-delivers a batch whose _publish ran but
    whose streaming checkpoint commit didn't (crash in the window between
    them). Without the guard the rerun resolves the standing pointer to
    ``v{batch_id}`` itself and lazily re-reads the very directory its
    ``mode("overwrite")`` write is deleting — Spark refuses ("Cannot
    overwrite a path that is also being read from"), turning every
    recovery attempt into the same failure: a permanent crash loop. Since
    the merge is a latest-wins semilattice fold, a batch whose version the
    pointer already names is fully applied — re-applying it cannot change
    the result — so the guard skips it outright, which is both the safe
    and the semantically exact recovery."""
    version = f"v{batch_id}"
    standing_path = _read_pointer(snapshot_dir)
    if standing_path is not None and os.path.basename(standing_path) == version:
        return  # replayed, fully-applied batch: idempotent no-op
    spark = batch_df.sparkSession
    incoming = latest_per_key(project_events(batch_df))
    if standing_path is not None:
        standing = spark.read.parquet(standing_path)
        merged = latest_per_key(standing.unionByName(incoming))
    else:
        merged = incoming
    merged.write.mode("overwrite").parquet(os.path.join(snapshot_dir, version))
    _publish(snapshot_dir, version)
    # prune superseded versions (best-effort; crash here is harmless)
    import shutil

    for name in os.listdir(snapshot_dir):
        if name.startswith("v") and name != version:
            shutil.rmtree(os.path.join(snapshot_dir, name), ignore_errors=True)


def snapshot_sink(
    events: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    query_name: str = "cdc-snapshot",
):
    """Start a streaming query maintaining the latest-per-user snapshot
    under ``snapshot_dir`` (pointer file ``CURRENT`` → version dir) from
    an event stream with columns (event_id, ts, user_id, event_type,
    value)."""
    os.makedirs(snapshot_dir, exist_ok=True)

    return (
        events.writeStream.foreachBatch(
            lambda df, bid: merge_batch(df, bid, snapshot_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    path = _read_pointer(snapshot_dir)
    if path is None:
        raise FileNotFoundError(f"no published snapshot under {snapshot_dir}")
    return spark.read.parquet(path).select(*SNAP_COLS)
