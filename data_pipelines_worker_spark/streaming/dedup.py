"""Streaming exact deduplication: emit each document the first time its
content is seen; suppress every later duplicate.

The batch counterpart is ``operators.dedup.exact_dedup`` (min-id per
content group). On a stream the "have I seen this content" set must live
in the state store, keyed by the 8-byte ``xxhash64`` of the text — the
canonical ingestion-dedup stage of a training-data pipeline (new crawl
snapshots arrive as a stream; only first-seen documents flow downstream).

Scale notes:
- State per distinct document is one (hash → first id) entry; the shuffle
  key and the state key are both 8 bytes, never the text.
- A 64-bit collision would suppress a genuinely new document; at 10^12
  documents the expected collision count is ~0.03 (birthday bound) —
  acceptable for dedup (the batch operator resolves exactly; the stream
  favors bounded state). Callers needing certainty re-verify offline.
- State never expires by default (content identity has no event-time
  bound); bound it with a TTL policy when the corpus allows re-emission
  after a horizon.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content_hash", LongType()),
    ]
)
_STATE = StructType([StructField("first_id", LongType())])


def _first_seen(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # content already emitted in an earlier trigger — suppress the
        # duplicates. The empty loop is REQUIRED, not dead code: the
        # applyInPandasWithState contract says the batch iterator must be
        # fully drained before returning, or Spark raises on the
        # half-consumed Arrow stream.
        for _ in batches:
            pass
        return
    best = None
    for pdf in batches:
        m = int(pdf["doc_id"].min())
        best = m if best is None else min(best, m)
    if best is None:
        return
    state.update((best,))
    yield pd.DataFrame({"doc_id": [best], "content_hash": [int(key[0])]})


def dedup_stream(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, content_hash) of first-seen documents only. Within one
    trigger the min id wins (matches the batch operator's canonical
    choice); across triggers, first trigger wins."""
    hashed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.xxhash64(F.col(text_col)).alias("content_hash"),
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _first_seen,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- sub-document (block) streaming dedup — round 4 -------------------------

_BLK_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("blk_idx", LongType()),
        StructField("block_hash", LongType()),
    ]
)
_BLK_STATE = StructType([StructField("seen", LongType())])


def _first_block(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # duplicate block suppressed; drain the iterator (contract — see
        # _first_seen above)
        for _ in batches:
            pass
        return
    best = None
    for pdf in batches:
        head = pdf[["doc_id", "blk_idx"]].sort_values(["doc_id", "blk_idx"]).iloc[0]
        cand = (int(head["doc_id"]), int(head["blk_idx"]))
        best = cand if best is None or cand < best else best
    if best is None:
        return
    state.update((1,))
    yield pd.DataFrame(
        {"doc_id": [best[0]], "blk_idx": [best[1]], "block_hash": [int(key[0])]}
    )


def block_dedup_stream(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", size: int = 20
) -> DataFrame:
    """Streaming face of :func:`..operators.dedup.block_dedup_stats`'s
    decision: per aligned word block, only the first corpus-wide
    occurrence survives. Emits (doc_id, blk_idx, block_hash) for
    surviving blocks; the survivor within one trigger is the
    lexicographically least (doc_id, blk_idx) — the batch operator's
    canonical choice — and across triggers the first trigger wins.

    Same state discipline as :func:`dedup_stream`: the shuffle key and
    state key are the 8-byte ``xxhash64`` of the block (bodies never
    enter the state store; the 64-bit collision caveat and its offline
    re-verification note apply unchanged). State is one entry per
    distinct block — the streaming analogue of the batch digest window."""
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    from ..operators.curation import explode_word_blocks

    b = explode_word_blocks(base, "doc_id", "text", size)
    hashed = b.select(
        "doc_id", "blk_idx", F.xxhash64(F.col("blk")).alias("block_hash")
    )
    return hashed.groupBy("block_hash").applyInPandasWithState(
        _first_block,
        outputStructType=_BLK_OUT,
        stateStructType=_BLK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
