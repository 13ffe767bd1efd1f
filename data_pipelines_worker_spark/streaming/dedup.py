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
        # content already emitted in an earlier trigger — suppress all
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
