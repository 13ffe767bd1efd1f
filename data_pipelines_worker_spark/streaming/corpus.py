"""Streaming corpus preparation: the ingestion face of the batch
``corpus_prep`` query (text_queries.py) — first-seen exact dedup, language
ID, quality gate, and token metering over a *stream* of documents (new
crawl snapshots arriving continuously).

Composition shape: every text feature (lang/quality/tokens) is a stateless
codegen'd column map computed *before* the stateful stage, and the quality
gate filters before state too — state only ever holds documents that could
be emitted, and the stateful operator's shuffle/state key is the 8-byte
content hash (never the text). Duplicates share content, hence identical
features, so filtering early cannot diverge from the batch order
(dedup → filter).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators import text_analysis as ta

QUALITY_FLOOR = 0.45

_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang_pred", StringType()),
        StructField("quality", DoubleType()),
        StructField("n_tokens", LongType()),
    ]
)
_STATE = StructType([StructField("first_id", LongType())])


def _first_seen_doc(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # content already emitted — suppress duplicates; the drain loop
        # satisfies applyInPandasWithState's fully-consume-the-iterator
        # contract (same discipline as streaming/dedup.py)
        for _ in batches:
            pass
        return
    best: pd.DataFrame | None = None
    for pdf in batches:
        row = pdf.loc[[pdf["doc_id"].idxmin()]]
        if best is None or int(row["doc_id"].iloc[0]) < int(best["doc_id"].iloc[0]):
            best = row
    if best is None:
        return
    state.update((int(best["doc_id"].iloc[0]),))
    yield best[["doc_id", "lang_pred", "quality", "n_tokens"]]


def corpus_prep_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, quality, n_tokens) for first-seen documents that
    clear the quality floor — column-for-column the batch ``corpus_prep``
    output. Within one trigger the min id wins (the batch canonical
    choice); across triggers, first trigger wins."""
    text = F.col(text_col)
    words = ta.tokenize_ws(text)
    feats = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.xxhash64(text).alias("content_hash"),
        ta.lang_id(words).alias("lang_pred"),
        F.round(ta.quality_score(text), 6).alias("quality"),
        ta.token_count_regex(text).alias("n_tokens"),
    ).where(F.col("quality") >= QUALITY_FLOOR)
    return feats.groupBy("content_hash").applyInPandasWithState(
        _first_seen_doc,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
