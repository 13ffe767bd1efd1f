"""Budgeted quality selection (nucleus / top-p over sources): the shared
kernel behind the batch ``top_p_selection`` query and its streaming face
(``streaming/selection.py``). Both sides call THESE functions so the
scoring and the budget rule can never fork — the same discipline as
``operators/cdc.py`` for the CDC snapshot pair.

Rule: per source, keep the highest-quality documents (unrounded quality
score, doc_id tie-break) until half the source's token mass is selected
(``2·cum ≤ total``); the top-1 document is always kept so no source
empties. Integer budget arithmetic end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from . import text_analysis as ta

#: Columns of the scored-document metadata row (the ONLY thing the
#: streaming face ever stores — never document bodies).
SCORE_COLS = ("source", "doc_id", "n_tokens", "q")


def score_docs(docs: DataFrame) -> DataFrame:
    """(source, doc_id, n_tokens, q) — the scan-stage scoring map shared
    by batch and streaming; pure codegen column expressions."""
    return docs.select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ", -1)).cast("long").alias("n_tokens"),
        ta.quality_score(F.col("text")).alias("q"),
    )


def top_p_select(scored: DataFrame) -> DataFrame:
    """The budgeted per-source selection over a scored frame.

    One source-keyed exchange feeds both windows (rank/cumsum and the
    per-source total — same partition key, Catalyst reuses the sort).
    Output: (source, doc_id, rank, n_tokens, cum_tokens, quality)."""
    wo = W.partitionBy("source").orderBy(F.col("q").desc(), "doc_id")
    wcum = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    wtot = W.partitionBy("source")
    ranked = scored.select(
        "source",
        "doc_id",
        "n_tokens",
        "q",
        F.row_number().over(wo).cast("long").alias("rank"),
        F.sum("n_tokens").over(wcum).cast("long").alias("cum_tokens"),
        F.sum("n_tokens").over(wtot).alias("total_tokens"),
    )
    return ranked.where(
        (2 * F.col("cum_tokens") <= F.col("total_tokens"))
        | (F.col("rank") == 1)
    ).select(
        "source",
        "doc_id",
        "rank",
        "n_tokens",
        "cum_tokens",
        F.round("q", 6).alias("quality"),
    )
