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


def greedy_cover_rounds(
    tok: DataFrame,
    n_rounds: int,
    first_round: int = 1,
    covered_cnt: DataFrame | None = None,
):
    """The greedy max-cover round loop — the shared kernel behind the
    batch ``greedy_coverage_selection`` query and its streaming face
    (``streaming/coverage.py``), extracted so the two can never fork
    (the ``top_p_select`` discipline).

    ``tok`` is the candidate frame (doc, w) with already-covered units
    and already-picked docs removed; ``covered_cnt`` (1-row frame with
    column ``covered_after``) carries the running covered count when
    resuming from ``first_round`` > 1.

    Per round: one distinct (doc, w) aggregate for gains, a
    TakeOrderedAndProject top-1 pick (never a global window), and the
    pick's coverage removed via vocabulary-bounded broadcast anti-joins.
    Rounds ``localCheckpoint`` so round r+1 reads blocks, not lineage
    (measured 60 s → 6 s on the iterative family). Returns
    ``(rows, newly_frames)``: one (round, doc_id, gain, covered_after)
    frame per round, and the per-round newly-covered unit sets the
    streaming face persists as its versioned covered-set state.
    """
    rows = []
    newly_frames: list[tuple[int, DataFrame]] = []
    cur = tok
    for r in range(first_round, first_round + n_rounds):
        pick = (
            cur.groupBy("doc")
            .agg(F.count("*").cast("long").alias("gain"))
            .orderBy(F.col("gain").desc(), "doc")
            .limit(1)
            .localCheckpoint()
        )
        newly = (
            cur.join(F.broadcast(pick.select("doc")), "doc", "left_semi")
            .select("w")
            .distinct()
        )
        n_new = newly.agg(F.count("*").cast("long").alias("_n"))
        covered_cnt = (
            n_new
            if covered_cnt is None
            else covered_cnt.crossJoin(n_new).select(
                (F.col("covered_after") + F.col("_n")).alias("_n")
            )
        )
        covered_cnt = covered_cnt.select(
            F.col("_n").alias("covered_after")
        ).localCheckpoint()
        rows.append(
            pick.crossJoin(F.broadcast(covered_cnt)).select(
                F.lit(r).cast("long").alias("round"),
                F.col("doc").alias("doc_id"),
                "gain",
                "covered_after",
            )
        )
        newly_frames.append((r, newly.localCheckpoint()))
        cur = (
            cur.join(F.broadcast(newly), "w", "left_anti")
            .join(F.broadcast(pick.select("doc")), "doc", "left_anti")
            .localCheckpoint()
        )
    return rows, newly_frames
