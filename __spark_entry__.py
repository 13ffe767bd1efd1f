"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the reference's canonical pipeline
spine: scan → JSONPath fan-out → scalar transform → ordered gather →
join_strings) on sf0.001.

``queries()`` / ``oracle_sql()`` — built from the package's query registry
(data_pipelines_worker_spark/queries/*): one entry per implemented operator
from SURVEY.md §2, plus the beyond-reference scale operators (dedup,
similarity search, text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipelines_worker_spark.queries import load_all

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: explode → wrap_text → gather → join_strings over the
    documents table (the yt-short pipeline spine, SURVEY §7 M1)."""
    registry = load_all()
    fn, _ = registry["gather_join_strings"]
    return fn(spark, _SF0001)


# The correctness driver records at most ~50 rows, taking them in dict
# order (CORRECTNESS_r02 silently dropped the registration-order tail).
# Rotate coverage: queries the driver has not yet hash-verified go first
# (window_functions leads — red in r02, reworked integer-exact since),
# r02-green queries fill the rest; the committed tools/check_oracle.py run
# (ORACLE_LOCAL_r*.txt) remains the auditable backstop for any dropped
# tail.
_DRIVER_PRIORITY = (
    "window_functions",
    # round-3 additions, never driver-checked
    "pii_redact",
    "repetition_signals",
    "decontaminate_ngram",
    "sequence_packing",
    "doc_chunking",
    "length_histogram",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q19_disjunctive_pred",
    "q22_idle_customers",
    "interval_join_attribution",
    "semantic_dedup",
    "mixture_sample",
    "lm_bigram_score",
    "embedding_pq_codes",
    "ann_cosine_topk_ivfpq",
    "sequence_packing_greedy",
    "sketch_error_bounds",
    "pack_manifest",
    "corpus_final_manifest",
    "cohort_retention",
    "funnel_analysis",
    # round-2 additions dropped by the r02 50-row cap
    "token_count_bpe",
    "pipeline_e2e",
    "subtitles_from_transcription",
    "media_audio_chunk",
    "media_image_resize",
    "media_video_pipeline",
    "media_frame_sample",
    "media_image_stats",
    "dedup_clusters",
    "grouping_sets",
    "range_join_binned",
    "percentile_by_group",
    "sketch_aggregates",
    "skew_salted_agg",
    "bucketed_join_agg",
)


def _ordered() -> dict[str, tuple]:
    registry = load_all()
    out = {n: registry[n] for n in _DRIVER_PRIORITY if n in registry}
    out.update(registry)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_fn, oracle) in _ordered().items()
        if oracle is not None
    }
