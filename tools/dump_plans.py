"""Dump formatted physical plans of headline queries to PLANS.md.

Usage: python tools/dump_plans.py [sf_dir]

The plan properties asserted in tests/test_plan_quality.py are the hard
gate; this file is the human-readable evidence trail (scan pushdown,
join strategies, exchange counts) for review.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINERS = {
    "q1_pricing_summary": "scan → pushed filter → two-phase hash aggregate",
    "q3_shipping_priority": "broadcast dim joins, single fact shuffle",
    "q6_forecast_revenue": "pure scan-filter-aggregate, all predicates pushed",
    "dedup_minhash_lsh": "signature agg → banded bucket equi-join → verify",
    "ann_cosine_topk_ivf": "Arrow signature stage → broadcast probe equi-join",
    "bucketed_join_agg": "co-located SMJ, zero exchanges below the join",
    "window_functions": "five window columns, one exchange + sort",
    "corpus_prep": "composed dedup/lang/quality/tokens: one scan, one shuffle",
    "range_join_binned": "interval join as binned broadcast equi-join",
    "semi_anti_join": "existence joins (LeftSemi/LeftAnti)",
    "q8_market_share": "7-table snowflake: all dims broadcast, one fact shuffle",
    "q17_small_qty_revenue": "decorrelated scalar subquery as broadcast agg join",
    "q22_idle_customers": "broadcast global threshold + left-anti join",
    "repetition_signals": "explode + codegen hash aggs (no interpreted lambdas)",
    "decontaminate_ngram": "corpus streams through broadcast benchmark-gram join",
    "pii_redact": "single codegen'd scan-bound map stage",
    "sequence_packing": "per-stream window cumsum + partial-agg rollup",
    "interval_join_attribution": "equi-key hash join with event-time range residual",
    "ann_cosine_topk_ivfpq": "probe → ADC on compressed codes → exact re-rank",
    "semantic_dedup": "IVF cells bound the pair join (Σ|cell|², not n²)",
    "sequence_packing_greedy": "applyInPandas per stream (sequential reset loop)",
    "sketch_error_bounds": "sketch + exact in one plan, contract booleans",
    "q9_product_profit": "profit snowflake: name-filtered part broadcast, one fact shuffle",
    "q21_waiting_supplier": "late-set reused across semi + anti legs on the order key",
    "chunk_dedup": "block window keyed by 128-bit digest, reassembly regroup by doc",
    "dup_ngram_coverage": "gram digests → one (doc, digest) shuffle, codegen agg",
    "tfidf_top_terms": "tf agg → broadcast vocabulary df → per-doc rank window",
    "embedding_kmeans": "Arrow assignment stages + k·d control-plane centroid sums",
    "dedup_ngram_jaccard": "exact-collapse → df-capped candidates → full-set verify → expand",
    "hll_registers": "two-phase register max fold, all-codegen harmonic sum",
    "bloom_join_prune": "broadcast bit-set LeftSemi probes, no probe-side shuffle",
    "approx_quantile_binned": "bin-bounded partial agg + window rank crossing",
    "rolling_features": "one user-keyed exchange feeds all five frames",
    "bm25_retrieval": "term-filtered postings, broadcast df/stats, TakeOrdered top-k",
    "pmi_bigrams": "pair agg + broadcast unigram sides, TakeOrdered top-50",
    "dsir_importance": "gram stream ⋈ broadcast 64-row ratio table, doc-keyed agg",
    "quality_logit_filter": "shuffle-free codegen classifier expression",
    "training_shards": "shard-partitioned window, no global sort",
    "copurchase_triangles": "low→high wedge join closed by (a,c) equi-join",
    "table_profile": "unpivot-in-scan, one (col,value) keyed aggregation",
    "reservoir_sample_k": "WindowGroupLimit pushes k=10 into the group sort",
    "latest_snapshot": "CDC compaction: rank-1 per key via WindowGroupLimit",
    "order_backlog_timeline": "+1/−1 interval events, window over monthly agg",
    "hybrid_retrieval_rerank": "BM25 corpus leg + k-bounded dense re-rank",
    "dq_checks": "five count-only expectation legs, one union plan",
    "zone_map_pruning": "one partial-combined min/max/count agg, literal prune verdict",
    "embedding_near_dup": "exact-collapse window → SRP band equi-join → strict-fold verify → linear expand",
    "entity_resolution": "blocked equi-join candidates, in-codegen levenshtein, rank-1 WindowGroupLimit",
    "decontaminate_minhash": "64-min signature agg, broadcast benchmark side, corpus x |bench| bounded",
    "ewma_events": "one user-keyed exchange, strict-fold in codegen aggregate",
    "cube_segment_metrics": "Expand lattice over broadcast-dim join, partial+final agg",
    "kmv_set_intersection": "distinct-hash agg → WindowGroupLimit top-k → sketch-sized set algebra",
    "session_window_stats": "native session_window merging aggregate, one user-keyed exchange",
    "gopher_quality_rules": "five rule booleans in one shuffle-free codegen projection",
    "c4_line_filters": "line explode → codegen booleans → one doc-keyed partial agg",
    "containment_dedup": "exact-collapse → capped candidates → full-set verify → member lift",
    "shingle_novelty": "long-keyed min-per-shingle agg, two shuffles, map-side combine",
    "top_p_selection": "one source-keyed exchange reused by both windows, single scan",
    "pivot_event_type": "one conditional aggregate (not pivotfirst's two exchanges)",
    "range_interval_window": "trailing-1h RANGE frame, one exchange + sort",
    "length_quantile_filter": "rank-window order stats, |sources|-row bounds broadcast back",
    "oov_rate": "two-phase vocab heavy-hitters, broadcast LEFT join over tokens",
    "embedding_outliers": "posexplode → centroid agg broadcast back → WindowGroupLimit top-5",
    "lang_confusion": "classifier in scan stage, |langs|² matrix agg + share window",
    "activity_streaks": "(user, day) dedup below the island window, one user exchange",
    "rolling_active_users": "dedup-then-fanout ×7, distinct partial-combine per day",
    "ks_drift_check": "value-grid collapse, one type-keyed exchange serves cumsum+totals+max",
    "zorder_layout": "one scan, in-stage layout fan-out, two manifest-sized aggs",
    "bootstrap_ci": "x16 replicate fan-out in scan stage, one partial-combined agg",
    "lsh_parameter_sweep": "one 64-min signature pass, 60-band equi-join, config table",
    "perceptron_train": "per-round 1-row weight broadcast + all-reduce aggregate",
    "media_audio_energy": "Arrow WAV codec stages, active-frames-only island window",
    "bloom_zone_skipping": "8-lane bit_or filter build in one partial-combined agg",
    "pareto_frontier": "two RANGE frames over one source-keyed sort",
    "shuffle_skew_profile": "per-key two-phase counts, broadcast max-count argmax",
    "join_cardinality_probe": "count-table joins only, TakeOrdered top-k heavy hitters",
    "kcore_peeling": "per-round degree agg + broadcast anti-joins, localCheckpoint",
    "probe_minhash_candidates": "signature aggs + band fan-out, histogram only, no pair join",
    "planner_advice": "five-kernel union of manifest-sized summaries, broadcast-only",
    "dedup_allpairs_prefix": "df rank window, prefix equi-join candidates, exact verify",
    "exact_percentiles": "two-phase bucket histograms, no global row sort",
    "cdc_chunking": "one doc exchange for all windows, manifest copy-count",
    "media_image_phash": "codec-stage python only, banded distinct-hash equi-join",
    "edit_distance_join": "deletion-signature xxhash equi-join, JVM levenshtein verify",
    "rendezvous_sharding": "bounded 17-way fan-out, one filtered max_by agg, no join",
    "mixture_waterfill": "one corpus agg, manifest-frame windows, integer saturation test",
    "merkle_diff": "fingerprint agg ladders, full-outer on tree rows only",
    "leakage_safe_split": "LSH+CC kernels, map-only fold tag, pair-sized audit join",
    "suffix_array_ranks": "one doc exchange, O(log maxlen) in-partition window sorts, no joins",
    "corpus_repeated_spans": "per-doc reduction over the frozen per-position LCP frame (build is eager: one range exchange per doubling round)",
    "dedup_weighted_jaccard": "multiplicity expansion -> rarest-first prefix equi-join -> full expanded-set verify -> member lift",
    "corpus_maximal_repeats": "ANSV interval nodes (frozen), boundary-set endpoint/slice joins, one deliberate top-N interval BNLJ for n_docs; n_occ = nsv - psv",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from data_pipelines_worker_spark.queries import load_all
    from data_pipelines_worker_spark.session import get_spark

    spark = get_spark("plan-dump")
    registry = load_all()
    out = [
        "# PLANS — headline physical plans",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}`. The scale",
        "properties shown here are machine-asserted in",
        "`tests/test_plan_quality.py`; this file is the readable evidence.",
        "",
    ]
    for name, blurb in HEADLINERS.items():
        fn, _ = registry[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.append(f"## {name}")
        out.append("")
        out.append(f"_{blurb}_")
        out.append("")
        out.append("```")
        out.append(plan.strip())
        out.append("```")
        out.append("")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
