"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The stdout line must stay well under the driver's 2,000-char capture tail
(BENCH_r03.json came back `parsed: null` because the full 92-query warm +
cold maps grew it to 5.1 KB — VERDICT r3 #4): "queries" on stdout carries
only the slowest 10 warm timings. The complete warm + cold per-query maps
are written to BENCH_LOCAL_{round}.json (committed) for the audit trail.

Each query is forced end-to-end with a noop write (full materialization,
nothing collected to the driver).
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def local_record_path(here: str, env_round: str | None) -> str:
    """Where this run's full per-query record lands.

    Explicit ``SPARK_GRAFT_ROUND`` wins and MAY overwrite (the builder's
    deliberate recert flow). A DERIVED tag (max ``BENCH_r{N}.json`` ON
    DISK in the repo root + 1 — committed or not; during a round-N run
    the driver writes BENCH_r{N} only after this script, so the max
    present is normally N-1, but an untracked BENCH_r{N} advances the
    derived round too) never overwrites: the driver's
    end-of-round run derives the same rN the builder already committed
    a local record under, and clobbered it in r08 (VERDICT r8 #1,
    hardcoded tag) and again in r09 (VERDICT r9 #2, derived tag) — on
    collision the run lands in ``BENCH_LOCAL_rN.driver.json`` instead.
    """
    rnd = env_round
    if not rnd:
        seen = [
            int(m.group(1))
            for f in os.listdir(here)
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
        ]
        rnd = f"r{(max(seen) + 1 if seen else 0):02d}"
    path = os.path.join(here, f"BENCH_LOCAL_{rnd}.json")
    n = 1
    while not env_round and os.path.exists(path):
        n += 1
        suffix = ".driver.json" if n == 2 else f".driver{n - 1}.json"
        path = os.path.join(here, f"BENCH_LOCAL_{rnd}{suffix}")
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_pipelines_worker_spark.queries import load_all
    from data_pipelines_worker_spark.session import get_spark

    spark = get_spark("bench")
    registry = load_all()

    # Session bootstrap (JVM spin-up, parquet reader init, first-job
    # scheduling) and the OS page-cache state of each table otherwise land
    # entirely on whichever query sorts first to touch that table,
    # misattributing several seconds of fixed cost. One trivial count per
    # table pays both outside the timed loop; no registered query (or its
    # plan/codegen JIT profile) is touched, so per-query numbers measure
    # query execution, not disk state.
    from data_pipelines_worker_spark.session import TABLES

    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()

    # Python-worker pool + Arrow serializer spin-up (~1s across the first
    # pandas-UDF stage) is session infrastructure, not query work: warm one
    # trivial identity UDF task per core so whichever pandas-UDF query
    # happens to sort first isn't charged the pool startup.
    import pandas as _pd  # noqa: F401  (worker import warm)
    from pyspark.sql.functions import col, pandas_udf

    ident = pandas_udf(lambda s: s, "long")
    spark.range(64, numPartitions=int(spark.sparkContext.defaultParallelism)).select(
        ident(col("id"))
    ).count()

    # Two executions per query; the reported number is the second (warm)
    # run. First-execution codegen JIT is session infrastructure that lands
    # on the alphabetically-first query of each operator family
    # (dedup_clusters measured ~9 s cold vs ~2.8 s warm) — a steady-state
    # engine serves queries against warm code caches, so the warm number is
    # the one comparable across rounds and against the reference. Cold
    # first-run timings are preserved under "cold_queries" for transparency.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, (fn, _oracle) in sorted(registry.items()):
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            cold[name] = round(time.perf_counter() - t0, 3)
            # Intra-query persist()s (ANN index frames, composed corpus
            # pipelines) must not leak into the next query's memory
            # budget: across 292 timed executions the pinned blocks
            # accumulate until eviction pressure dominates the tail of
            # the run (driver r05 ran 173 s vs 109 s local for identical
            # code — VERDICT r5 #2). Clearing between the cold and warm
            # runs also makes the warm number measure warm *code*
            # (codegen JIT), not a warm cache of the query's own
            # intermediate frames — the steady-state-engine number the
            # round-over-round comparison wants. clearCache sits outside
            # both timing windows, matching tools/check_oracle.py.
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            gc.collect()
            t1 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t1, 3)
        except Exception as ex:  # noqa: BLE001
            print(f"bench: {name} failed: {ex}", file=sys.stderr)
            timings[name] = -1.0
            cold.setdefault(name, -1.0)
        finally:
            spark.catalog.clearCache()
            # clearCache only drops SQL-cached plans; localCheckpoint
            # blocks from iterative queries (CC loops, pagerank, k-means)
            # stay pinned in the block manager until Python's GC releases
            # the py4j handles and the ContextCleaner runs — across ~310
            # executions the leaked blocks build eviction pressure that
            # lands on whichever iterative query runs next (observed:
            # one ~5 s CC query ballooning to 21-34 s per run, a
            # different victim each time). Unpersist completed queries'
            # RDD blocks deterministically, outside the timing windows.
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            gc.collect()

    # --- diagnostic side-channels (ALL outside the timing windows) --------
    # r06 left two queries running 7-11x slower in the driver environment
    # than this same code committed locally (VERDICT r6 #1). Rather than
    # guess, record enough state in the committed artifact to NAME the
    # mechanism when environments diverge:
    #  * per-query output cardinality for the scale-critical watchlist —
    #    if the driver's data shape differs, counts differ;
    #  * JVM code-cache occupancy — a long-lived engine that has compiled
    #    ~600 generated classes can exhaust the JIT code cache, silently
    #    disabling compilation; expression-heavy queries (the 64-hash
    #    minhash signature, the EWMA lambda fold) then run interpreted at
    #    5-15x while scan-bound queries stay fast;
    #  * GC totals, load average and free memory — contention evidence.
    # Disable with SPARK_GRAFT_BENCH_CARDS=0 (the driver inherits the
    # default-on path).
    cards: dict[str, int] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_CARDS", "1") != "0":
        watch = [
            "dedup_minhash_lsh", "ewma_events", "probe_minhash_candidates",
            "dedup_ngram_jaccard", "containment_dedup", "semantic_dedup",
            "embedding_near_dup", "lsh_parameter_sweep", "dedup_clusters",
        ]
        for name in watch:
            if name in registry and timings.get(name, -1) >= 0:
                try:
                    cards[name] = registry[name][0](spark, sf_dir).count()
                except Exception:  # noqa: BLE001 — diagnostics never fail the bench
                    cards[name] = -1
    # Data-shape profile at the BENCH scale factor (the driver generates
    # its own sf0.1 parquet — VERDICT r6 suspects a different dup/length
    # distribution as the alternative mechanism for the two blowups; these
    # few aggregates decide it: more exact-dup groups / longer docs =>
    # more MinHash candidates; fewer users / hotter users => heavier
    # per-user EWMA folds).
    data_profile: dict[str, int] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_CARDS", "1") != "0":
        try:
            from pyspark.sql import functions as _F

            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            prof = docs.agg(
                _F.count("*").alias("docs_rows"),
                _F.countDistinct(_F.md5("text")).alias("docs_distinct_texts"),
                _F.sum(_F.length("text")).alias("docs_total_chars"),
                _F.max(_F.length("text")).alias("docs_max_chars"),
            ).collect()[0]
            data_profile.update({k: int(v) for k, v in prof.asDict().items()})
            ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            per_user = ev.groupBy("user_id").count()
            prof = per_user.agg(
                _F.sum("count").alias("events_rows"),
                _F.count("*").alias("events_users"),
                _F.max("count").alias("events_max_per_user"),
            ).collect()[0]
            data_profile.update({k: int(v) for k, v in prof.asDict().items()})
        except Exception:  # noqa: BLE001 — diagnostics never fail the bench
            pass
    env_stats: dict[str, object] = {}
    try:
        jvm = spark.sparkContext._jvm
        mf = jvm.java.lang.management.ManagementFactory
        for pool in mf.getMemoryPoolMXBeans():
            pname = pool.getName()
            if "CodeHeap" in pname or "Code Cache" in pname:
                u = pool.getUsage()
                env_stats[f"codecache:{pname}"] = {
                    "used_mb": round(u.getUsed() / 2**20, 1),
                    "max_mb": round(u.getMax() / 2**20, 1),
                }
        gc_ms = 0
        for gcb in mf.getGarbageCollectorMXBeans():
            gc_ms += gcb.getCollectionTime()
        env_stats["gc_total_ms"] = int(gc_ms)
        env_stats["heap_max_gb"] = round(
            jvm.java.lang.Runtime.getRuntime().maxMemory() / 2**30, 1
        )
        env_stats["load_avg_1m"] = round(os.getloadavg()[0], 1)
        # Cumulative CPU-steal seconds since boot (/proc/stat col 8, USER_HZ
        # jiffies): this host is a guest with bursty neighbor steal (r12:
        # ~10,200 s over 4.4 h), and a big value here names the mechanism
        # when a whole run is uniformly inflated — readable from the
        # driver's stdout tail alone (VERDICT r12 #3).
        try:
            with open("/proc/stat") as st:
                cols = st.readline().split()
                env_stats["steal_s"] = round(int(cols[8]) / os.sysconf("SC_CLK_TCK"), 1)
        except (OSError, IndexError, ValueError):
            pass
        with open("/proc/meminfo") as mi:
            for ln in mi:
                if ln.startswith("MemAvailable"):
                    env_stats["mem_available_gb"] = round(
                        int(ln.split()[1]) / 2**20, 1
                    )
                    break
    except Exception:  # noqa: BLE001 — diagnostics never fail the bench
        pass

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    cold_total = round(sum(t for t in cold.values() if t >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # Full per-query maps go to a committed local artifact, not stdout
    # (see local_record_path for the collision rules).
    local_path = local_record_path(
        os.path.dirname(os.path.abspath(__file__)),
        os.environ.get("SPARK_GRAFT_ROUND"),
    )
    try:
        with open(local_path, "w") as fh:
            json.dump(
                {
                    "metric": "total_runtime_all_queries",
                    "value": total,
                    "unit": "sec",
                    "sf": sf_val,
                    "n_queries": len(timings),
                    "queries": timings,
                    "cold_value": cold_total,
                    "cold_queries": cold,
                    "cardinalities": cards,
                    "data_profile": data_profile,
                    "env": env_stats,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
    except OSError as ex:
        print(f"bench: could not write {local_path}: {ex}", file=sys.stderr)

    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    failed = sorted(n for n, t in timings.items() if t < 0)
    line = {
        "metric": "total_runtime_all_queries",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "sf": sf_val,
        "n_queries": len(timings),
    }
    # compact environment fingerprint on the driver-captured line: total
    # code-cache occupancy is the one number that can explain a whole-run
    # slowdown class (JIT disabled) from the stdout tail alone
    if env_stats:
        cc_used = sum(
            v["used_mb"] for k, v in env_stats.items()
            if k.startswith("codecache:") and isinstance(v, dict)
        )
        cc_max = sum(
            v["max_mb"] for k, v in env_stats.items()
            if k.startswith("codecache:") and isinstance(v, dict)
        )
        line["env"] = {
            "cc_mb": round(cc_used, 1),
            "cc_max_mb": round(cc_max, 1),
            "gc_s": round(env_stats.get("gc_total_ms", 0) / 1000, 1),
            "load": env_stats.get("load_avg_1m"),
        }
        if "steal_s" in env_stats:
            line["env"]["steal_s"] = env_stats["steal_s"]
    if failed:
        # the failed list is unbounded (a broken session can fail ~all
        # queries); keep a count + a sample so the line stays parseable
        line["n_failed"] = len(failed)
        line["failed"] = failed[:8]
    out = json.dumps(line)
    # Hard guard: the driver keeps only a ~2,000-char stdout tail.
    if len(out) > 1500:
        line["queries"] = dict(list(slowest.items())[:5])
        if failed:
            line["failed"] = failed[:3]
        out = json.dumps(line)
    print(out)


if __name__ == "__main__":
    main()
