"""Per-phase wall split of corpus_maximal_repeats (anomaly-protocol
diagnosis for the r10 unreproduced 10x probe): times the shared suffix
build+walk, the ANSV node extraction, and the top/count tail
separately, at 1x and at the 10x replica, with /proc/loadavg captured
around each run. Mirrors the r11 operator body phase-for-phase with NO
extra work: phase A ends at the kernel's own edge checkpoint (the
operator's first materialization of the walk), phase B inlines the
kernel's scan/collect/resolve steps on that same frame (no second
exchange), phase C is the histogram + boundary joins + interval count.

Usage: python tools/probe_repeats_phases.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def loadavg() -> str:
    return open("/proc/loadavg").read().split()[0:3].__repr__()


def run(spark, sf_dir: str, min_len: int = 8, top_n: int = 20) -> dict:
    from pyspark.sql import functions as F

    from data_pipelines_worker_spark.operators import global_suffix as gs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out: dict[str, float] = {}
    with gs._suffix_build_confs(spark):
        t0 = time.perf_counter()
        base, toks, tables, sa, lcps, n_suffixes = gs._suffix_pipeline(
            docs, "doc_id", "text"
        )
        npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # the kernel's own first step, replicated verbatim so the walk
        # is forced exactly once, exactly where the operator forces it
        d = (
            lcps.select("i", F.col("lcp").alias("l"))
            .repartitionByRange(npart, F.col("i"))
            .sortWithinPartitions("i")
            .localCheckpoint()
        )
        out["A_build_walk_s"] = time.perf_counter() - t0
        out["edge_rows"] = d.count()

        t0 = time.perf_counter()
        scanned = d.mapInPandas(
            gs._ansv_scan, "kind int, i long, l long, psv long, nsv long"
        ).localCheckpoint()
        cand = sorted(
            (r["i"], r["l"])
            for r in scanned.where(F.col("kind") == 1)
            .select("i", "l").distinct().collect()
        )
        cand_bc = spark.sparkContext.broadcast(
            ([c[0] for c in cand], [c[1] for c in cand])
        )
        resolved = (
            scanned.where((F.col("kind") == 0) & (F.col("l") >= min_len))
            .select("i", "l", "psv", "nsv")
            .mapInPandas(
                gs._ansv_resolve(cand_bc, n_suffixes),
                "i long, l long, psv long, nsv long",
            )
        )
        nodes = (
            resolved.groupBy("l", "psv", "nsv")
            .agg(F.min("i").alias("ri"))
            .localCheckpoint()
        )
        out["B_ansv_nodes_s"] = time.perf_counter() - t0
        out["node_rows"] = nodes.count()

        t0 = time.perf_counter()
        hist = sorted(
            ((r["l"], r["n"]) for r in
             nodes.groupBy("l").agg(F.count("*").alias("n")).collect()),
            reverse=True,
        )
        cutoff, cum = min_len, 0
        for length, n in hist:
            cutoff, cum = length, cum + n
            if cum >= top_n:
                break
        boundary = nodes.where(F.col("l") >= cutoff)
        if cum <= gs._BOUNDARY_BCAST_MAX_NODES:
            boundary = F.broadcast(boundary)
        reps = boundary.join(
            sa.select("idx", F.col("doc").alias("_rd"), F.col("p").alias("_rp")),
            F.col("ri") == F.col("idx"),
        ).select("l", "psv", "nsv", "_rd", "_rp")
        if cum <= gs._BOUNDARY_BCAST_MAX_NODES:
            reps = F.broadcast(reps)
        top = (
            base.join(reps, F.col("doc") == F.col("_rd"))
            .select(
                F.concat_ws(" ", F.slice("w", F.col("_rp"), F.col("l"))).alias("span"),
                "l", "psv", "nsv",
            )
            .orderBy(F.col("l").desc(), "span")
            .limit(top_n)
            .withColumn("n_occ", F.col("nsv") - F.col("psv"))
        )
        counted = (
            sa.select("idx", "doc")
            .join(
                F.broadcast(top),
                (F.col("idx") > F.col("psv")) & (F.col("idx") <= F.col("nsv")),
            )
            .groupBy("span", "l", "n_occ")
            .agg(F.countDistinct("doc").alias("n_docs"))
        )
        counted.write.format("noop").mode("overwrite").save()
        out["C_top_count_s"] = time.perf_counter() - t0
    return out


def main() -> int:
    from data_pipelines_worker_spark.session import get_spark
    from tools.scale_probe import _hygiene

    spark = get_spark("repeats-phase-probe")
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf_probe_10x"]
    for d in dirs:
        print(f"--- {d} load={loadavg()}", flush=True)
        run(spark, d)  # warm-up (parity with scale_probe's warm timing)
        _hygiene(spark)
        res = run(spark, d)
        _hygiene(spark)
        print({k: (round(v, 2) if isinstance(v, float) else v) for k, v in res.items()}, flush=True)
    print(f"load_end={loadavg()}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
