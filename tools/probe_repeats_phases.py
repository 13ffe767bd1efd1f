"""Per-phase wall split of corpus_maximal_repeats (anomaly-protocol
diagnosis for the r10 unreproduced 10x probe): times the shared suffix
build+walk, the ANSV node extraction, and the naming/top/count tail
separately, at 1x and at the 10x replica, with /proc/loadavg captured
around each run. Mirrors the r11 operator body phase-for-phase; each
phase ends at a materialization the real operator also performs
(localCheckpoint / control-plane collect), so the sum tracks the
un-instrumented wall.

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
        edges = (
            lcps.select(
                "i", F.col("lcp").alias("l"),
                F.col("adoc").alias("rdoc"), F.col("apos").alias("rp"),
            )
            .repartitionByRange(
                int(spark.conf.get("spark.sql.shuffle.partitions")), F.col("i")
            )
            .sortWithinPartitions("i")
            .localCheckpoint()
        )
        out["A_build_walk_s"] = time.perf_counter() - t0
        out["edge_rows"] = edges.count()

        t0 = time.perf_counter()
        resolved = gs._ansv_resolved_edges(
            edges.select("i", "l", "rdoc", "rp"), n_suffixes, min_len
        )
        nodes = (
            resolved.groupBy("l", "psv", "nsv")
            .agg(F.min(F.struct("rdoc", "rp")).alias("rep"))
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
        top = (
            base.join(F.broadcast(boundary), F.col("doc") == F.col("rep.rdoc"))
            .select(
                F.concat_ws(" ", F.slice("w", F.col("rep.rp"), F.col("l"))).alias("span"),
                "l", "psv", "nsv",
            )
            .orderBy(F.col("l").desc(), "span")
            .limit(top_n)
        )
        counted = (
            sa.select("idx", "doc")
            .join(
                F.broadcast(top),
                (F.col("idx") > F.col("psv")) & (F.col("idx") <= F.col("nsv")),
            )
            .groupBy("span", "l")
            .agg(F.count("*").alias("n_occ"), F.countDistinct("doc").alias("n_docs"))
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
