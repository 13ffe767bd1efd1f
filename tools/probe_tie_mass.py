"""Measure, per prefix-doubling round, how much of the corpus is still
TIED (suffix rank class size > 1) — the feasibility probe for a
Larsson-Sadakane-style "skip resolved suffixes" build (qsufsort: once a
suffix's rank is unique its rank never changes, so late rounds only
need to re-rank the tied remainder; J. Larsson & K. Sadakane,
"Faster suffix sorting", TCS 387(3), 2007 — public literature).

The lever only pays if the tie mass collapses to a small fraction
within a few rounds: a full round is a corpus-wide range exchange +
window + checkpoint, while an LS round would be a scan + broadcast-
sized re-rank of the tied remainder. Exact-duplicate suffixes never
resolve (the documents table carries exact dups by design), so the
expected shape is a fast collapse to a duplicate-mass floor.

Usage: python tools/probe_tie_mass.py [sf_dir]
Prints one line per doubling depth k: tied rows, tie classes, max rem
among tied rows, and the tied fraction of the corpus.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from data_pipelines_worker_spark.operators import global_suffix as gs
    from data_pipelines_worker_spark.session import get_spark

    spark = get_spark("tie-mass-probe")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    with gs._suffix_build_confs(spark):
        base = (
            docs.where(F.length("text") > 0)
            .select(F.col("doc_id").alias("doc"), F.split("text", " ", -1).alias("w"))
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint()
        )
        lens = base.select("doc", F.size("w").alias("_len"))
        agg = lens.agg(F.max("_len").alias("m"), F.sum("_len").alias("t")).collect()[0]
        maxlen, n = agg["m"] or 0, int(agg["t"] or 0)
        npart = gs._suffix_npart(n, spark)
        spark.conf.set("spark.sql.shuffle.partitions", str(npart))
        toks = base.select("doc", F.posexplode("w").alias("p0", "tok")).select(
            "doc", (F.col("p0") + 1).alias("p"), "tok"
        )
        print(f"corpus: {n} suffixes, maxlen={maxlen} tokens", flush=True)
        if n == 0:
            print("empty corpus — nothing to measure", flush=True)
            return 0
        t0 = time.perf_counter()
        tables, _pairs = gs.corpus_suffix_tables(
            toks, "doc", "p", "tok", maxlen=maxlen, npart=npart
        )
        print(f"build: {time.perf_counter() - t0:.1f}s, "
              f"{len(tables)} tables at k={sorted(tables)}", flush=True)

        # rem = tokens remaining at this position (needed for the
        # provably-resolved stop rule: a tie class whose max rem <= k
        # is all-identical and can stop doubling)
        for k in sorted(tables):
            t = tables[k].join(F.broadcast(lens), "doc").withColumn(
                "rem", F.col("_len") - F.col("p") + 1
            )
            agg = (
                t.groupBy("r")
                .agg(F.count("*").alias("sz"), F.max("rem").alias("mr"))
                .where(F.col("sz") > 1)
                .agg(
                    F.sum("sz").alias("tied_rows"),
                    F.count("*").alias("classes"),
                    F.max("mr").alias("max_rem"),
                    F.sum(F.when(F.col("mr") > k, F.col("sz")).otherwise(0)).alias(
                        "unresolved_rows"
                    ),
                )
                .collect()[0]
            )
            tied = agg["tied_rows"] or 0
            unres = agg["unresolved_rows"] or 0
            print(
                f"k={k:6d}: tied={tied:9d} ({100.0 * tied / n:5.1f}%) "
                f"classes={agg['classes'] or 0:8d} max_rem={agg['max_rem'] or 0:6d} "
                f"unresolved(rem>k)={unres:9d} ({100.0 * unres / n:5.1f}%)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
