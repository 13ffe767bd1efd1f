"""Dump ``explain('formatted')`` for named registry queries to files.

Usage::

    python tools/dump_query_plan.py <out_dir> <suffix> query [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query — the
before/after plan evidence trail for optimization rounds
(``plans/r12/...``). Plan-only: nothing is executed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 4:
        print("usage: dump_query_plan.py out_dir suffix query [query ...]")
        return 2
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from data_pipelines_worker_spark.queries import load_all
    from data_pipelines_worker_spark.session import get_spark

    spark = get_spark("plan-dump")
    registry = load_all()
    for name in names:
        if name not in registry:
            print(f"{name}: unknown query", file=sys.stderr)
            continue
        fn, _ = registry[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        # drop any persists the query body registered so the next
        # query's plan is built from a clean slate
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
