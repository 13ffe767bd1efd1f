"""A/B isolation of the ANSV candidate-broadcast term in
`lcp_interval_census` (VERDICT r11 watch #2: census drifted +17%
driver-to-driver in r11 — the round that added the candidate broadcast
at what is now `_ansv_resolve_from` — while the suite median moved -8%;
mandate: 'if it repeats, profile the candidate-broadcast step').

Arms, interleaved A/B/A/B/A/B so both sample the same host regime,
toggling the committed ship gate (``_CAND_CLOSURE_MAX_ENTRIES``):
  A = broadcast forced (gate 0): candidate arrays ship via
      ``sparkContext.broadcast`` — the r11 shape.
  B = closure forced (gate huge): the same arrays ride the resolver's
      closure — the r12 default at organic candidate sizes.

The original r12 run (SCALING.md r12) measured A ~0.5 s/run slower at
sf0.1 (KB-sized arrays; the broadcast's per-invocation setup
dominates), which is why the gate exists; this script re-runs that
evidence against the current code.

Usage: python tools/ab_census_broadcast.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from data_pipelines_worker_spark.operators import global_suffix as gs
    from data_pipelines_worker_spark.queries import load_all
    from data_pipelines_worker_spark.session import get_spark
    from tools.scale_probe import _hygiene, _median

    spark = get_spark("ab-census-broadcast")
    fn, _ = load_all()["lcp_interval_census"]

    gate_default = gs._CAND_CLOSURE_MAX_ENTRIES

    def timed(tag):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        _hygiene(spark)
        print(f"{tag}: {dt:6.2f}s  load={open('/proc/loadavg').read().split()[0]}",
              flush=True)
        return dt

    timed("warmup")  # session warm-up, discarded
    a_times, b_times = [], []
    for r in range(rounds):
        gs._CAND_CLOSURE_MAX_ENTRIES = 0
        try:
            a_times.append(timed(f"A[{r}] broadcast"))
        finally:
            gs._CAND_CLOSURE_MAX_ENTRIES = gate_default
        gs._CAND_CLOSURE_MAX_ENTRIES = 1 << 60
        try:
            b_times.append(timed(f"B[{r}] closure  "))
        finally:
            gs._CAND_CLOSURE_MAX_ENTRIES = gate_default
    print(f"A (broadcast) median {_median(a_times):.2f}s  runs "
          f"{'/'.join(f'{t:.2f}' for t in a_times)}", flush=True)
    print(f"B (closure)   median {_median(b_times):.2f}s  runs "
          f"{'/'.join(f'{t:.2f}' for t in b_times)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
