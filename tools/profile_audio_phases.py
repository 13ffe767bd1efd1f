"""Phase-split timer for audio_fingerprint_dedup (r12 wave-3 evidence).

Times, in one fresh session at a fixed sf dir, each cumulative phase of
the query via the noop sink (guide §1.4), median of N warm runs per
phase with the bench-grade hygiene between runs:

  p1_segs      fused synth→WAV→decode→fingerprint Arrow stage
  p2_stream    + per-doc stream digest / rep collapse
  p3_landmarks + landmark window + collect_set signature frame
  p4_full      the whole declared query (prefix join + expand)

Usage::

    python tools/profile_audio_phases.py [sf_dir] [n_warm]
"""

from __future__ import annotations

import os
import sys
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import _hygiene, time_warm  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_pipelines_worker_spark.functions.intmath import md5_fold60
    from data_pipelines_worker_spark.operators import audio_fingerprint as AF
    from data_pipelines_worker_spark.operators import dedup
    from data_pipelines_worker_spark.queries import load_all
    from data_pipelines_worker_spark.queries.media_queries import (
        _VAD_RATE,
        _synth_samples,
    )
    from data_pipelines_worker_spark.session import get_spark, load_table

    spark = get_spark("audio-phases")
    load_all()

    def p1_segs(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        return AF.synth_segment_fingerprints(docs, _synth_samples, _VAD_RATE)

    def p2_stream(spark, sf_dir):
        segs = p1_segs(spark, sf_dir).persist()
        return segs.groupBy("doc").agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seg_idx", "fp"))),
                        lambda x: x["fp"],
                    ),
                    "|",
                )
            ).alias("gid")
        )

    def p3_landmarks(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        segs = AF.synth_segment_fingerprints(
            docs, _synth_samples, _VAD_RATE
        ).persist()
        stream = segs.groupBy("doc").agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seg_idx", "fp"))),
                        lambda x: x["fp"],
                    ),
                    "|",
                )
            ).alias("gid")
        )
        rep = stream.groupBy("gid").agg(F.min("doc").alias("rep"))
        members = stream.join(rep, "gid").select("doc", "rep")
        reps = members.select(F.col("rep").alias("doc")).distinct()
        w = Window.partitionBy("doc").orderBy("seg_idx")
        lm = (
            segs.join(reps, "doc")
            .select(
                "doc",
                "fp",
                F.lead("fp", 1).over(w).alias("f1"),
                F.lead("fp", 2).over(w).alias("f2"),
            )
            .where(F.col("f2").isNotNull())
            .select(
                "doc", md5_fold60(F.concat_ws("|", "fp", "f1", "f2")).alias("h")
            )
        )
        return lm.groupBy("doc").agg(
            F.sort_array(F.collect_set("h")).alias("sh")
        )

    def p4_full(spark, sf_dir):
        return load_all()["audio_fingerprint_dedup"][0](spark, sf_dir)

    print(f"sf_dir={sf_dir} load_start={os.getloadavg()[0]:.2f}", flush=True)
    for name, fn in [
        ("p1_segs", p1_segs),
        ("p2_stream", p2_stream),
        ("p3_landmarks", p3_landmarks),
        ("p4_full", p4_full),
    ]:
        cold, warms = time_warm(spark, fn, sf_dir, n_warm=n_warm)
        _hygiene(spark)
        runs = "/".join(f"{w:.2f}" for w in warms)
        print(
            f"{name:14s} med {median(warms):6.2f}  cold {cold:6.2f}"
            f"  warms [{runs}]",
            flush=True,
        )
    print(f"load_end={os.getloadavg()[0]:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
