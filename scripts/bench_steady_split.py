#!/usr/bin/env python3
"""Fresh-vs-steady split for registered queries at a large scale factor
(VERDICT r10 #4): run each named query N times in ONE session after the
standard bench warmup — run 1 is the fresh-session number (includes any
one-time first-evaluation codegen/JIT the warmup failed to amortize),
run N the steady state a long-lived cluster session would see.

    python scripts/bench_steady_split.py <sf_dir> <q1,q2,...> [repeats]

Spine/codebook are built first as their own timed lines (the bench.py
accounting: once-per-corpus artifacts, not per-query cost). One JSON
line per query; keep the box idle (bench.py's caveat).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402 — warm_session (the shared corpus-scaled warmup)
from forgettable_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="forgettable-steady-split",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from forgettable_spark import entrypoints as ep
    from forgettable_spark import entrypoints_ext as ext

    t0 = time.perf_counter()
    bench.warm_session(spark, sf_dir, cpus)
    print(json.dumps({"warmup_s": round(time.perf_counter() - t0, 2)}), flush=True)

    t0 = time.perf_counter()
    ext._doc_spine(spark, sf_dir)
    print(json.dumps({"spine_build_s": round(time.perf_counter() - t0, 2)}), flush=True)
    t0 = time.perf_counter()
    ext._codebook_for(spark, sf_dir, ext.KMEANS_CELLS)
    print(json.dumps({"codebook_train_s": round(time.perf_counter() - t0, 2)}), flush=True)
    # the two-level codebook memo too (review r11): otherwise the
    # partitioned/two-level consumers pay Lloyd training inside run 1
    # and the fresh/steady delta conflates once-per-corpus training
    # with the first-eval codegen cost this script exists to isolate
    t0 = time.perf_counter()
    ext._two_level_codebook_for(spark, sf_dir)
    print(
        json.dumps({"two_level_train_s": round(time.perf_counter() - t0, 2)}),
        flush=True,
    )

    qs = ep.queries()
    for name in names:
        fn = qs[name]
        runs = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        print(
            json.dumps(
                {"query": name, "sf_dir": sf_dir, "runs": runs,
                 "fresh": runs[0], "steady": runs[-1]}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
