#!/usr/bin/env python
"""Split a registered query's bench time into plan-construction vs
execution, with per-job wall times (r12 optimization tooling).

    python scripts/profile_query.py <query> [<query> ...]

Runs under the bench's own session shape (local[$SPARK_GRAFT_CPUS],
shuffle partitions = cpus, UI off) with the bench warmup, then for each
named query: clearCache, build the DataFrame (construction), noop-write
it (execution), twice (first = with JIT, second = steady). For per-job
wall times from the event log use scripts/profile_jobs.py (ADVICE r12 —
this script reports only the construct/execute split).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: profile_query.py <query> [...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from forgettable_spark.session import get_spark
    from forgettable_spark import entrypoints as ep
    import bench

    spark = get_spark(
        app_name="forgettable-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = ep.queries()
    unknown = set(names) - set(qs)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")
    bench.warm_session(spark, sf_dir, cpus)

    for name in names:
        for attempt in (1, 2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"{name} [run {attempt}]: total={t2 - t0:.3f}s  "
                f"construct={t1 - t0:.3f}s  execute={t2 - t1:.3f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
