#!/usr/bin/env python3
"""Isolated scale measurement for media_near_dup (VERDICT r5 #1: the
operator debuted at toy scale only). Runs media_near_dup_pairs — the
REGISTERED configuration (uncapped, l1_max as registered) — over the
deterministic synthetic media manifest at a ladder of corpus sizes and
prints one JSON line per rung:

    {"metric": "media_near_dup_scale", "n": N, "sec": S, "pairs": P}

The planted-dup density is size-invariant (dup classes are id mod 24),
so pair counts and candidate volume must scale LINEARLY with n; the
wall-clock ratio between rungs is the scale verdict. A fresh warmup
plan runs untimed first (same rationale as bench.py).

    SPARK_GRAFT_CPUS    local[] parallelism (default 32)
    SPARK_GRAFT_NS      comma-separated rungs (default 6400,64000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rungs = [
        int(x) for x in os.environ.get("SPARK_GRAFT_NS", "6400,64000").split(",")
    ]

    from forgettable_spark.session import get_spark

    spark = get_spark(
        app_name="media-scale-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from forgettable_spark import entrypoints_ext as ext
    from forgettable_spark.extensions.multimodal import media_near_dup_pairs
    from forgettable_spark.functions.cache import run_released

    # untimed warmup: Arrow featurize + join/window JIT on a small rung
    # (run_released materializes via collect, same as the timed rungs)
    run_released(
        spark,
        lambda: media_near_dup_pairs(
            ext._media_with_planted_dups(spark, n=256),
            l1_max=ext.MEDIA_L1_MAX,
            max_bucket_size=None,
        ),
    )
    spark.catalog.clearCache()

    for n in rungs:
        t0 = time.perf_counter()
        out = run_released(
            spark,
            lambda: media_near_dup_pairs(
                ext._media_with_planted_dups(spark, n=n),
                l1_max=ext.MEDIA_L1_MAX,
                max_bucket_size=None,
            ),
        )
        pairs = out.count()
        sec = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {"metric": "media_near_dup_scale", "n": n, "sec": sec, "pairs": pairs}
            ),
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
