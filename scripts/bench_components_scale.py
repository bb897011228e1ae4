#!/usr/bin/env python3
"""Isolated scale measurement for the DISTRIBUTED connected-components
loop (VERDICT r4 #6 / r5 #1): the registered query gates a driver-local
union-find below LOCAL_CC_PAIRS, so in-suite numbers never exercise the
hash-min + pointer-jumping loop at small SFs. This script forces the
distributed path (local_threshold=0) over the same SimHash pair graph
the registered query builds, and prints one JSON line:

    {"metric": "components_distributed", "sf_dir": ..., "sec": S,
     "pairs": P, "rows": N}

    SPARK_GRAFT_SF_DIR  parquet dir (default .scratch/sf1)
    SPARK_GRAFT_CPUS    local[] parallelism (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from forgettable_spark.session import get_spark

    spark = get_spark(
        app_name="components-scale-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from forgettable_spark import entrypoints_ext as ext
    from forgettable_spark.extensions import dedup
    from forgettable_spark.extensions.components import connected_components
    from forgettable_spark.functions.cache import run_released
    from forgettable_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # scan warmup, untimed

    # pair count first (untimed; informational — the candidate build is
    # re-run inside the timed region exactly as the registered query does)
    n_pairs = dedup.simhash_pairs(docs, max_hamming=ext.SIMHASH_MAX_HAMMING).count()

    def build():
        pairs = dedup.simhash_pairs(docs, max_hamming=ext.SIMHASH_MAX_HAMMING)
        comp = connected_components(pairs, local_threshold=0)
        return comp.select(
            F.col("node").alias("doc_id"),
            "component",
            (F.col("node") == F.col("component")).alias("keep"),
        )

    t0 = time.perf_counter()
    out = run_released(spark, build)
    n_rows = out.count()
    sec = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "metric": "components_distributed",
                "sf_dir": sf_dir,
                "sec": sec,
                "pairs": n_pairs,
                "rows": n_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
