#!/usr/bin/env python3
"""Streaming throughput benchmark: drive a scale factor's full event log
through the closed production write path — file-stream ingest → keyed
decaying state (`streaming_forget_table`) → per-batch transactional
delta publish (`publish_stream_to_table`) — and report end-to-end
rows/second plus the published table's version/segment shape.

    SPARK_GRAFT_SF_DIR     source dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS       local[] parallelism (default 32)
    SPARK_GRAFT_BATCHES    number of micro-batch files (default 8)

Prints ONE JSON line:
    {"metric": "stream_publish_throughput", "rows": N, "batches": B,
     "value": rows_per_sec, "unit": "rows/sec", "versions": V,
     "final_segments": S, "read_rows": R, "sf": ...}

The split into B files models B micro-batches (`maxFilesPerTrigger=1`);
timing covers ingest through the LAST transactional commit, and the
published table is then read back through the batch verbs as the
correctness cross-check (state rows == distinct live (dist, bin) keys).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_batches = int(os.environ.get("SPARK_GRAFT_BATCHES", "8"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    except ValueError:
        sf = 0.0

    from forgettable_spark.session import get_spark
    from forgettable_spark.sources import load_forget_events
    from forgettable_spark.sources.txn import ManifestTable
    from forgettable_spark.streaming import (
        publish_stream_to_table,
        read_increment_stream,
        streaming_forget_table,
    )

    spark = get_spark(
        app_name="forgettable-stream-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g" if sf >= 1 else "8g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_bench_")
    src, ckpt, tbl = f"{work}/src", f"{work}/ckpt", f"{work}/tbl"
    try:
        # Stage the event log as n_batches single-file micro-batches
        # (untimed setup). Rate tiny so decay math doesn't wipe the toy
        # timestamps; the state/publish machinery runs identically.
        events = load_forget_events(spark, sf_dir)
        n_rows = events.count()
        events.repartition(n_batches).write.mode("overwrite").parquet(src)
        # one file per micro-batch: Spark wrote one file per partition
        files = sorted(
            f for f in os.listdir(src) if f.endswith(".parquet")
        )
        for i, f in enumerate(files):  # stagger mtimes -> stable order
            os.utime(os.path.join(src, f), (1_700_000_000 + i, 1_700_000_000 + i))

        table = ManifestTable(tbl)
        t0 = time.perf_counter()
        stream = streaming_forget_table(
            read_increment_stream(spark, src), rate=1e-12
        )
        q = publish_stream_to_table(stream, table, ckpt, available_now=True)
        q.awaitTermination()
        elapsed = time.perf_counter() - t0

        version = table.current_version()
        segments = table.segment_count()
        read_rows = table.read(spark).count()
        distinct_keys = (
            events.select("distribution", "bin").distinct().count()
        )
        print(
            json.dumps(
                {
                    "metric": "stream_publish_throughput",
                    "rows": n_rows,
                    "batches": len(files),
                    "value": round(n_rows / elapsed, 1),
                    "unit": "rows/sec",
                    "elapsed_sec": round(elapsed, 2),
                    "versions": version,
                    "final_segments": segments,
                    "read_rows": read_rows,
                    "state_keys_expected": distinct_keys,
                    "state_ok": read_rows == distinct_keys,
                    "sf": sf,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
