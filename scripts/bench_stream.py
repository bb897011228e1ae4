#!/usr/bin/env python3
"""Streaming throughput benchmark: drive a scale factor's full event log
through the closed production write path — file-stream ingest → keyed
decaying state (`streaming_forget_table`) → per-batch transactional
delta publish (`publish_stream_to_table`) — and report end-to-end
rows/second plus the published table's version/segment shape.

    SPARK_GRAFT_SF_DIR     source dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS       local[] parallelism (default 32)
    SPARK_GRAFT_BATCHES    number of micro-batch files (default 8)

Prints TWO JSON lines:
    {"metric": "stream_publish_throughput", "rows": N, "batches": B,
     "value": rows_per_sec, "unit": "rows/sec", "versions": V,
     "final_segments": S, "read_rows": R, "sf": ...}
    {"metric": "stream_admission_throughput", "docs": N, "batches": B,
     "value": docs_per_sec, "unit": "docs/sec", "n_admitted": A,
     "n_dup": D, "sf": ...}
(the second drives the documents table through the LSH admission loop
— streaming/admit.py: within-batch pairs + persistent-sketch-index
check + fold compaction — with the same B-file micro-batch staging.)

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
        # ---- admission loop over the documents table (same staging) ----
        from pyspark.sql import functions as F

        from forgettable_spark.sources import load_table
        from forgettable_spark.streaming import admission_stream

        adm = f"{work}/adm"
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n_docs = docs.count()
        docs.repartition(n_batches).write.mode("overwrite").parquet(f"{adm}/src")
        dfiles = sorted(
            f for f in os.listdir(f"{adm}/src") if f.endswith(".parquet")
        )
        for i, f in enumerate(dfiles):
            os.utime(
                os.path.join(f"{adm}/src", f),
                (1_700_000_000 + i, 1_700_000_000 + i),
            )
        doc_stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{adm}/src")
        )
        # SPARK_GRAFT_SPINE=1: also maintain the token-family postings
        # spine incrementally (admit_batch spine_dir) to price the
        # production maintenance path alongside the loop's own work.
        # SPARK_GRAFT_SKETCHES=1: same for the dedup-family sketch
        # spine (admit_batch sketch_dir — extensions/sketches.py).
        spine_dir = (
            f"{adm}/spine" if os.environ.get("SPARK_GRAFT_SPINE") == "1" else None
        )
        sketch_dir = (
            f"{adm}/sketches"
            if os.environ.get("SPARK_GRAFT_SKETCHES") == "1"
            else None
        )
        # Jobs-per-batch: the loop's latency is job-scheduling-bound at
        # micro-batch scale (admit.py), so the scheduled-job count per
        # batch IS the consolidation metric (r4 measured ~15 before the
        # one-sketch-per-batch rewrite). Count via the app status store
        # (works with the UI disabled), scoped to the admission phase.
        _status = spark.sparkContext._jsc.sc().statusStore()
        jobs_before = _status.jobsList(None).size()
        t1 = time.perf_counter()
        q2 = admission_stream(
            doc_stream,
            f"{adm}/index",
            f"{adm}/corpus",
            f"{adm}/verdicts",
            f"{adm}/ckpt",
            available_now=True,
            fold_every=4,
            spine_dir=spine_dir,
            sketch_dir=sketch_dir,
        )
        q2.awaitTermination()
        adm_elapsed = time.perf_counter() - t1
        adm_jobs = _status.jobsList(None).size() - jobs_before
        verd = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(f"{adm}/verdicts")
        )
        n_dup = verd.filter(F.col("is_dup")).count()
        n_admitted = verd.filter(~F.col("is_dup")).count()
        print(
            json.dumps(
                {
                    "metric": "stream_admission_throughput",
                    "docs": n_docs,
                    "batches": len(dfiles),
                    "value": round(n_docs / adm_elapsed, 1),
                    "unit": "docs/sec",
                    "elapsed_sec": round(adm_elapsed, 2),
                    "n_admitted": n_admitted,
                    "n_dup": n_dup,
                    "verdicts_ok": n_admitted + n_dup == n_docs,
                    "jobs": adm_jobs,
                    "jobs_per_batch": round(adm_jobs / max(len(dfiles), 1), 1),
                    "spine_maintained": spine_dir is not None,
                    "sketches_maintained": sketch_dir is not None,
                    "sf": sf,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
