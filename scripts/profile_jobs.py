#!/usr/bin/env python
"""Job/stage timeline for registered queries via the Spark event log
(r12 optimization tooling).

    python scripts/profile_jobs.py <query> [...]

Runs each query twice (bench session shape + warmup); parses the event
log for job wall times, stage task counts and task-time sums, printed
per run so the sequential-job structure (and any dead time between
jobs) is visible.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: profile_jobs.py <query> [...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    evdir = tempfile.mkdtemp(prefix="spark-events-")

    from forgettable_spark.session import get_spark
    from forgettable_spark import entrypoints as ep
    import bench

    spark = get_spark(
        app_name="forgettable-jobs",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            **(
                {"spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ["MINPART"]}
                if os.environ.get("MINPART")
                else {}
            ),
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = ep.queries()
    bench.warm_session(spark, sf_dir, cpus)

    marks = []  # (label, t_ms_start, t_ms_end)
    for name in names:
        for attempt in (1, 2):
            spark.catalog.clearCache()
            t0 = time.time() * 1000
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t1 = time.time() * 1000
            marks.append((f"{name}#{attempt}", t0, t1))
    spark.stop()

    # Parse the single event-log file.
    evfile = [os.path.join(evdir, f) for f in os.listdir(evdir) if not f.startswith(".")][0]
    if os.path.isdir(evfile):  # Spark 4 rolling event-log dir
        evfile = [
            os.path.join(evfile, f)
            for f in sorted(os.listdir(evfile))
            if "events" in f
        ][0]
    jobs = {}  # id -> dict
    stages = {}  # id -> dict
    with open(evfile) as fh:
        for line in fh:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:60],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "tasks": si["Number of Tasks"],
                    "name": si["Stage Name"][:50],
                    "ms": (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                    if si.get("Submission Time")
                    else None,
                }

    for label, t0, t1 in marks:
        inside = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j.get("start", 0) >= t0 and j.get("end", t1 + 1) <= t1
        ]
        jsum = sum(j["end"] - j["start"] for _, j in inside)
        print(f"\n== {label}: wall={t1 - t0:.0f}ms jobs={len(inside)} jobsum={jsum:.0f}ms dead={t1 - t0 - jsum:.0f}ms")
        for jid, j in inside:
            st = [
                f"s{sid}:{stages[sid]['tasks']}t/{stages[sid]['ms']}ms[{stages[sid]['name']}]"
                for sid in j["stages"]
                if sid in stages
            ]
            print(
                f"  job {jid}: {j['end'] - j['start']:5.0f}ms  stages[{len(j['stages'])}] ran: {' '.join(st)}"
            )


if __name__ == "__main__":
    main()
