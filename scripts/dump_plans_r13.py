#!/usr/bin/env python3
"""Dump `.explain("formatted")` for every registered query into
plans/r13/<query>_<tag>.txt (tag = before/after, argv[1]).

Optimization-round evidence artifact: the judge checks plan-shape claims
in OPTIMIZATION_r13.md against these files.

    python scripts/dump_plans_r13.py before [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _formatted_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = set(sys.argv[2:])
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    from forgettable_spark.session import get_spark
    from forgettable_spark import entrypoints as ep
    from forgettable_spark.functions.cache import plan_audit_mode

    spark = get_spark(
        app_name="dump-plans-r13",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in sorted(ep.queries().items()):
        if names and name not in names:
            continue
        try:
            with plan_audit_mode():
                plan = _formatted_plan(fn(spark, SF_DIR))
        except Exception as ex:  # noqa: BLE001 — record the failure, keep going
            plan = f"PLAN FAILED: {ex!r}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(name, "->", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
