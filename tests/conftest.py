"""Shared fixtures: one session-scoped SparkSession, DuckDB oracle helper."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forgettable_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    s = get_spark(
        app_name="forgettable-tests",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "false", "spark.sql.shuffle.partitions": cpus},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def register_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    from forgettable_spark.sources import TABLES

    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def assert_frames_match(spark_df, duck_rel, check_types: bool = True):
    """Driver-style comparison: row count, column names, and
    order-insensitive value equality (columns sorted by name)."""
    scols = sorted(spark_df.columns)
    dcols = sorted(duck_rel.columns)
    assert scols == dcols, f"column mismatch: spark={scols} duck={dcols}"
    srows = [tuple(_canon(r[c]) for c in scols) for r in spark_df.collect()]
    ddf = duck_rel.df()
    drows = [tuple(_canon(v) for v in t) for t in ddf[scols].itertuples(index=False, name=None)]
    assert len(srows) == len(drows), f"row count: spark={len(srows)} duck={len(drows)}"
    assert sorted(srows, key=repr) == sorted(drows, key=repr)
