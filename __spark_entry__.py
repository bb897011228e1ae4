"""Driver contract for the spark-graft builder (PySpark target).

Thin delegator — the real implementations live in
:mod:`forgettable_spark.entrypoints` so they are importable, testable and
versioned with the engine package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from forgettable_spark import entrypoints as _ep


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _ep.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ep.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each entry in ``queries()``.

    The driver compares at sf0.01, which is also the default corpus for
    the one GENERATED oracle (ann_kmeans_topk's literal codebook); local
    multi-sf callers use ``entrypoints.oracle_sql(sf_dir=...)`` instead.
    """
    return _ep.oracle_sql()
