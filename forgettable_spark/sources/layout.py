"""Physical layout management: bucketing the increment log by distribution.

The reference co-locates a distribution's state by construction (all three
Redis keys live on whatever shard owns the name). The Spark analogue is a
**bucketed table**: ``bucketBy(n, 'distribution')`` records the hash layout
in the catalog, and every downstream ``groupBy(distribution, …)`` /
window-over-distribution satisfies its clustering requirement straight off
the scan — the snapshot pipeline runs with ZERO exchanges (asserted in
tests/test_layout.py). At 100 TB this removes the single biggest cost of
the read path: shuffling the log to aggregate it.

Plain parquet directories can't carry this metadata (hence
``formats.write_events(distribute=True)`` only clusters files); bucketing
needs the session catalog (or, in production, a metastore / table format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_events_bucketed(
    events: DataFrame,
    table: str,
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist an increment log as a catalog table bucketed by
    distribution and sorted by (distribution, bin) within buckets —
    aggregation-ready layout."""
    (
        events.write.mode(mode)
        .bucketBy(buckets, "distribution")
        .sortBy("distribution", "bin")
        .format("parquet")
        .saveAsTable(table)
    )


def read_events_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed increment log; the catalog restores the hash layout
    so downstream plans skip the aggregation shuffle."""
    return spark.table(table)
