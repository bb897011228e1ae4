"""Format connectors for the increment log: parquet / CSV / JSON sources
and partitioned sinks.

The reference's only I/O is Redis commands; an analytics engine needs real
sources and sinks. All readers normalize to the ``forget_events`` shape and
schema (explicit schema always passed — schema inference is a full extra
scan at 100 TB, and silently wrong for timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forgettable_spark.operators.snapshot import FORGET_EVENTS_SCHEMA

#: CSV/JSON wire schema: ts as ISO-8601 string (parsed, never inferred).
_WIRE_SCHEMA = "distribution STRING, bin STRING, n BIGINT, ts STRING"


def _normalize(df: DataFrame) -> DataFrame:
    # try_to_timestamp: one malformed row must yield NULL, not kill a
    # 100 TB ingest (Spark 4 ANSI mode makes plain to_timestamp throw).
    return df.select(
        F.col("distribution").cast("string"),
        F.col("bin").cast("string"),
        F.col("n").cast("bigint"),
        F.try_to_timestamp(F.col("ts")).alias("ts"),
    )


def read_events_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(FORGET_EVENTS_SCHEMA).parquet(path)


def read_events_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — typed like parquet (no wire-string normalization);
    predicate pushdown and column pruning work the same way, so a
    bucketed ORC log serves the zero-exchange read path identically."""
    return spark.read.schema(FORGET_EVENTS_SCHEMA).orc(path)


def read_events_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    return _normalize(spark.read.schema(_WIRE_SCHEMA).option("header", header).csv(path))


def read_events_json(spark: SparkSession, path: str) -> DataFrame:
    return _normalize(spark.read.schema(_WIRE_SCHEMA).json(path))


def write_events(
    events: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "append",
    distribute: bool = True,
) -> None:
    """Persist an increment log.

    ``distribute=True`` hash-clusters files by distribution so downstream
    snapshot aggregations read co-located keys (the poor man's bucketing —
    with a transactional catalog, swap for ``bucketBy``). CSV/JSON sinks
    stringify ``ts`` as ISO-8601 to round-trip through the wire schema.
    """
    out = events
    if format in ("csv", "json"):
        out = out.withColumn("ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"))
    if distribute:
        out = out.repartition("distribution")
    writer = out.write.mode(mode)
    if format == "csv":
        writer = writer.option("header", True)
    writer.format(format).save(path)
