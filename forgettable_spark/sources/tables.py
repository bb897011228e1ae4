"""Readers for the driver-provided parquet tables and the canonical
projection of the raw ``events`` stream into ``forget_events``.

The ``forget_events`` shape (FIXTURES.md A1) is the engine's primary input
— one row per increment, the event-sourced equivalent of the reference's
``/incr`` write (``goforget/forget.go:31-69``):

    distribution STRING, bin STRING, n BIGINT, ts TIMESTAMP
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: All driver testdata tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_nanos_readable(spark: SparkSession) -> None:
    """Older Spark 4.0 rejects parquet TIMESTAMP(NANOS) outright; reading
    the raw int64 is its supported escape hatch. Spark >= 4.1 instead reads
    the column natively as TIMESTAMP_NTZ (this conf is then a no-op)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


#: Wall-clock micros since the epoch for a TIMESTAMP_NTZ column — pure
#: NTZ-to-NTZ arithmetic, so the result is independent of
#: ``spark.sql.session.timeZone`` (the driver's harness session is not UTC).
_NTZ_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table.

    ``events.ts`` is nanosecond-precision; every other timestamp in the
    testdata is ms/us and reads natively. Nanos are truncated to
    microseconds (Spark's native timestamp precision) — the same truncation
    DuckDB applies when it coerces nanos to its micro timestamps, so engine
    and oracle see identical instants. Both Spark readings of the nanos
    column are handled:

    - bigint (Spark 4.0 ``nanosAsLong``): integer-divide to micros;
    - timestamp_ntz (Spark >= 4.1 native): the NTZ wall clock is the UTC
      instant; convert via NTZ-to-NTZ ``timestampdiff`` so the result does
      not depend on the session time zone (verified bit-identical to
      DuckDB's ``epoch_us`` over the full sf0.01 column).
    """
    _ensure_nanos_readable(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.timestamp_micros(F.expr(_NTZ_EPOCH_US)))
        # plain timestamp: already a micro-precision instant — leave as is
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw event stream: event_id, ts, user_id, event_type, value, props."""
    return load_table(spark, sf_dir, "events")


def events_to_forget_events(
    events: DataFrame,
    distribution: Column | str = "event_type",
    bin: Column | str | None = None,
    n: Column | int = 1,
) -> DataFrame:
    """Project the raw event stream onto the ``forget_events`` increment log.

    Default mapping (FIXTURES.md §C): ``distribution := event_type`` (few
    distributions, many rows), ``bin := cast(user_id % 100 as string)``
    (bounded bin cardinality). Each event is one increment of weight ``n``.
    """
    if bin is None:
        bin = (F.col("user_id") % 100).cast("string")
    dist_col = F.col(distribution) if isinstance(distribution, str) else distribution
    bin_col = F.col(bin) if isinstance(bin, str) else bin
    n_col = F.lit(n) if isinstance(n, int) else n
    return events.select(
        dist_col.cast("string").alias("distribution"),
        bin_col.cast("string").alias("bin"),
        n_col.cast("bigint").alias("n"),
        F.col("ts"),
    )


def load_forget_events(
    spark: SparkSession,
    sf_dir: str,
    distribution: Column | str = "event_type",
    bin: Column | str | None = None,
    n: Column | int = 1,
) -> DataFrame:
    """``load_events`` + ``events_to_forget_events`` in one call."""
    return events_to_forget_events(load_events(spark, sf_dir), distribution, bin, n)
